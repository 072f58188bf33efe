package graft

/** Throwaway local smoke runs while iterating (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.printSchema()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, false)
    spark.stop()
  }
}
