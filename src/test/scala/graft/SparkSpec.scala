package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local SparkSession per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf: String = "/root/testdata/sf0.001"
}

/** One session for the whole test JVM (suites run in it serially). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("8")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftCatalog.installOptimizations(s)
    s
  }
}
