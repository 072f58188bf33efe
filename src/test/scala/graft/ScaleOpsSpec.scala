package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    val sparkS = spark
    import sparkS.implicits._
    // 90% of the big side hits one key — the pathological case
    val big = (1 to 10000).map(i =>
      (if (i % 10 == 0) i.toLong % 100 else 7L, s"row$i"))
      .toDF("k", "payload")
    val small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = ScaleOps.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "dim")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join spreads the hot key across salt partitions") {
    val sparkS = spark
    import sparkS.implicits._
    val big = (1 to 1000).map(i => (7L, s"row$i")).toDF("k", "payload")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4, s"hot key spread over $salts salt buckets")
  }

  test("same-bucketed tables join without a shuffle") {
    // (warehouse dir is a static conf; tables land in ./spark-warehouse
    // and are dropped in the finally block)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so bucket pruning of the Exchange shows
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ScaleOps.writeBucketed(Tables.orders(spark, sf),
        "orders_b", "o_orderkey", 8)
      ScaleOps.writeBucketed(
        Tables.lineitem(spark, sf)
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 8)
      val joined = ScaleOps.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val expected = Tables.orders(spark, sf).join(
        Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
