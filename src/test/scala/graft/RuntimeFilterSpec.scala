package graft

import graft.operators.{QueryUtil, RuntimeFilter}
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {

  private def urgent = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("j3: bloom-pruned result is identical to the plain semi join") {
    val got = RuntimeFilter.j3BloomSemi(spark, sf).collect()
    val exact = Tables.lineitem(spark, sf)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(QueryUtil.cents(col("l_extendedprice"))).cast("long")
          .as("revenue_cents"))
      .orderBy("l_returnflag")
      .collect()
    assert(got.toSeq === exact.toSeq)
  }

  test("bloom membership: zero false negatives, real pruning") {
    val bits = RuntimeFilter.buildBloom(urgent, "o_orderkey")
    val li = Tables.lineitem(spark, sf)
    val matching = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    // every true match passes the filter (Bloom admits no false negatives)
    assert(matching
      .filter(!RuntimeFilter.mightContain(bits, col("l_orderkey")))
      .count() === 0L)
    // and the filter genuinely discards non-candidates before the join
    val passed = li
      .filter(RuntimeFilter.mightContain(bits, col("l_orderkey"))).count()
    assert(passed >= matching.count())
    assert(passed < li.count())
  }
}
