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
    val bits = RuntimeFilter.buildBloom(urgent, "o_orderkey").get
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

  test("bloom sizing: FPR stays under 1% at three build sizes") {
    val sparkS = spark
    import sparkS.implicits._
    // m = 32·n rounded up to a power of two with k=2 probes gives
    // (1 − e^(−1/16))² ≈ 0.37% theoretical FPR; assert < 1% with
    // disjoint probe keys (probes can never be true members)
    Seq(100L, 5000L, 100000L).foreach { n =>
      val build = spark.range(0L, n).select(col("id").as("k"))
      val bloom = RuntimeFilter.buildBloom(build, "k").get
      assert(bloom.nBits >= 32L * n && bloom.nBits < 128L * n,
        s"n=$n sized ${bloom.nBits} bits")
      val probes = 200000L
      val fp = spark.range(1000000L, 1000000L + probes)
        .filter(RuntimeFilter.mightContain(bloom, col("id"))).count()
      assert(fp.toDouble / probes < 0.01,
        s"n=$n: $fp false positives over $probes probes")
    }
  }

  test("bloom sizing: falls back to no-filter above the bit cap") {
    val build = spark.range(0L, 10000L).select(col("id").as("k"))
    // cap below n·bitsPerKey → refuse to build; caller runs plain join
    assert(RuntimeFilter.buildBloom(build, "k",
      maxBits = 10000L * RuntimeFilter.BitsPerKey - 1).isEmpty)
    // the identity application leaves the probe untouched
    val li = Tables.lineitem(spark, sf)
    assert(RuntimeFilter.bloomFiltered(li, col("l_orderkey"), None)
      .count() === li.count())
  }
}
