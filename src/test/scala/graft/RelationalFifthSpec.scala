package graft

import graft.operators.{CdcAnalytics, RelationalFifth, TxOps}
import org.apache.spark.sql.functions._

class RelationalFifthSpec extends SparkSpec {

  test("a1: array algebra agrees with a flat re-aggregation") {
    val rows = RelationalFifth.a1ArrayHof(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive the same facts without arrays: plain groupBy aggregates
    val flat = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).cast("int").as("n_items"),
        sum(col("l_quantity").cast("long")).as("total_qty"),
        max(col("l_quantity").cast("long")).as("max_qty"),
        countDistinct(col("l_quantity").cast("long")).cast("int")
          .as("n_uniq"))
      .collect()
      .map(r => r.getAs[Long]("l_orderkey") ->
        (r.getAs[Int]("n_items"), r.getAs[Long]("total_qty"),
          r.getAs[Long]("max_qty"), r.getAs[Int]("n_uniq")))
      .toMap
    rows.foreach { r =>
      val (n, tot, mx, uniq) = flat(r.getAs[Long]("l_orderkey"))
      assert(r.getAs[Int]("n_items") === n)
      assert(r.getAs[Long]("total_qty") === tot)
      assert(r.getAs[Long]("max_qty") === mx)
      assert(r.getAs[Int]("n_uniq") === uniq)
      assert(r.getAs[Int]("n_big") <= n)
      assert(r.getAs[Long]("sum_sq") >= tot) // x*x >= x for x >= 1
    }
  }

  test("m2: calendar fields are internally consistent") {
    val rows = RelationalFifth.m2DateFunctions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("order_date").toLocalDate
      assert(r.getAs[java.sql.Date]("plus3m").toLocalDate ===
        d.plusMonths(3))
      assert(r.getAs[java.sql.Date]("plus30d").toLocalDate ===
        d.plusDays(30))
      assert(r.getAs[java.sql.Date]("month_end").toLocalDate ===
        d.withDayOfMonth(d.lengthOfMonth))
      assert(r.getAs[java.sql.Date]("month_start").toLocalDate ===
        d.withDayOfMonth(1))
      // Spark dayofweek: Sunday=1 … Saturday=7
      assert(r.getAs[Int]("dow") ===
        (d.getDayOfWeek.getValue % 7) + 1)
      assert(r.getAs[Int]("doy") === d.getDayOfYear)
      assert(r.getAs[Int]("qtr") === (d.getMonthValue + 2) / 3)
      assert(r.getAs[Int]("days_to_cut") ===
        java.time.temporal.ChronoUnit.DAYS
          .between(d, java.time.LocalDate.of(1998, 12, 1)).toInt)
    }
  }

  test("j2: full outer keeps keys from either side, zero-filled") {
    val rows = RelationalFifth.j2FullOuter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hasCust = r.getAs[Long]("n_rich_cust") > 0
      val hasSupp = r.getAs[Long]("n_debt_supp") > 0
      assert(hasCust || hasSupp) // a row exists only if a side produced it
      if (!hasCust) assert(r.getAs[Long]("cust_bal_cents") === 0L)
      if (!hasSupp) assert(r.getAs[Long]("supp_bal_cents") === 0L)
      if (hasSupp) assert(r.getAs[Long]("supp_bal_cents") < 0L)
    }
  }

  test("fj1: every probe rediscovers its own part at distance 1") {
    val rows = RelationalFifth.fj1FuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    val probeIds = Tables.part(spark, sf)
      .filter(col("p_partkey") % 400 === 0)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    // each probe (truncated name) matches its own part with distance 1
    probeIds.foreach { id =>
      val self = byProbe.getOrElse(id, Array.empty)
        .find(_.getAs[Long]("match_key") == id)
      assert(self.isDefined, s"probe $id lost its own part")
      assert(self.get.getAs[Int]("dist") === 1)
    }
    rows.foreach(r => assert(r.getAs[Int]("dist") <= 2))
  }

  test("g5: percentiles bracket each other and sit inside the range") {
    val rows = RelationalFifth.g5ExactMedian(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25_cents"),
        r.getAs[Double]("median_cents"), r.getAs[Double]("p75_cents"))
      assert(p25 <= p50 && p50 <= p75)
    }
    // median of a known multiset: recompute one segment by hand
    val seg = rows.head.getAs[String]("c_mktsegment")
    val bals = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === seg)
      .select(operators.QueryUtil.cents(col("c_acctbal")).as("b"))
      .collect().map(_.getLong(0)).sorted
    val pos = 0.5 * (bals.length - 1)
    val (lo, hi) = (bals(pos.toInt), bals(math.ceil(pos).toInt))
    val expected = lo + (pos - pos.toInt) * (hi - lo)
    assert(rows.head.getAs[Double]("median_cents") === expected)
  }

  test("cd_merge_apply: merged state equals the latest-image view") {
    val merged = CdcAnalytics.mergeApply(spark, sf)
    // survivors of the merge (not deleted) must be exactly the keys of
    // t9_latest_image, with matching final values
    val live = merged.filter(col("action") =!= "deleted")
      .select(col("user_id"), col("after_cents"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("after_cents"))
      .toMap
    val t9 = TxOps.t9LatestImage(spark, sf)
      .select(col("user_id"),
        operators.QueryUtil.cents(coalesce(col("value"), lit(0.0d)))
          .as("cents"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("cents"))
      .toMap
    assert(live.keySet === t9.keySet)
    live.foreach { case (k, v) => assert(t9(k) === v) }
    // action accounting: every action present is one of the four
    val actions = CdcAnalytics.mergeApply(spark, sf)
      .select("action").distinct().collect().map(_.getString(0)).toSet
    assert(actions.subsetOf(Set("kept", "updated", "inserted", "deleted")))
  }
}
