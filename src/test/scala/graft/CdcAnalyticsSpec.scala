package graft

import graft.operators.{CdcAnalytics, TxOps}
import graft.sources.ChangeFeed
import org.apache.spark.sql.functions._

class CdcAnalyticsSpec extends SparkSpec {

  test("scd2: intervals tile each entity's history with no overlap") {
    val hist = CdcAnalytics.scd2History(spark, sf).cache()
    // exactly one current row per surviving entity
    val multiCurrent = hist.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(multiCurrent === 0)
    // closed intervals are non-empty and chain: valid_to of row n equals
    // valid_from of the next mutation (delete gaps allowed — strictly,
    // valid_to never precedes the next image's valid_from)
    assert(hist.filter(col("valid_to_us") <= col("valid_from_us"))
      .count() === 0, "empty or inverted validity interval")
    val overlaps = hist.alias("a").join(hist.alias("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        col("a.valid_from_us") < coalesce(col("b.valid_to_us"), lit(Long.MaxValue)) &&
        col("b.valid_from_us") < coalesce(col("a.valid_to_us"), lit(Long.MaxValue)))
      .count()
    assert(overlaps === 0, "validity intervals overlap within an entity")
  }

  test("scd2: current images equal the latest-image reconstruction") {
    val current = CdcAnalytics.scd2History(spark, sf)
      .filter(col("is_current"))
      .select("user_id", "event_id")
    // t9 keeps entities whose LAST mutation isn't a delete; scd2's
    // current row is that same last image
    val t9 = TxOps.t9LatestImage(spark, sf).select("user_id", "event_id")
    assert(current.exceptAll(t9).count() === 0)
    assert(t9.exceptAll(current).count() === 0)
  }

  test("ivm: maintained view equals a full aggregate over latest images") {
    val ivm = CdcAnalytics.ivmDeltaAgg(spark, sf)
    val full = TxOps.t9LatestImage(spark, sf)
      .groupBy(pmod(col("user_id"), lit(100L)).as("cohort"))
      .agg(count(lit(1)).as("n_live"),
        sum(coalesce(graft.operators.QueryUtil.cents(col("value")), lit(0L)))
          .as("sum_value_cents"))
    val joined = ivm.join(full, Seq("cohort"), "full")
    assert(joined.filter(
      ivm("n_live") =!= full("n_live") ||
        ivm("sum_value_cents") =!= full("sum_value_cents") ||
        ivm("n_live").isNull || full("n_live").isNull).count() === 0,
      "incremental delta view diverged from the base-table aggregate")
    assert(ivm.count() > 0)
  }

  test("ivm: deltas partial-aggregate (no window in the grouped plan tail)") {
    // the grouped sum is over pre-computed signed deltas: the physical
    // plan must show a partial HashAggregate before the exchange
    val plan = CdcAnalytics.ivmDeltaAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
  }

  test("scd2 closed intervals chain to the successor mutation") {
    // for every closed interval, some mutation of the same user starts
    // exactly at valid_to (the next image or the closing delete)
    val hist = CdcAnalytics.scd2History(spark, sf)
      .filter(col("valid_to_us").isNotNull)
      .select("user_id", "valid_to_us")
    val feed = ChangeFeed.fromEvents(spark, sf)
      .select(col("user_id"), col("ts_us").as("valid_to_us"))
    assert(hist.exceptAll(hist.join(feed.distinct(),
      Seq("user_id", "valid_to_us"), "left_semi")).count() === 0)
  }

  test("as-of state equals the SCD2 intervals covering the cutoff") {
    val cut = 1705363200000000L
    val asof = CdcAnalytics.asofState(spark, sf, cut)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SCD2 rows whose validity interval covers the cutoff
    val scd2 = CdcAnalytics.scd2History(spark, sf)
      .filter(col("valid_from_us") <= cut &&
        (col("valid_to_us").isNull || col("valid_to_us") > cut))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asof === scd2,
      "time-travel read disagrees with the SCD2 interval cover")
  }

  test("table stats reconcile with raw feed counts; cumulatives ascend") {
    val stats = CdcAnalytics.tableStats(spark, sf).collect()
    val total = stats.map(r => r.getAs[Long]("n_ins") +
      r.getAs[Long]("n_upd") + r.getAs[Long]("n_del")).sum
    assert(total === ChangeFeed.fromEvents(spark, sf).count())
    stats.groupBy(_.getAs[String]("tbl")).foreach { case (_, rows) =>
      val byDay = rows.sortBy(_.getAs[Long]("day"))
      val cums = byDay.map(_.getAs[Long]("cum_mutations")).toSeq
      assert(cums === cums.sorted, "cumulative mutation count must ascend")
      // the last cumulative equals the table's total
      assert(cums.last === rows.map(r => r.getAs[Long]("n_ins") +
        r.getAs[Long]("n_upd") + r.getAs[Long]("n_del")).sum)
    }
  }

  test("lag features: point-in-time correct vs a driver-side replay") {
    val rows = CdcAnalytics.fe1LagFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    val hist = graft.sources.ChangeFeed.fromEvents(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        graft.operators.QueryUtil
          .cents(coalesce(col("value"), lit(0.0d)))
          .cast("long").as("v")).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.sortBy(r =>
        (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("v")))
      .toMap
    rows.take(200).foreach { r =>
      val u = r.getAs[Long]("user_id")
      val seq = hist(u)
      val i = seq.indexWhere(_._1 == r.getAs[Long]("event_id"))
      assert(i >= 0 && i < seq.length - 1, "label requires a next event")
      assert(r.getAs[Long]("label_next_cents") === seq(i + 1)._2)
      assert(Option(r.getAs[Any]("lag1_cents")).map(_.asInstanceOf[Long])
        === (if (i >= 1) Some(seq(i - 1)._2) else None))
      val win = seq.slice(math.max(0, i - 2), i + 1).map(_._2)
      assert(r.getAs[Double]("trail3_mean_cents") ===
        win.sum.toDouble / win.length.toDouble,
        s"user $u event ${r.getAs[Long]("event_id")}")
    }
  }

  test("target encoding: leave-one-out excludes the row's own label") {
    val rows = CdcAnalytics.fe2TargetEncoding(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val total = rs.map(_.getAs[Long]("v_cents")).sum
      val n = rs.length
      rs.take(20).foreach { r =>
        val expected =
          if (n > 1)
            (total - r.getAs[Long]("v_cents")).toDouble / (n - 1).toDouble
          else Double.NaN
        if (n > 1)
          assert(r.getAs[Double]("te_loo_cents") === expected,
            s"type $t leave-one-out mismatch")
        else assert(r.isNullAt(r.fieldIndex("te_loo_cents")))
      }
      // the encoding must differ across rows with different labels —
      // proof the own label was excluded, not averaged in
      if (n > 1 && rs.map(_.getAs[Long]("v_cents")).distinct.length > 1)
        assert(rs.map(_.getAs[Double]("te_loo_cents")).distinct.length > 1)
    }
  }

  test("order audit: detects planted regressions exactly; real feed clean") {
    val sparkS = spark
    import sparkS.implicits._
    // planted: table a ordered; table b has two regressions (worst 50)
    val feed = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 300L),
      ("b", 1L, 100L), ("b", 2L, 60L), ("b", 3L, 120L), ("b", 4L, 70L))
      .toDF("tbl", "event_id", "ts_us")
    val audit = CdcAnalytics.orderAudit(feed).collect()
      .map(r => r.getAs[String]("tbl") ->
        (r.getAs[Long]("n_disordered"), r.getAs[Long]("max_disorder_us")))
      .toMap
    assert(audit("a") === ((0L, 0L)))
    assert(audit("b") === ((2L, 50L)),
      "regressions at 60 (lag 40) and 70 (lag 50) must both surface")
    // the real feed certifies clean: log order IS commit-ts order
    val real = CdcAnalytics.disorderStats(spark, sf).collect()
    assert(real.nonEmpty)
    assert(real.forall(_.getAs[Long]("n_disordered") === 0L),
      "the reference feed's consistency model is log order")
  }

  test("ivm join: delta terms reproduce the full-join view; deltas broadcast") {
    val got = CdcAnalytics.ivmJoin(spark, sf)
    val full = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.operators.QueryUtil.cents(col("o_totalprice")))
          .cast("long").as("revenue_cents"))
      .orderBy("c_mktsegment")
    assert(got.collect().toSeq === full.collect().toSeq,
      "delta-join maintenance must equal the from-scratch view")
    // every delta term joins with a broadcast small side
    val p = got.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "the three delta terms plan as broadcast joins:\n" + p)
  }
}
