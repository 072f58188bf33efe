package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("leftAsOf: latest prior right row, null when none, ties match") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "lt", "lname")
    val right = Seq((1L, 40L, "c1"), (1L, 100L, "c2"), (3L, 5L, "c3"))
      .toDF("k", "rt", "rname")
    val out = AsOfJoin.leftAsOf(left, right, "k", "lt", "rt",
        Seq("rt", "rname"))
      .select("lname", "asof_rname").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1") === Some("c2"), "equal timestamp matches (>= semantics)")
    assert(out("p2") === Some("c1"), "latest prior, not latest overall")
    assert(out("p3") === None, "no right row for the key → null")
  }

  test("leftAsOf: null in the latest right row is NOT patched from older rows") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1L, 12L, "p1")).toDF("k", "lt", "lname")
    val right = Seq(
      (1L, 5L, Some("a1"), Some("b1")),
      (1L, 10L, Some("a2"), None)) // latest row: b is null
      .toDF("k", "rt", "a", "b")
    val out = AsOfJoin.leftAsOf(left, right, "k", "lt", "rt",
      Seq("rt", "a", "b")).collect().head
    assert(out.getAs[String]("asof_a") === "a2")
    assert(out.getAs[String]("asof_b") === null,
      "the carried image is the latest right ROW, not a column-wise mix")
  }

  test("asof query: every matched click precedes (or equals) its purchase") {
    val res = AsOfJoin.ajAsofJoin(spark, sf)
    assert(res.filter(col("asof_click_ts_us") > col("ts_us")).count() === 0)
    // purchases exist both with and without a prior click at this sf
    assert(res.filter(col("asof_click_ts_us").isNotNull).count() > 0)
    assert(res.count() ===
      graft.sources.ChangeFeed.fromEvents(spark, sf)
        .filter(col("event_type") === "purchase").count(),
      "left join keeps all purchases")
  }

  test("leftAsOfForward: earliest following row; tolerance nulls far matches") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 30L, "l2"), (2L, 10L, "l3"))
      .toDF("k", "lt", "lname")
    val right = Seq((1L, 10L, "r_at10"), (1L, 25L, "r_at25"),
      (1L, 100L, "r_at100")).toDF("k", "rt", "rname")
    val noTol = AsOfJoin.leftAsOfForward(left, right, "k", "lt", "rt",
      Seq("rt", "rname")).collect()
      .map(r => r.getAs[String]("lname") ->
        Option(r.getAs[String]("asof_rname"))).toMap
    assert(noTol("l1") === Some("r_at10"), "same-instant right row matches")
    assert(noTol("l2") === Some("r_at100"), "earliest FOLLOWING row")
    assert(noTol("l3") === None, "no right rows for the key")
    val tol = AsOfJoin.leftAsOfForward(left, right, "k", "lt", "rt",
      Seq("rt", "rname"), toleranceUs = Some(20L)).collect()
      .map(r => r.getAs[String]("lname") ->
        Option(r.getAs[String]("asof_rname"))).toMap
    assert(tol("l1") === Some("r_at10"))
    assert(tol("l2") === None, "match at +70 exceeds the 20-unit bound")
  }

  test("attribution: cohort totals reconcile with the raw purchase feed") {
    val rows = AsOfJoin.ev8Attribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val feed = graft.sources.ChangeFeed.fromEvents(spark, sf)
      .filter(col("event_type") === "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === feed.count())
    val totalCents = feed
      .agg(sum(graft.operators.QueryUtil
        .cents(coalesce(col("value"), lit(0.0d))).cast("long")))
      .collect().head.getLong(0)
    assert(rows.map(r => r.getAs[Long]("attributed_cents") +
      r.getAs[Long]("organic_cents")).sum === totalCents,
      "every purchase dollar lands in exactly one bucket")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_attributed") <= r.getAs[Long]("n_purchases"))
      val f = r.getAs[Double]("attributed_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("bounded funnel: stages nest and cover all views") {
    val rows = AsOfJoin.ev9BoundedFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    val nViews = graft.sources.ChangeFeed.fromEvents(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(rows.map(_.getAs[Long]("n_views")).sum === nViews)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchased") <= r.getAs[Long]("n_clicked"))
      assert(r.getAs[Long]("n_clicked") <= r.getAs[Long]("n_views"))
      assert(r.getAs[Double]("click_rate") >=
        r.getAs[Double]("purchase_rate"))
    }
    // the funnel must not be vacuous at either stage
    assert(rows.map(_.getAs[Long]("n_purchased")).sum > 0)
  }

  test("forward asof query: conversions are within the 24h bound") {
    val res = AsOfJoin.aj2AsofForward(spark, sf)
    val matched = res.filter(col("asof_p_ts_us").isNotNull)
    assert(matched.count() > 0)
    assert(matched.filter(col("convert_us") < 0).count() === 0)
    assert(matched.filter(col("convert_us") > 86400000000L).count() === 0)
    assert(res.count() ===
      graft.sources.ChangeFeed.fromEvents(spark, sf)
        .filter(col("event_type") === "click").count(),
      "left join keeps all clicks")
  }
}
