package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.util.Checkpoints.StageOps

/** Statistical and graph-analytic operators over the relational tables.
  *
  * Everything here follows the repo's oracle-determinism contract
  * (QueryUtil): aggregate in exact integers, then apply ONE explicit
  * double formula whose every op is a single correctly-rounded IEEE
  * operation written identically in the Spark code and the DuckDB
  * oracle — so even regression slopes and correlations hash-match.
  */
object Stats {

  // ── exact OLS / correlation per group ───────────────────────────────
  /** Per-returnflag linear regression of discount (basis points) on
    * quantity, with Pearson correlation — "do bigger orders get bigger
    * discounts?". NOT Spark's `regr_slope`/`corr` (their double
    * accumulation is partition-order dependent): the five moment sums
    * (Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs — partial aggregation
    * and shuffle order cannot change them — and the slope/intercept/r
    * formulas run on those integers in one fixed IEEE order. The
    * BIGINT→DOUBLE conversions are correctly rounded identically in
    * both engines even past 2^53. Sums fit int64 at any scale: x ≤ 50,
    * y ≤ 1000, so Σxy ≤ 5·10^4 per row — 10^12 rows stay < 2^63. */
  def st1Linreg(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("long")
    val y = floor(col("l_discount") * lit(10000.0d) + lit(0.5d)).cast("long")
    val d = (c: Column) => c.cast("double")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("cov_n", d(col("n")) * d(col("sxy")) -
        d(col("sx")) * d(col("sy")))
      .withColumn("varx_n", d(col("n")) * d(col("sxx")) -
        d(col("sx")) * d(col("sx")))
      .withColumn("vary_n", d(col("n")) * d(col("syy")) -
        d(col("sy")) * d(col("sy")))
      .select(col("l_returnflag"), col("n"),
        (col("cov_n") / col("varx_n")).as("slope_bp_per_unit"),
        ((d(col("sy")) - (col("cov_n") / col("varx_n")) * d(col("sx"))) /
          d(col("n"))).as("intercept_bp"),
        (col("cov_n") / (sqrt(col("varx_n")) * sqrt(col("vary_n"))))
          .as("pearson_r"))
      .orderBy("l_returnflag")
  }

  val st1Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM (
      |    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |      CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS y
      |    FROM lineitem)
      |  GROUP BY l_returnflag),
      |f AS (
      |  SELECT l_returnflag, n,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n,
      |    sx, sy
      |  FROM m)
      |SELECT l_returnflag, n,
      |  cov_n / varx_n AS slope_bp_per_unit,
      |  (CAST(sy AS DOUBLE) - (cov_n / varx_n) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept_bp,
      |  cov_n / (sqrt(varx_n) * sqrt(vary_n)) AS pearson_r
      |FROM f ORDER BY l_returnflag""".stripMargin

  // ── exact higher moments ────────────────────────────────────────────
  /** Per-group skewness and excess kurtosis — NOT the engine's
    * `skewness`/`kurtosis` (their double accumulation is
    * partition-order dependent): the four power sums Σx…Σx⁴ are exact
    * BIGINTs, and the moment formulas run in one fixed IEEE order
    * written identically in both engines, so even third and fourth
    * moments hash-match. Overflow bound: x = l_quantity ≤ 50, so
    * Σx⁴ ≤ 6.25·10⁶ per row — int64-safe to ~1.4·10¹² rows
    * (non-ANSI wraps silently past that; raise to DECIMAL if a table
    * ever approaches it). */
  def st2Moments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("long")
    val d = (c: Column) => c.cast("double")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), x.as("x"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .withColumn("mu", d(col("s1")) / d(col("n")))
      .withColumn("e2", d(col("s2")) / d(col("n")))
      .withColumn("e3", d(col("s3")) / d(col("n")))
      .withColumn("e4", d(col("s4")) / d(col("n")))
      .withColumn("m2", col("e2") - col("mu") * col("mu"))
      .withColumn("m3", col("e3") - lit(3.0d) * col("mu") * col("e2") +
        lit(2.0d) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("e4") - lit(4.0d) * col("mu") * col("e3") +
        lit(6.0d) * col("mu") * col("mu") * col("e2") -
        lit(3.0d) * col("mu") * col("mu") * col("mu") * col("mu"))
      .select(col("l_returnflag"), col("n"), col("mu").as("mean_qty"),
        (col("m3") / (sqrt(col("m2")) * col("m2"))).as("skewness"),
        (col("m4") / (col("m2") * col("m2")) - lit(3.0d))
          .as("excess_kurtosis"))
      .orderBy("l_returnflag")
  }

  val st2Sql: String =
    """WITH sums AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS s1,
      |    CAST(SUM(x * x) AS BIGINT) AS s2,
      |    CAST(SUM(x * x * x) AS BIGINT) AS s3,
      |    CAST(SUM(x * x * x * x) AS BIGINT) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |ms AS (
      |  SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
      |  FROM sums),
      |cm AS (
      |  SELECT l_returnflag, n, mu,
      |    e2 - mu * mu AS m2,
      |    e3 - 3.0 * mu * e2 + 2.0 * mu * mu * mu AS m3,
      |    e4 - 4.0 * mu * e3 + 6.0 * mu * mu * e2
      |      - 3.0 * mu * mu * mu * mu AS m4
      |  FROM ms)
      |SELECT l_returnflag, n, mu AS mean_qty,
      |  m3 / (sqrt(m2) * m2) AS skewness,
      |  m4 / (m2 * m2) - 3.0 AS excess_kurtosis
      |FROM cm ORDER BY l_returnflag""".stripMargin

  // ── robust (median/MAD) outlier statistics per group ────────────────
  /** Per-language robust location/scale of document length plus the
    * Hampel outlier count — the curation filter that survives the very
    * outliers a mean/stddev gate is wrecked by (one 10 MB document
    * drags a mean filter's threshold; it cannot move a median's). All
    * arithmetic stays exact despite medians of even-sized groups:
    * medians run over DOUBLED integers (2·x, then 2·d where
    * d = |2x − med2|), so the 0.5-quantile midpoint interpolation
    * always lands on an integer, and the Hampel test
    * |x − med| > 3·1.4826·MAD cross-multiplies to the integer
    * comparison 10000·d2 > 22239·mad4 — no float division anywhere, so
    * every row hash-matches. Exact per-group percentiles buffer the
    * group (the g5 caveat): strata are few; the wide-group scale path
    * is the GK sketch in [[Sketches]], this is the exact complement.
    */
  def st3Robust(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars").cast("long").as("x"))
    val med = docs.groupBy("lang")
      .agg(percentile(col("x") * 2, lit(0.5)).cast("long").as("med2"))
    val d2s = docs.join(broadcast(med), "lang")
      .withColumn("d2", abs(col("x") * 2 - col("med2")))
    val mad = d2s.groupBy("lang")
      .agg(percentile(col("d2") * 2, lit(0.5)).cast("long").as("mad4"))
    d2s.join(broadcast(mad), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), max(col("med2")).as("med2"),
        max(col("mad4")).as("mad4"),
        sum(when(col("d2") * 10000 > col("mad4") * 22239, 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("lang")
  }

  val st3Sql: String =
    """WITH base AS (
      |  SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
      |med AS (
      |  SELECT lang, CAST(quantile_cont(x * 2, 0.5) AS BIGINT) AS med2
      |  FROM base GROUP BY lang),
      |d AS (
      |  SELECT base.lang, abs(x * 2 - med2) AS d2, med2
      |  FROM base JOIN med USING (lang)),
      |mad AS (
      |  SELECT lang, CAST(quantile_cont(d2 * 2, 0.5) AS BIGINT) AS mad4
      |  FROM d GROUP BY lang)
      |SELECT d.lang, COUNT(*) AS n, MAX(med2) AS med2, MAX(mad4) AS mad4,
      |  CAST(SUM(CASE WHEN d2 * 10000 > mad4 * 22239 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM d JOIN mad USING (lang)
      |GROUP BY d.lang ORDER BY lang""".stripMargin

  // ── exact per-group mode ────────────────────────────────────────────
  /** Most frequent quantity per returnflag (smallest value on ties) —
    * the exact MODE aggregate. Two-level: fold to (group, value) counts
    * with map-side partials, then rank the (tiny) count table; the fact
    * table is never windowed. */
  def g6Mode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag", "qty")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("qty"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("qty").as("mode_qty"),
        col("cnt").as("n_mode"))
      .orderBy("l_returnflag")
  }

  val g6Sql: String =
    """SELECT l_returnflag, qty AS mode_qty, cnt AS n_mode FROM (
      |  SELECT l_returnflag, qty, cnt, ROW_NUMBER() OVER (
      |    PARTITION BY l_returnflag ORDER BY cnt DESC, qty) AS rn
      |  FROM (
      |    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
      |      COUNT(*) AS cnt
      |    FROM lineitem GROUP BY l_returnflag, qty))
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  // ── distribution-rank window functions ──────────────────────────────
  /** Rank statistics of order value within priority cohorts:
    * rank / dense_rank / percent_rank / cume_dist over a TOTAL order
    * (price cents desc, key asc — no ties, so the rank family is
    * deterministic). percent_rank = (rank-1)/(n-1) and
    * cume_dist = rows≤current / n are single exact-integer divisions —
    * bit-identical across engines. */
  def w5RankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).cast("long").as("price_cents"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("o_orderpriority", "rnk")
  }

  val w5Sql: String =
    """SELECT o_orderkey, o_orderpriority, price_cents,
      |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
      |  PERCENT_RANK() OVER w AS pct_rank, CUME_DIST() OVER w AS cume
      |FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      |  FROM orders)
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY price_cents DESC, o_orderkey)
      |ORDER BY o_orderpriority, rnk""".stripMargin

  // ── rolling exact median ────────────────────────────────────────────
  /** 7-row rolling EXACT median of daily event volume per type — the
    * robust trend line that a spike (which wrecks a rolling mean)
    * cannot move. No engine median aggregate is used (interpolation
    * conventions differ): the window collects the ≤7 daily counts,
    * sorts them, and takes the midpoint — for even windows, the mean of
    * the two middles as ONE exact-integer sum and ONE division, so
    * every value hash-matches. The window runs over the (type, day)
    * rollup — ~150 rows after the map-side-combined daily aggregate —
    * never the raw stream, and the collected state is bounded at 7
    * longs per row. */
  def w6RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .withColumn("day",
        floorDiv(expr("unix_micros(ts)"), 86400000000L))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .withColumn("win", sort_array(collect_list(col("n")).over(w)))
      .withColumn("m", size(col("win")))
      .select(col("event_type"), col("day"), col("n"),
        ((element_at(col("win"), expr("int((m + 1) div 2)")) +
          element_at(col("win"), expr("int(m div 2 + 1)"))).cast("double") /
          lit(2.0d)).as("med7"))
      .orderBy("event_type", "day")
  }

  val w6Sql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY event_type, day),
      |winned AS (
      |  SELECT event_type, day, n,
      |    list_sort(list(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      |  FROM daily)
      |SELECT event_type, day, n,
      |  CAST(win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS DOUBLE)
      |    / 2.0 AS med7
      |FROM winned ORDER BY event_type, day""".stripMargin

  // ── rolling distinct actives (DAU / WAU) ────────────────────────────
  /** Daily and trailing-7-day distinct active users per event type —
    * THE engagement dashboard query. Exact rolling distinct cannot be
    * decomposed into running sums (users overlap across days), so each
    * day carries its deduplicated user set and the window unions seven
    * of them: state per window slot is one day's active set — bounded
    * by daily actives, not by the stream — and the raw feed reduces to
    * (type, day) with map-side partials before any window runs. At a
    * scale where exact WAU sets blow past executor memory (a day of
    * actives at 100 TB is 10^8 users — a multi-GB single row here) the
    * drop-in replacement is [[w7bRollingActivesSketch]]: per-day HLL
    * sketches union-merged over the same window, 4 KB of state per
    * window slot at any corpus size. This operator is the exact
    * baseline the sketch twin is judged against (StatsSpec asserts
    * every w7b estimate lands within HLL error of these values). */
  def w7RollingActives(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, 0)
    Tables.events(spark, dir)
      .withColumn("day",
        floorDiv(expr("unix_micros(ts)"), 86400000000L))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_set(col("user_id"))).as("users"))
      .withColumn("dau", size(col("users")))
      .withColumn("wau",
        size(array_distinct(flatten(collect_list(col("users")).over(w)))))
      .select(col("event_type"), col("day"), col("n_events"),
        col("dau"), col("wau"))
      .orderBy("event_type", "day")
  }

  /** Sketch-windowed DAU/WAU — [[w7RollingActives]]'s 100 TB shape.
    * Each (event_type, day) aggregates one HLL++ sketch (lgK=14,
    * ~16 KB, ~0.8% rel. std. error) with map-side partial merges, so
    * the shuffle carries sketches, never user sets; the 7-day window
    * then `hll_union_agg`s seven fixed-size sketches per output row —
    * state is O(window · sketch), independent of how many users a day
    * has. DAU is estimated from the same sketch (one build feeds both),
    * so a day's column pair is internally consistent.
    *
    * The raw estimates are DataSketches-deterministic but not
    * SQL-expressible, so — the `sk_approx_distinct` pattern — the
    * declared row emits the EXACT values (oracled by DuckDB, computed
    * in the same pass as the sketches) plus per-row booleans asserting
    * each estimate landed within 5σ HLL error (lgK=14 → rse ≈ 0.81%;
    * 4% + small-count slack) of its exact twin: an estimate collapse
    * is a driver hash fail, not a spec-only signal. StatsSpec keeps
    * the tight estimate assertions. */
  def w7bRollingActivesSketch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-6, 0)
    val errOk = (est: Column, exact: Column) =>
      abs(est - exact.cast("double")) <=
        greatest(lit(2.0), lit(0.04) * exact.cast("double"))
    Tables.events(spark, dir)
      .withColumn("day",
        floorDiv(expr("unix_micros(ts)"), 86400000000L))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        expr("hll_sketch_agg(user_id, 14)").as("sk"),
        array_sort(collect_set(col("user_id"))).as("users"))
      .withColumn("dau", size(col("users")))
      .withColumn("dau_est", expr("hll_sketch_estimate(sk)"))
      .withColumn("wsk", expr("hll_union_agg(sk, false)").over(w))
      .withColumn("wau",
        size(array_distinct(flatten(collect_list(col("users")).over(w)))))
      .withColumn("wau_est", expr("hll_sketch_estimate(wsk)"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("dau"), col("wau"),
        errOk(col("dau_est"), col("dau")).as("dau_ok"),
        errOk(col("wau_est"), col("wau")).as("wau_ok"))
      .orderBy("event_type", "day")
  }

  val w7bSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    COUNT(*) AS n_events,
      |    list_sort(list(DISTINCT user_id)) AS users
      |  FROM events GROUP BY event_type, day)
      |SELECT event_type, day, n_events,
      |  CAST(len(users) AS INT) AS dau,
      |  CAST(len(list_distinct(flatten(list(users) OVER (
      |    PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)))) AS INT) AS wau,
      |  TRUE AS dau_ok, TRUE AS wau_ok
      |FROM daily ORDER BY event_type, day""".stripMargin

  val w7Sql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    COUNT(*) AS n_events,
      |    list_sort(list(DISTINCT user_id)) AS users
      |  FROM events GROUP BY event_type, day)
      |SELECT event_type, day, n_events,
      |  CAST(len(users) AS INT) AS dau,
      |  CAST(len(list_distinct(flatten(list(users) OVER (
      |    PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)))) AS INT) AS wau
      |FROM daily ORDER BY event_type, day""".stripMargin

  // ── revenue concentration (Pareto 80/20) ────────────────────────────
  /** How concentrated is revenue? Per nation: how many top customers
    * produce 80% of order revenue, and what fraction of the customer
    * base that is. The window partitions by NATION (never a global
    * sort): customers rank by exact cent revenue within their nation,
    * and the 80% cut is the integer cross-multiplication
    * `cum_prev·5 < total·4` — no 0.8·total double ever compared, so
    * the count is engine-exact. Order revenue reduces to per-customer
    * totals with map-side partials before the window sees anything. */
  def w8Pareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("rev_cents"))
    val perCust = rev
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("rev_cents"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("rev_cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCust
      .withColumn("cum", sum("rev_cents").over(w))
      .withColumn("total",
        sum("rev_cents").over(Window.partitionBy("n_name")))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum("rev_cents").as("total_cents"),
        count(when((col("cum") - col("rev_cents")) * 5 <
          col("total") * 4, 1)).as("n_top80"))
      .withColumn("top80_frac", col("n_top80").cast("double") /
        col("n_customers").cast("double"))
      .orderBy("n_name")
  }

  val w8Sql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY o_custkey),
      |percust AS (
      |  SELECT n_name, o_custkey, rev_cents
      |  FROM rev
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey),
      |cums AS (
      |  SELECT n_name, o_custkey, rev_cents,
      |    CAST(SUM(rev_cents) OVER (PARTITION BY n_name
      |      ORDER BY rev_cents DESC, o_custkey
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(rev_cents) OVER (PARTITION BY n_name) AS BIGINT)
      |      AS total
      |  FROM percust)
      |SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
      |  COUNT(CASE WHEN (cum - rev_cents) * 5 < total * 4 THEN 1 END)
      |    AS n_top80,
      |  CAST(COUNT(CASE WHEN (cum - rev_cents) * 5 < total * 4 THEN 1 END)
      |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS top80_frac
      |FROM cums GROUP BY n_name ORDER BY n_name""".stripMargin

  // ── fixed-iteration weighted PageRank ───────────────────────────────
  /** Weighted PageRank over the event-type transition graph (the same
    * edge relation as ev4_transitions) — the graph-centrality scorer a
    * pretraining pipeline runs over a link graph to rank sources (the
    * CommonCrawl-style URL-quality signal), demonstrated on the
    * feed's type-transition graph. Three power iterations, damping
    * 0.85, ALL-INTEGER arithmetic in parts-per-million rank units with
    * floor division at every step, so the fixed point of each round is
    * engine-exact — no double accumulation anywhere. Each iteration is
    * one hash join of the (tiny) rank vector to the edge list plus one
    * grouped sum: at web scale the edge list is the 100 TB fact and
    * this is exactly the join+agg shape that distributes; the rank
    * vector stays O(nodes).
    *
    * Overflow bound: contributions compute as
    * `((85·r // 100) · w) // out` with r ≤ 10^6 ppm, so the inner
    * product stays < 10^6·w — int64-safe for edge weights to ~10^12. */
  def grPagerank(spark: SparkSession, dir: String): DataFrame = {
    val (plan, loopParts) = grPagerankParts(spark, dir)
    // loop scope (r16): the iteration plan below the checkpoint is
    // node-table-sized with a fully known shape — materialize it
    // AQE-off at the node table's parallelism (22 jobs → ~12, and the
    // scope only owns the iterations: the corpus-sized edge/node
    // derivation ran under AQE inside grPagerankParts)
    graft.util.Par.loopScope(spark, loopParts) { scoped =>
      graft.util.Par.rebind(spark,
        graft.util.Par.rebind(scoped, plan).stageCheckpoint())
    }
  }

  /** The LAZY iteration plan + derived loop parallelism — split from
    * [[grPagerank]] so PlanAuditSpec can audit the per-round join
    * shapes (the public query materializes the plan to a leaf). */
  private[graft] def grPagerankParts(spark: SparkSession, dir: String)
      : (DataFrame, Int) = {
    val Scale = 1000000L // total rank mass, ppm
    val events = Tables.events(spark, dir)
    val nxt = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val edges = events
      .withColumn("next_type", lead("event_type", 1).over(nxt))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
      .stageCheckpoint() // tiny; reread per iteration without rescan
    val outW = edges.groupBy("src").agg(sum("w").as("out_w"))
    val wedges = broadcast(edges.join(outW, "src")
      .select("src", "dst", "w", "out_w"))
    val nodes = events.select(col("event_type").as("node")).distinct()
      .stageCheckpoint()
    val nNodes = nodes.count()
    val base = (15L * Scale) / (100L * nNodes) // teleport share, exact
    var rank = nodes.withColumn("r", lit(Scale / nNodes))
    // fixed 3 power iterations, pinned by the oracle's r1/r2/r3 CTE
    // ladder — recorded so the scale sweeps show the round count flat
    // across decades mechanically (like gr_cc), not by code-reading
    graft.util.Rounds.record("pagerank_iters", 3)
    for (_ <- 1 to 3) {
      val contrib = wedges
        .join(broadcast(rank.select(col("node").as("src"), col("r"))), "src")
        .select(col("dst"),
          floorDiv(floorDiv(lit(85L) * col("r"), lit(100L)) * col("w"),
            col("out_w")).as("c"))
        .groupBy("dst").agg(sum("c").as("in_r"))
      // explicit broadcast (r16): the contrib side is O(nodes) like
      // the rank vector already broadcast above — and under the
      // AQE-off materialization the static planner would otherwise
      // plan a sort-merge join on the unknown-stats checkpoint leaf
      rank = nodes
        .join(broadcast(
          contrib.select(col("dst").as("node"), col("in_r"))),
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_r"), lit(0L))).as("r"))
    }
    (rank.select(col("node"), col("r").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("node")),
      nodes.rdd.getNumPartitions)
  }

  val grSql: String =
    """WITH edges AS (
      |  SELECT event_type AS src, next_type AS dst, COUNT(*) AS w
      |  FROM (
      |    SELECT user_id, event_type,
      |      LEAD(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      |    FROM events)
      |  WHERE next_type IS NOT NULL
      |  GROUP BY src, dst),
      |wedges AS (
      |  SELECT e.src, e.dst, e.w, o.out_w
      |  FROM edges e JOIN (
      |    SELECT src, CAST(SUM(w) AS BIGINT) AS out_w
      |    FROM edges GROUP BY src) o ON e.src = o.src),
      |nodes AS (SELECT DISTINCT event_type AS node FROM events),
      |n AS (SELECT COUNT(*) AS c FROM nodes),
      |r0 AS (SELECT node, 1000000 // (SELECT c FROM n) AS r FROM nodes),
      |r1 AS (
      |  SELECT nd.node,
      |    (15 * 1000000) // (100 * (SELECT c FROM n))
      |      + COALESCE(CAST(SUM(((85 * p.r // 100) * e.w) // e.out_w)
      |          AS BIGINT), 0) AS r
      |  FROM nodes nd
      |  LEFT JOIN wedges e ON e.dst = nd.node
      |  LEFT JOIN r0 p ON p.node = e.src
      |  GROUP BY nd.node),
      |r2 AS (
      |  SELECT nd.node,
      |    (15 * 1000000) // (100 * (SELECT c FROM n))
      |      + COALESCE(CAST(SUM(((85 * p.r // 100) * e.w) // e.out_w)
      |          AS BIGINT), 0) AS r
      |  FROM nodes nd
      |  LEFT JOIN wedges e ON e.dst = nd.node
      |  LEFT JOIN r1 p ON p.node = e.src
      |  GROUP BY nd.node),
      |r3 AS (
      |  SELECT nd.node,
      |    (15 * 1000000) // (100 * (SELECT c FROM n))
      |      + COALESCE(CAST(SUM(((85 * p.r // 100) * e.w) // e.out_w)
      |          AS BIGINT), 0) AS r
      |  FROM nodes nd
      |  LEFT JOIN wedges e ON e.dst = nd.node
      |  LEFT JOIN r2 p ON p.node = e.src
      |  GROUP BY nd.node)
      |SELECT node, r AS rank_ppm FROM r3
      |ORDER BY rank_ppm DESC, node""".stripMargin

  // ── connected components, fully oracled ─────────────────────────────
  /** Connected components over a sparse deterministic co-purchase
    * graph: parts that appear in the same order among high-quantity
    * lineitems (`l_quantity >= 48`) are connected; components are
    * labeled by their minimum part id. The first fully-ORACLED
    * iterative graph operator in the suite: the engine side runs the
    * distributed min-label-propagation + pointer-jumping loop
    * ([[graft.functions.Dedup.connectedComponents]] — the same kernel
    * the MinHash dedup clusters use, there only rows-only-checkable
    * because its edges come from engine-internal hashes), while the
    * DuckDB side recomputes the fixpoint with a recursive CTE — so a
    * green hash row proves the O(log diameter) distributed loop equals
    * the textbook transitive closure node for node.
    *
    * Scale shape: filter-first (the quantity predicate lands on the
    * parquet scan and cuts ~96% of lineitem before anything widens),
    * then a self-join on `l_orderkey` whose fan-out is bounded by
    * per-order width (≤ 7 items/order in TPC-H ⇒ ≤ 21 pairs), never
    * corpus-quadratic; the CC loop shuffles only the distinct pair
    * list (~0.7% of lineitem here). Singleton nodes never enter the
    * loop — they take their own id as label in the final left join.
    */
  def grCc(spark: SparkSession, dir: String): DataFrame = {
    val fl = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = fl.alias("a")
      .join(fl.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("d1"), col("b.l_partkey").as("d2"))
      .distinct()
    val labels = graft.functions.Dedup.connectedComponents(pairs)
    val nodes = fl.select(col("l_partkey").as("part_id")).distinct()
    val comp = nodes
      .join(labels.select(col("id").as("part_id"), col("label")),
        Seq("part_id"), "left")
      .select(col("part_id"),
        coalesce(col("label"), col("part_id")).as("comp_id"))
    val sizes = comp.groupBy("comp_id")
      .agg(count(lit(1)).as("comp_size"))
    comp.join(sizes, "comp_id")
      .select(col("part_id"), col("comp_id"), col("comp_size"))
      .orderBy("part_id")
  }

  val grCcSql: String =
    """WITH RECURSIVE fl AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 48),
      |e0 AS (
      |  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
      |  FROM fl a JOIN fl b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |e AS (SELECT s, t FROM e0 UNION ALL SELECT t, s FROM e0),
      |n AS (SELECT DISTINCT l_partkey AS node FROM fl),
      |reach(node, lbl) AS (
      |  SELECT node, node FROM n
      |  UNION
      |  SELECT e.t, r.lbl FROM reach r JOIN e ON e.s = r.node),
      |comp AS (
      |  SELECT node AS part_id, CAST(MIN(lbl) AS BIGINT) AS comp_id
      |  FROM reach GROUP BY node)
      |SELECT part_id, comp_id,
      |  CAST(COUNT(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size
      |FROM comp ORDER BY part_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_cc" -> (grCc _),
    "st1_linreg" -> (st1Linreg _),
    "st2_moments" -> (st2Moments _),
    "st3_robust" -> (st3Robust _),
    "g6_mode" -> (g6Mode _),
    "w5_rank_stats" -> (w5RankStats _),
    "w6_rolling_median" -> (w6RollingMedian _),
    "w7_rolling_actives" -> (w7RollingActives _),
    "w7b_rolling_actives_sketch" -> (w7bRollingActivesSketch _),
    "w8_pareto" -> (w8Pareto _),
    "gr_pagerank" -> (grPagerank _))

  val oracles: Map[String, String] = Map(
    "gr_cc" -> grCcSql,
    "st1_linreg" -> st1Sql,
    "st2_moments" -> st2Sql,
    "st3_robust" -> st3Sql,
    "g6_mode" -> g6Sql,
    "w5_rank_stats" -> w5Sql,
    "w6_rolling_median" -> w6Sql,
    "w7_rolling_actives" -> w7Sql,
    "w7b_rolling_actives_sketch" -> w7bSql,
    "w8_pareto" -> w8Sql,
    "gr_pagerank" -> grSql)
}
