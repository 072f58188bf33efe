package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate path for cardinality and
  * quantiles at 100 TB, where exact distinct/percentile means a
  * full shuffle of the key universe. Both are built-in partial
  * aggregates (HyperLogLog++ and an approximate quantile summary),
  * map-side combinable with O(sketch) state.
  *
  * No DuckDB oracle (sketch internals are engine-specific); error
  * bounds vs the exact answers are asserted in `SketchesSpec`.
  */
object Sketches {

  /** HLL++ distinct counts per return flag at 2% target error, beside
    * the exact count for driver-side rows checking. */
  def skApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02)
          .as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"))
      .orderBy("l_returnflag")

  /** Approximate percentiles of the price distribution. */
  def skApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("p50"),
        approx_percentile(col("l_extendedprice"), lit(0.95), lit(1000))
          .as("p95"),
        approx_percentile(col("l_extendedprice"), lit(0.99), lit(1000))
          .as("p99"))

  /** Heavy hitters via Count-Min Sketch: the frequency sketch is a
    * built-in partial aggregate (map-side combinable, O(w·d) state —
    * the 100 TB path to approximate frequencies without shuffling the
    * key universe); the driver then reads ONLY the few-KB sketch plus
    * the small distinct key list and evaluates point estimates. CMS
    * guarantees estimate ≥ true count and, with probability `conf`,
    * estimate ≤ true count + eps·N — asserted in SketchesSpec. */
  def skHeavyHitters(spark: SparkSession, dir: String,
      eps: Double = 0.001, conf: Double = 0.99): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val events = Tables.events(spark, dir)
    val skBytes = events
      .agg(expr(s"count_min_sketch(event_type, CAST($eps AS DOUBLE), " +
        s"CAST($conf AS DOUBLE), 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val keys = events.select("event_type").distinct()
      .orderBy("event_type").collect().map(_.getString(0))
    import spark.implicits._
    keys.toSeq.map(k => (k, cms.estimateCount(k)))
      .toDF("event_type", "est_count")
  }

  /** Sketch MERGEABILITY — the property that makes sketches the 100 TB
    * answer: per-source HLL sketches (computed independently, as
    * partitions would at scale) re-aggregate by `hll_union_agg` into
    * the corpus estimate WITHOUT touching rows again. Emits each
    * source's estimate plus the union's; the spec asserts the union
    * estimate matches both the exact corpus cardinality (within HLL
    * error) and a directly-computed corpus sketch (exactly — HLL union
    * is lossless over sketches of the same width). */
  def skHllUnion(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.TextAnalysis.wsTokens(col("text")))
          .as("tok"))
      .groupBy("source")
      .agg(expr("hll_sketch_agg(tok, 12)").as("sk"),
        expr("hll_sketch_estimate(hll_sketch_agg(tok, 12))")
          .cast("long").as("est_vocab"))
    val union = perSource
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
        .cast("long").as("est_vocab"))
      .select(lit("__all__").as("source"), col("est_vocab"))
    perSource.select(col("source"), col("est_vocab"))
      .unionByName(union)
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_approx_distinct" -> (skApproxDistinct _),
    "sk_approx_percentiles" -> (skApproxPercentiles _),
    "sk_hll_union" -> (skHllUnion _),
    "sk_heavy_hitters" ->
      ((s: SparkSession, d: String) => skHeavyHitters(s, d)))
}
