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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_approx_distinct" -> (skApproxDistinct _),
    "sk_approx_percentiles" -> (skApproxPercentiles _))
}
