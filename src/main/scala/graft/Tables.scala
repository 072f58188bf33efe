package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated star schema
  * (see /root/repo/TESTDATA.md). Every operator in the engine takes its
  * inputs through here so filters/column pruning reach the parquet scan.
  *
  * At 100 TB these reads become partitioned-parquet scans on a cluster
  * filesystem; nothing here materializes on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize `events.ts` to a session-TZ TIMESTAMP regardless of how the
    * generator wrote it. Known layouts: TIMESTAMP(NANOS) (reads as Long
    * nanos-since-epoch under `spark.sql.legacy.parquet.nanosAsLong=true`;
    * convert with integer division — a double division would lose precision
    * above 2^53 ns) and TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ; cast is value-preserving because the session TZ is UTC).
    * DuckDB equivalent either way: `CAST(ts AS TIMESTAMP)`.
    *
    * For integer layouts the epoch SCALE is detected from the data, not
    * assumed (the round-7 lesson: the generator switched layouts and a
    * hard-coded nanos divisor would have silently produced year-52970
    * timestamps): one first-row probe per table path, cached for the
    * JVM, classifies seconds/millis/micros/nanos by magnitude — the
    * bands are 6 orders of magnitude apart, so any epoch between 2001
    * and 2286 classifies unambiguously.
    */
  private val tsProbeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** micros = ts * mult / div for the detected integer scale. */
  private[graft] def microsScale(sample: Long): (Long, Long) =
    math.abs(sample) match {
      case v if v >= 5e16.toLong => (1L, 1000L)      // nanos → div 1000
      case v if v >= 5e13.toLong => (1L, 1L)         // micros
      case v if v >= 5e10.toLong => (1000L, 1L)      // millis
      case _ => (1000000L, 1L)                       // seconds
    }

  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val sample = tsProbeCache.computeIfAbsent(d, _ =>
          df.select(col("ts")).filter(col("ts").isNotNull)
            .head(1).headOption.map(_.getLong(0)).getOrElse(0L))
        val (mult, div) = microsScale(sample)
        df.withColumn("ts",
          timestamp_micros(expr(s"ts * ${mult}L div ${div}L")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
