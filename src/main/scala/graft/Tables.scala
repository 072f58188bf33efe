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
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
