package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bulk snapshot scan: load an existing table as a stream of insert
  * mutations, range-partitioned for parallelism.
  *
  * The reference's snapshotter issues N range-bounded SELECTs computed by
  * a Sqoop-derived integer splitter and runs them *serially* (reference
  * `mypipe-snapshotter/src/main/scala/mypipe/snapshotter/
  * MySQLSnapshotter.scala:85-134` + `splitter/IntegerSplitter.scala:
  * 17-158`). In Spark the same operator is `spark.read.jdbc(url, table,
  * partitionColumn, lower, upper, numPartitions)` — a partitioned scan
  * that runs splits in parallel. Here (parquet stand-in) we keep the
  * splitter's *semantics* as a pure function plus a split-id column, so
  * a real JDBC source can slot in with identical partitioning.
  */
object Snapshot {

  /** Half-open ranges [lo, hi) with the last closed [lo, hi] — computed
    * like the reference splitter: divide [min, max] into `numSplits`
    * near-equal intervals; if a split would exceed `splitLimit` rows of
    * key space, raise the split count so no interval is wider than the
    * limit (reference IntegerSplitter.scala:17-158; fresh
    * implementation, not a translation).
    *
    * Returns inclusive bounds (lo, hi) per split.
    */
  def splitRanges(min: Long, max: Long, numSplits: Int,
      splitLimit: Long = -1): Seq[(Long, Long)] = {
    require(numSplits > 0, "numSplits must be positive")
    if (max < min) return Seq.empty
    val total = max - min + 1
    val wanted =
      if (splitLimit > 0 && total > splitLimit * numSplits)
        ((total + splitLimit - 1) / splitLimit).toInt
      else numSplits
    val n = math.min(wanted.toLong, total).toInt
    val base = total / n
    val rem = total % n
    // first `rem` splits get one extra key so sizes differ by ≤1
    val bounds = Seq.iterate((min, 0L), n + 1) { case (lo, i) =>
      (lo + base + (if (i < rem) 1 else 0), i + 1)
    }.map(_._1)
    bounds.sliding(2).map { case Seq(lo, hi) => (lo, hi - 1) }.toSeq
  }

  /** Probe split bounds: `SELECT MIN(col), MAX(col), COUNT(*)` —
    * the reference's bounding-values query
    * (MySQLSnapshotter.scala:174-195) as a distributed aggregate. */
  def boundingValues(df: DataFrame, keyCol: String): DataFrame =
    df.agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
      count(lit(1)).as("n"))

  /** Closed-form split-id assignment: proportional bucketing of the key
    * range into `numSplits` buckets using pure integer arithmetic (no
    * per-row driver logic, identical in any engine):
    * `least((key - lo) * numSplits div (hi - lo + 1), numSplits - 1)`.
    * Bounds arrive via a 1-row broadcast join, not a driver collect.
    *
    * NULL keys get their own sentinel split (`split_id = numSplits`),
    * matching the reference's explicit `col IS NULL` split (reference
    * IntegerSplitter.scala:27-28,65) — NULL-keyed rows are part of the
    * table and must be snapshotted, not dropped. MIN/MAX ignore NULLs,
    * so the numeric splits are unaffected. */
  def withSplitId(df: DataFrame, keyCol: String, numSplits: Int): DataFrame = {
    val bounds = boundingValues(df, keyCol).select(
      col("lo").cast("long").as("__lo"), col("hi").cast("long").as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("split_id",
        when(col(keyCol).isNull, lit(numSplits)).otherwise(
          least(
            expr(s"(CAST($keyCol AS BIGINT) - __lo) * $numSplits" +
              " div (__hi - __lo + 1)").cast("int"),
            lit(numSplits - 1))))
      .drop("__lo", "__hi")
  }

  /** Snapshot a table as insert mutations: stamp the CDC headers the
    * select→mutation adapter adds (reference SelectConsumer.scala:55-78)
    * so snapshot rows and live changes share one pipeline. */
  def asInsertMutations(df: DataFrame, database: String, table: String,
      pkCols: Seq[String]): DataFrame =
    df.withColumn("op", lit("insert"))
      .withColumn("mtype", lit(1).cast("tinyint"))
      .withColumn("database", lit(database))
      .withColumn("tbl", lit(table))
      .withColumn("pk",
        concat_ws(".", pkCols.map(c => col(c).cast("string")): _*))
      .withColumn("ts_us", lit(null).cast("long"))
}
