package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The CDC lake at rest: mutations land in parquet partitioned by
  * `(database, tbl)` — the storage analog of the reference's
  * topic-per-table layout (`README.md:121-124`): per-table order and
  * per-table consumption are preserved by the directory structure, and
  * any query that names a table prunes every other table's files at
  * planning time (PartitionFilters, zero I/O for the rest).
  *
  * At 100 TB add a time dimension (`ts_day`) as a second partition
  * column so retention and incremental reads are directory operations.
  */
object CdcLake {

  def write(mutations: DataFrame, path: String): Unit =
    mutations.write
      .partitionBy("database", "tbl")
      .mode("append")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Single-table read — resolves to a partition-pruned scan. */
  def readTable(spark: SparkSession, path: String, database: String,
      table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    read(spark, path)
      .filter(col("database") === database && col("tbl") === table)
  }

  /** Log compaction: collapse the change log to the latest surviving
    * image per (database, tbl, pk), dropping keys whose last change is
    * a delete — the Kafka-compacted-topic bootstrap the reference
    * leans on (reference README.md:12) as a batch maintenance job.
    * `ordCol` is the total per-key order (position/ts). One shuffle on
    * the key; output is the compacted lake at `outPath`.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      ordCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("database", "tbl", "pk")
      .orderBy(col(ordCol).desc)
    val latest = read(spark, path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") =!= "delete")
      .drop("__rn")
    // overwrite, not append: compaction must be idempotent — a re-run
    // (retry, re-fired maintenance job) replaces the compacted lake
    latest.write.partitionBy("database", "tbl").mode("overwrite")
      .parquet(outPath)
  }
}
