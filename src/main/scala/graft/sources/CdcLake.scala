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
}
