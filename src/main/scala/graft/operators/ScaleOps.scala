package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators (builder brief: "salting for
  * skew", "bucketing for co-located joins"). These don't change query
  * results — they change shuffle shape, which is what breaks first at
  * 100 TB. Correctness is locked by result-equivalence tests; plan
  * shape by `ScaleOpsSpec`.
  */
object ScaleOps {

  /** Skew-busting salted join: a hot key on the big side lands on one
    * reducer in a plain hash join. Salting splits each big-side key
    * into `saltFactor` sub-keys and replicates the small side per salt,
    * so the hot key spreads over `saltFactor` reducers.
    *
    * The salt is derived from a hash of the whole big-side row (via
    * xxhash64 over all columns) — deterministic, no RNG state.
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological keys AQE's split threshold misses.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallReplicated,
        Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Persist a table bucketed+sorted on its join key. Two tables
    * bucketed the same way join WITHOUT a shuffle — at 100 TB this is
    * the difference between re-shuffling the fact table per query and
    * a local merge per bucket. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two same-bucketed tables; with matching bucket specs Catalyst
    * plans a shuffle-free sort-merge join. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
