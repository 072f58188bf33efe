package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for CPU-bound per-row stages (guide §2:
  * partitioning derived from the input, not a constant tuned for one
  * deployment).
  *
  * Spark sizes scan and shuffle partitions by BYTES
  * (`spark.sql.files.maxPartitionBytes`, AQE advisory sizes). For
  * operators whose cost is dominated by per-row CPU — regex/flag
  * batteries, Avro encode/decode, shingle hashing — over byte-small
  * inputs, the byte rule serializes the work: a 600 KB corpus plans as
  * ONE scan task, so a multi-second battery runs single-threaded on a
  * 32-core machine (measured r16: tp_dataset_build 14 jobs / 14 tasks,
  * 3.1 s of task time on one core).
  *
  * [[widen]] repartitions such a frame to the session's core count,
  * keyed on the optimizer's SIZE ESTIMATE (pure plan metadata — no job
  * runs): it fires only when the whole input is small enough that the
  * scan would plan fewer splits than cores
  * (estimate < cores × maxPartitionBytes). At real scale the estimate
  * is past the threshold, the frame already carries >= cores
  * partitions, and widen is an exact no-op — no shuffle added. When it
  * does fire, the one round-robin exchange moves at most
  * cores × maxPartitionBytes of input — the cheapness is implied by
  * the very precondition that triggered it.
  */
object Par {
  /** `gauge` is the frame whose size estimate drives the decision —
    * defaults to `df` itself. Pass the SCAN side explicitly when `df`
    * contains a checkpoint boundary or other leaf whose stats degrade
    * to the defaultSizeInBytes sentinel (a lazy localCheckpoint plans
    * as a LogicalRDD with "unknown = huge" stats, which would turn the
    * widen into a permanent no-op even on a 600 KB corpus). */
  def widen(df: DataFrame, gauge: DataFrame = null): DataFrame = {
    if (df.isStreaming) return df // micro-batches size themselves
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxPartitionBytes =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val g = if (gauge == null) df else gauge
    val estBytes = g.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(cores.toLong) * maxPartitionBytes)
      df.repartition(cores)
    else df
  }
}
