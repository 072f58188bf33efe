package graft.util

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-level cache hygiene for long-lived Spark sessions running
  * many graft operators (Bench, Verify, a notebook, a service).
  *
  * Two leak classes this fixes, both measured in the round-5 bench:
  *
  *  1. `spark.catalog.clearCache()` drops only SQL-cache entries
  *     (`Dataset.persist`). The suite's `localCheckpoint()` calls store
  *     RDD blocks that clearCache does NOT release — they free only
  *     when the driver GCs the RDD object and ContextCleaner reaps it.
  *     Across ~190 queries the blocks accumulated, LRU-evicted, and
  *     spilled, inflating later queries 7-21× vs their standalone time.
  *     [[releaseAll]] unpersists every registered RDD (localCheckpoint
  *     registers its blocks through `RDD.persist`, so they appear in
  *     `sc.getPersistentRDDs`) and nudges ContextCleaner via GC so
  *     broadcast/shuffle state from dead plans is reaped too.
  *
  *  2. Re-running an operator that `.persist()`s a deterministic plan
  *     (a warm benchmark run, a retried job) re-registers the identical
  *     normalized plan and logs `WARN CacheManager: Asked to cache
  *     already cached data` — harmless but it masks real double-cache
  *     bugs. [[persistOnce]] checks `Dataset.storageLevel` (a
  *     CacheManager lookup by plan) and only persists when the plan is
  *     not already cached, keeping warm-run reuse silent.
  */
object Caches {

  /** `persist()` that is a no-op when this plan is already in the SQL
    * cache — same semantics, no CacheManager warning on re-entry. */
  def persistOnce[T](ds: Dataset[T]): Dataset[T] =
    if (ds.storageLevel == StorageLevel.NONE) ds.persist() else ds

  /** Release ALL session cache state: SQL-cached plans, persisted RDDs
    * (including localCheckpoint blocks), and — via a GC nudge —
    * ContextCleaner-tracked broadcast/shuffle state of unreachable
    * plans. Call between logically independent jobs in a long-lived
    * session; never mid-query (in-flight plans would recompute, and a
    * localCheckpointed plan, whose lineage is truncated, would fail). */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // localCheckpoint/broadcast cleanup is reference-triggered: blocks
    // free when ContextCleaner sees the driver-side object collected
    System.gc()
  }
}
