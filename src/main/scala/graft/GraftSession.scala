package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Tuned for the sandbox (local[32], single JVM) but every setting is the
  * one you'd want on a 1000-executor cluster too: AQE on (runtime skew/
  * coalesce re-planning), UTC session time, shuffle partitions sized to
  * the parallelism at hand rather than the 200 default.
  */
object GraftSession {
  def builder(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // ceiling for AQE's per-stage partition sizing: stages whose
      // shuffle volume outgrows cpu-count partitioning (10×+ bench
      // scale) split by BYTES instead of spilling multi-GB sorts, and
      // AQE coalesces small stages back toward the cpu-count target.
      // This builder-time value (SPARK_GRAFT_PART_CEILING × cpus,
      // default 1) is only the dirless default — entry points that
      // know their input dir call [[tuneForData]], which DERIVES the
      // ceiling from the data's on-disk bytes (VERDICT r13 item 6).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * sys.env.getOrElse("SPARK_GRAFT_PART_CEILING", "1")
          .toInt).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which the Spark parquet
      // reader rejects; read as Long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // transformWithState (StateKernel — every keyed stateful op)
      // requires the RocksDB provider, and it's the right provider at
      // scale regardless: state lives on executor disk with changelog
      // checkpointing, not as full snapshots of an in-JVM map
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.ui.enabled", "false")

  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    quietKnownNoise()
    GraftCatalog.installOptimizations(s)
    applyEnvHooks(s)
    s
  }

  /** Deployment env hooks, shared by every entry point that owns its
    * session ([[get]], Bench, Verify):
    *
    *  - `SPARK_GRAFT_INDEX_DIR` — point a cold session at a persisted
    *    gram-index artifact (graft.functions.GramIndex.saveIndex
    *    output) so the dedup/decontamination family loads it instead
    *    of re-tokenizing the corpus (fingerprint-validated; drift →
    *    silent rebuild).
    *  - `SPARK_GRAFT_RELIABLE` — route every iterative stage boundary
    *    through reliable `Dataset.checkpoint()` instead of
    *    localCheckpoint (graft.util.Checkpoints — executor-loss
    *    durability on preemptible clusters). The value is NORMALIZED
    *    (trim + lowercase, 1/0/yes/no/on/off accepted) and anything
    *    unrecognized FAILS FAST (ADVICE r14): a durability knob that
    *    silently ignores `TRUE` would leave an operator believing
    *    they are executor-loss safe when they are not. */
  def applyEnvHooks(s: SparkSession): Unit = {
    sys.env.get("SPARK_GRAFT_INDEX_DIR").foreach(
      s.conf.set(functions.GramIndex.IndexDirConf, _))
    sys.env.get("SPARK_GRAFT_RELIABLE").foreach { raw =>
      s.conf.set(util.Checkpoints.ReliableConf,
        parseBoolEnv("SPARK_GRAFT_RELIABLE", raw).toString)
    }
    // measurement-only: candidate-volume audit counters (extra count
    // actions — never set on a timing pass; see graft.util.Audit)
    sys.env.get("SPARK_GRAFT_AUDIT").foreach { raw =>
      s.conf.set(util.Audit.CandidatesConf,
        parseBoolEnv("SPARK_GRAFT_AUDIT", raw).toString)
    }
  }

  /** Strict boolean env parse: true/false/1/0/yes/no/on/off (any
    * case, surrounding whitespace ignored); anything else throws. */
  def parseBoolEnv(name: String, raw: String): Boolean =
    raw.trim.toLowerCase match {
      case "true" | "1" | "yes" | "on" => true
      case "false" | "0" | "no" | "off" | "" => false
      case other => throw new IllegalArgumentException(
        s"$name=$other is not a recognized boolean " +
          "(use true/false/1/0/yes/no/on/off)")
    }

  /** Sum of regular-file bytes under a data directory (one local
    * filesystem walk — the testdata dirs hold a few hundred part
    * files; on a real deployment this would be one object-store LIST,
    * the same listing the first scan pays anyway). */
  def dirBytes(dir: String): Long = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(root)
  }

  /** On-disk parquet bytes one INITIAL AQE partition should carry.
    * 16 MB compressed ≈ 100-150 MB in-memory rows — the size at which
    * a sort/verify stage neither spills nor drowns in per-task
    * overhead (the sf10 sweep's measured point: 2.0 GB of watch-list
    * tables wanted ~128 partitions; dd_ngram_jaccard spilled 16 GB
    * through 8, zero-spill at 128 with AQE coalescing small stages). */
  val TargetPartitionBytes: Long = 16L << 20

  /** AQE initial-partition ceiling derived from the DATA SCALE
    * (VERDICT r13 item 6): ceil(input bytes / [[TargetPartitionBytes]])
    * clamped to [cpus, 16×cpus]. Bench-scale dirs (17 MB at sf0.1)
    * derive below cpu-count and clamp UP to it — the measured optimum
    * for the suite's many small queries (a blanket 16× ceiling cost
    * +10% total there) — while the sf10 decade (2.0 GB) derives ~128
    * without anyone exporting a knob. */
  def derivePartCeiling(bytes: Long, cpus: Int): Int = {
    val derived = math.ceil(bytes.toDouble / TargetPartitionBytes).toInt
    math.min(16 * cpus, math.max(cpus, derived))
  }

  /** Apply the scale-derived ceiling to a live session for queries over
    * `dir`. `SPARK_GRAFT_PART_CEILING` (× cpus) stays as the explicit
    * operator override; without it the ceiling follows the data. The
    * conf is runtime-mutable, so Bench/Verify call this once per run
    * after the session exists. Returns the ceiling applied. */
  def tuneForData(spark: SparkSession, dir: String): Int = {
    val cpus = spark.sparkContext.defaultParallelism
    val ceiling = sys.env.get("SPARK_GRAFT_PART_CEILING") match {
      case Some(k) => cpus * k.toInt
      case None => derivePartCeiling(dirBytes(dir), cpus)
    }
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      ceiling.toString)
    ceiling
  }

  /** Silences the one benign WARN the engine triggers by design:
    * unpersisting a localCheckpoint (the iterative kernels checkpoint
    * per round and `Caches.releaseAll` frees the blocks between bench
    * queries) logs "lineage has been truncated and cannot be recomputed"
    * per RDD — correct and intended, but it buries real warnings in a
    * full-suite log. Scoped to the exact MESSAGE via a RegexFilter on
    * the exact logger (an earlier level-based mute silenced every WARN
    * that logger class could emit, not just this one); any other
    * warning from MapPartitionsRDD still surfaces. */
  def quietKnownNoise(): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.RegexFilter
    try {
      val ctx = LogManager.getContext(false) match {
        case c: LoggerContext => c
        case _ => return // non-core log4j binding: leave logging alone
      }
      val conf = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val lc = conf.getLoggerConfig(name) match {
        case l if l.getName == name => l
        case _ =>
          // additive config inheriting the parent level, so the logger
          // keeps its normal behavior except for the filtered message
          val nl = new LoggerConfig(name, null, true)
          conf.addLogger(name, nl)
          nl
      }
      val already = lc.getFilter match {
        case r: RegexFilter => r.toString.contains("lineage")
        case _ => false
      }
      if (!already) lc.addFilter(RegexFilter.createFilter(
        ".*lineage has been truncated.*", null, java.lang.Boolean.FALSE,
        Filter.Result.DENY, Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    } catch { case _: Throwable => } // logging hygiene must never fail a run
  }
}
