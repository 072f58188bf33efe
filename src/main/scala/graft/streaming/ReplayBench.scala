package graft.streaming

import graft.Tables
import graft.sources.ChangeLogSource
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backlog-replay throughput for the CDC half of the engine (round-5
  * VERDICT item 7): the streaming path had correctness specs but no
  * perf signal. This drives the REAL pipe — [[ChangeLogSource]] DSv2
  * scan (rotated segments, sparse index) → [[TxPipeline]] tx grouping
  * (BEGIN/COMMIT buffering, commit-ts rewrite, state store) →
  * checkpointed parquet sink — over a multi-segment log generated from
  * the events table, with `Trigger.AvailableNow` (the catch-up-then-
  * stop shape of a consumer draining a binlog backlog). The reported
  * number is end-to-end events/second through the whole pipe.
  *
  * The log generator wraps each run of `txSize` consecutive events per
  * connection in BEGIN/COMMIT markers, so the replay exercises the
  * state machine on every line, and writes `segments` range-partitioned
  * files in global seq order — rotated-segment catch-up reads them with
  * one input partition per segment (parallel backlog, serial tail).
  */
object ReplayBench {

  /** Render the events table as a multi-segment change log. Returns the
    * total line count (mutations + begin/commit markers).
    *
    * `copies > 1` replays the event stream that many times with
    * per-copy mseq offsets aligned to tx boundaries — the [[Soak]]
    * device for a backlog several times the corpus (seqs stay strictly
    * monotone per conn, tx windows never straddle copies). */
  def generateLog(spark: SparkSession, sfDir: String, logDir: String,
      connections: Int = 32, txSize: Int = 5, segments: Int = 8,
      copies: Int = 1): Long = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"), col("value"))
      .withColumn("conn", pmod(col("user_id"), lit(connections)))
    val w = Window.partitionBy("conn").orderBy("ts_us", "event_id")
    val seqd0 = ev.withColumn("mseq", row_number().over(w).cast("long"))
    val seqd =
      if (copies <= 1) seqd0
      else {
        val maxM = seqd0.agg(max("mseq")).collect()(0).getLong(0)
        // offset multiple of txSize: (mseq-1)/txSize windows never mix
        val span = ((maxM / txSize) + 1) * txSize
        (0 until copies).map(c => seqd0.withColumn("mseq",
            col("mseq") + lit(c * span)))
          .reduce(_ unionByName _)
      }
    // line seq per conn: mutations at mseq·10, BEGIN at lo·10−2 and
    // COMMIT at hi·10+2 — strictly between the neighbouring txs'
    // markers (a tx's COMMIT at hi·10+2 precedes the next BEGIN at
    // hi·10+8). An earlier ±5 scheme made COMMIT(tx N) collide with
    // BEGIN(tx N+1); tie-order is undefined after a shuffle, and a
    // BEGIN sorting first reset-discarded the open buffer — exactly
    // the ambiguity a real binlog cannot contain (positions are
    // strictly monotone), so the generator must keep seqs unique too.
    val muts = seqd.select(col("conn"), (col("mseq") * 10).as("seq"),
      lit("mutation").as("kind"), lit("update").as("op"),
      concat(lit("pk"), col("event_id")).as("pk"), col("ts_us"),
      col("event_type").as("value"))
    val txs = seqd
      .groupBy(col("conn"),
        ((col("mseq") - 1) / txSize).cast("long").as("tx"))
      .agg(min("mseq").as("lo"), max("mseq").as("hi"),
        max("ts_us").as("commit_ts"))
    val nulls = lit(null).cast("string")
    val begins = txs.select(col("conn"), (col("lo") * 10 - 2).as("seq"),
      lit("begin").as("kind"), nulls.as("op"), nulls.as("pk"),
      col("commit_ts").as("ts_us"), nulls.as("value"))
    val commits = txs.select(col("conn"), (col("hi") * 10 + 2).as("seq"),
      lit("commit").as("kind"), nulls.as("op"), nulls.as("pk"),
      col("commit_ts").as("ts_us"), nulls.as("value"))
    val lines = muts.unionByName(begins).unionByName(commits)
      .as[(Long, Long, String, String, String, Long, String)]
      .map { case (conn, seq, kind, op, pk, ts, value) =>
        (seq, conn, ChangeLogSource.renderLine(conn, seq, kind, op, pk,
          ts, value))
      }
      .toDF("seq", "conn", "line")
    // global line order == seq order across name-sorted part files:
    // range-partition by seq so part-0000i holds the i-th seq range
    // (a binlog is time-ordered; rotated segments preserve that)
    lines.repartitionByRange(segments, col("seq"), col("conn"))
      .sortWithinPartitions("seq", "conn")
      .select("line")
      .write.mode("overwrite").text(logDir)
    // _SUCCESS would list as a zero-line segment; drop it
    val fs = new Path(logDir).getFileSystem(new Configuration())
    fs.delete(new Path(logDir, "_SUCCESS"), false)
    // count what was WRITTEN (validates the persisted log) instead of
    // running the generation plan a second time just to count it
    spark.read.text(logDir).count()
  }

  /** One drain's telemetry, distilled from the query's progress ring
    * (VERDICT r12 item 1: the driver-measured replay rate moved 2.3×
    * across rounds and nothing in the artifact could separate
    * state-store commit cost from host steal — now every drain carries
    * both): wall seconds, sink rows, non-empty batches, its window's
    * hypervisor-steal seconds, the summed per-batch state-store commit
    * time (the standard `stateOperators.commitTimeMs`), and the
    * RocksDB commit/load-path custom-metric totals. */
  case class DrainStats(sec: Double, out: Long, batches: Int,
      stealSec: Double, stateCommitMs: Long, rocksdb: Map[String, Long])

  /** The RocksDB provider's commit-path + load timing metrics (ms).
    * `rocksdbSstFileSize` rides along as the state-on-disk size the
    * soak bounds. */
  val RocksdbKeys: Seq[String] = Seq(
    "rocksdbCommitFlushLatency", "rocksdbCommitCompactLatency",
    "rocksdbCommitCheckpointLatency", "rocksdbCommitFileSyncLatencyMs",
    "rocksdbChangeLogWriterCommitLatencyMs", "rocksdbLoadLatencyMs",
    "rocksdbWriterStallLatencyMs", "rocksdbSstFileSize")

  private def rocksdbTotals(
      progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
      : Map[String, Long] = {
    val ops = progress.flatMap(_.stateOperators.toSeq)
    RocksdbKeys.map { k =>
      k -> ops.map { so =>
        val v = so.customMetrics.get(k)
        if (v == null) 0L else v.longValue()
      }.sum
    }.filter(_._2 != 0L).toMap
  }

  /** Drain the backlog through the full pipe; returns
    * (output mutations, elapsed seconds). */
  def replay(spark: SparkSession, logDir: String, outDir: String)
      : (Long, Double) = {
    val s = replayStats(spark, logDir, outDir)
    (s.out, s.sec)
  }

  /** [[replay]] keeping the per-drain telemetry. */
  def replayStats(spark: SparkSession, logDir: String, outDir: String)
      : DrainStats = {
    val dataDir = s"$outDir/data"
    val steal0 = graft.util.HostSteal.jiffies()
    val t0 = System.nanoTime()
    val q = PipeAssembly.start(spark, Map(
      "source.path" -> logDir,
      "sink.path" -> dataDir,
      "sink.checkpoint" -> s"$outDir/ckpt"), availableNow = true)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    DrainStats(sec, spark.read.parquet(dataDir).count(),
      progress.count(_.numInputRows > 0),
      graft.util.HostSteal.secondsSince(steal0),
      progress.flatMap(_.stateOperators.toSeq).map(_.commitTimeMs).sum,
      rocksdbTotals(progress))
  }

  /** Micro-batch latency distribution (round-6 VERDICT item 5). The
    * reference's only published perf number is its <10 ms
    * insert→consumer latency bound (`mypipe` LatencySpec.scala:169-172,
    * test.conf:14-15); in the micro-batch model the analog is
    * trigger-start→sink-commit per batch. Re-drains the already
    * generated log with a `maxLinesPerTrigger` admission cap so the
    * catch-up becomes many small batches — the steady-state tailing
    * shape, not one giant backlog batch — and reads each batch's
    * `triggerExecution` duration (trigger begin through sink commit,
    * incl. offset WAL + state store commit) from the query's progress
    * ring after termination, which is synchronous with the stream
    * execution thread (a listener would race awaitTermination).
    *
    * Returns per-batch `triggerExecution` percentiles over non-empty
    * batches, plus the per-batch state-store commit percentiles
    * (`stateOperators.commitTimeMs` summed per batch) — the number
    * that says how much of a latency shift is the RocksDB commit
    * itself. */
  def latencyProbe(spark: SparkSession, logDir: String, outDir: String,
      linesPerTrigger: Long = 4096, shufflePartitions: Int = 4)
      : LatencyStats = {
    // A tail-follow consumer sizes its state/shuffle partitioning to
    // per-trigger volume, not to the batch-analytics default: every
    // micro-batch pays (load + commit) per state partition, so 32-way
    // state for a ~4k-row trigger is pure fixed cost. Measured at
    // sf0.1: p50 756 ms at 32 partitions → ~450 at 8 → ~410 at 4,
    // flat below that. The remaining floor is the batch JOB itself
    // (addBatch ≈ 270-300 ms: task launch + state commit + parquet
    // commit); the durable-sink commit is ~100 ms of it (console
    // delivery measures p50 ≈ 357), and async progress tracking
    // trims the p95 tail (~650-830 → ~460-550) by taking offset/
    // commit WAL writes off the critical path at the cost of
    // exactly-once offsets — the frontier is recorded in SURVEY §16.
    // Restored after the probe; the throughput drain above keeps the
    // session default — its single catch-up batch wants the
    // parallelism.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      shufflePartitions.toString)
    try latencyProbeWith(spark, logDir, outDir, linesPerTrigger)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Per-batch latency distribution of one capped-admission drain. */
  case class LatencyStats(batches: Int, p50: Double, p95: Double,
      max: Double, commitP50: Double, commitP95: Double)

  private def latencyProbeWith(spark: SparkSession, logDir: String,
      outDir: String, linesPerTrigger: Long): LatencyStats = {
    // recentProgress is a ring capped by numRecentProgressUpdates —
    // size it HERE from the drain we are about to run (batches ≈
    // lines/cap, +headroom for segment-boundary splits), not in some
    // caller: a silently overflowed ring would report tail-only,
    // biased-low percentiles
    val lines = spark.read.text(logDir).count()
    val expected = (lines / math.max(1L, linesPerTrigger)) + 64
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      math.max(512L, 2L * expected).toString)
    val q = PipeAssembly.start(spark, Map(
      "source.path" -> logDir,
      "source.maxLinesPerTrigger" -> linesPerTrigger.toString,
      "sink.path" -> s"$outDir/data",
      "sink.checkpoint" -> s"$outDir/ckpt"), availableNow = true)
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    val nonEmpty = progress.filter(_.numInputRows > 0)
    val ds = nonEmpty
      .map(_.durationMs.getOrDefault("triggerExecution", -1L).toLong)
      .filter(_ >= 0)
      .sorted
    require(ds.nonEmpty, "latency probe saw no non-empty micro-batches")
    // loud, not biased: if the ring still overflowed (batchIds start
    // past 0), the percentiles would describe only the tail
    require(progress.map(_.batchId).min == 0L,
      s"progress ring overflowed: ${progress.size} retained, " +
        s"first batchId ${progress.map(_.batchId).min}")
    val commits = nonEmpty
      .map(_.stateOperators.toSeq.map(_.commitTimeMs).sum)
      .sorted
    def pct(xs: Seq[Long], p: Double): Double =
      xs(math.max(0, math.min(xs.length - 1,
        math.ceil(p * xs.length).toInt - 1))).toDouble
    LatencyStats(ds.length, pct(ds, 0.50), pct(ds, 0.95),
      ds.last.toDouble, pct(commits, 0.50), pct(commits, 0.95))
  }

  /** Generate (untimed) + replay (timed); returns
    * (log lines, output mutations, seconds, events/sec). */
  def run(spark: SparkSession, sfDir: String, workDir: String)
      : (Long, Long, Double, Double) = {
    val fs = new Path(workDir).getFileSystem(new Configuration())
    fs.delete(new Path(workDir), true)
    val lines = generateLog(spark, sfDir, s"$workDir/log")
    val (out, sec) = replay(spark, s"$workDir/log", s"$workDir/sink")
    (lines, out, sec, lines / sec)
  }

  /** [[run]] with the drain repeated `attempts` times over the SAME
    * generated log, keeping the fastest — replay throughput on a shared
    * host swings >2× run-to-run under CPU steal (rounds 8-9 re-diagnosed
    * identical code at 16k-50k events/s), so a single drain is not a
    * regressable number. Each attempt gets a fresh sink + checkpoint dir
    * (a reused checkpoint would see the log already committed and
    * no-op). */
  def runBestOf(spark: SparkSession, sfDir: String, workDir: String,
      attempts: Int = 2): (Long, Long, Double, Double) = {
    val (lines, all) = runAttempts(spark, sfDir, workDir, attempts)
    val best = all.minBy(_.sec)
    (lines, best.out, best.sec, lines / best.sec)
  }

  /** [[run]] with `attempts` drains over one generated log, reporting
    * the MEDIAN-by-wall attempt (VERDICT r12 item 1: best-of hid how
    * noisy the distribution was; the median plus the full per-attempt
    * (sec, steal, state-commit) list makes a steal-inflated driver
    * round self-describing). Returns (log lines, per-attempt stats,
    * the median attempt).
    *
    * `copies` stacks the corpus Soak-style into a deeper backlog
    * (VERDICT r13 item 3): a ~2 s drain measured the RocksDB commit
    * FILE-SYNC variance, not the pipe — the driver's r13 run saw
    * 16.7 s of rocksdbCommitFileSyncLatencyMs against 0.3 s in the
    * quiet window, a 1.5× throughput "gap" on identical code. At 10×
    * the backlog those fixed per-commit costs are a few percent of the
    * drain and the events/s number regresses on the pipe itself. */
  def runMedianOf(spark: SparkSession, sfDir: String, workDir: String,
      attempts: Int = 3, copies: Int = 1)
      : (Long, Seq[DrainStats], DrainStats) = {
    val (lines, all) = runAttempts(spark, sfDir, workDir, attempts, copies)
    val med = all.sortBy(_.sec)(Ordering.Double.TotalOrdering)
      .apply((all.size - 1) / 2)
    (lines, all, med)
  }

  private def runAttempts(spark: SparkSession, sfDir: String,
      workDir: String, attempts: Int, copies: Int = 1)
      : (Long, Seq[DrainStats]) = {
    val fs = new Path(workDir).getFileSystem(new Configuration())
    fs.delete(new Path(workDir), true)
    val lines = generateLog(spark, sfDir, s"$workDir/log", copies = copies)
    (lines, (0 until attempts).map(i =>
      replayStats(spark, s"$workDir/log", s"$workDir/sink$i")))
  }
}
