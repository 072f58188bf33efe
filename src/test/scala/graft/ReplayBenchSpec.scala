package graft

import graft.streaming.ReplayBench
import org.apache.spark.sql.functions._

/** The backlog-replay bench harness must be a REAL pipe run: every
  * generated mutation reaches the sink tx-stamped, and the throughput
  * math is consistent. */
class ReplayBenchSpec extends SparkSpec {

  test("generated backlog drains completely through the tx pipe") {
    val work = java.nio.file.Files
      .createTempDirectory("replay_bench").toString
    val (lines, out, sec, eps) = ReplayBench.run(spark, sf, work)
    val nEvents = Tables.events(spark, sf).count()
    // every event row became exactly one committed mutation; markers
    // (begin/commit) add tx structure but emit no rows
    assert(out === nEvents, s"sink rows $out != events $nEvents")
    assert(lines > nEvents, "log carries begin/commit markers")
    assert(sec > 0 && eps > 0)
    // spot-check tx semantics on the sink: txids group <=5 mutations,
    // and each tx's mutations share one commit timestamp
    val sink = spark.read.parquet(s"$work/sink/data")
    val perTx = sink.groupBy("txid")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("commitTsUs")).as("nts"))
    assert(perTx.filter(col("n") > 5).count() === 0, "tx size cap")
    assert(perTx.filter(col("nts") =!= 1).count() === 0,
      "commit-ts rewrite within tx")
  }

  test("latency probe yields ordered percentiles over many capped batches") {
    val work = java.nio.file.Files
      .createTempDirectory("replay_latency").toString
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "512")
    val lines = ReplayBench.generateLog(spark, sf, s"$work/log")
    val cap = 1024L
    val l = ReplayBench.latencyProbe(spark, s"$work/log", s"$work/lat", cap)
    // capped admission must split the drain into many batches: at
    // least ceil(lines/cap) (rotated-segment boundaries can add more)
    assert(l.batches >= (lines + cap - 1) / cap,
      s"${l.batches} batches for $lines lines at cap $cap")
    assert(l.p50 > 0 && l.p50 <= l.p95 && l.p95 <= l.max,
      s"percentiles out of order: p50=${l.p50} p95=${l.p95} max=${l.max}")
    // the RocksDB path must surface a real per-batch commit cost.
    // StateOperatorProgress.commitTimeMs is SUMMED across the state
    // partitions, which commit in parallel — so a batch's commit sum is
    // bounded by (partitions × its wall trigger), not by the wall
    // itself (the tighter bound tripped under full-suite host
    // contention: 4 × ~2.3 s parallel commits summed to 9.2 s against
    // a 5.2 s trigger wall).
    assert(l.commitP50 >= 0 && l.commitP50 <= l.commitP95)
    assert(l.commitP95 <= 4 * l.max,
      s"commit p95 ${l.commitP95} exceeds partitions x max trigger " +
        s"${4 * l.max}")
    // every mutation still lands exactly once under capped triggers
    val out = spark.read.parquet(s"$work/lat/data").count()
    assert(out === Tables.events(spark, sf).count())
  }

  test("per-event state-machine cost clears the reference's 10 ms latency bound") {
    // The reference's ONLY hard perf number (BASELINE.md): mean
    // insert→consumer latency < 10 ms over ≥100 sequential events
    // (reference test.conf:14-15, LatencySpec.scala:169-172). The
    // micro-batch model moves DELIVERY latency to the trigger, but the
    // per-event PROCESSING cost of the same state machine — the tx
    // fold every event passes through — is directly comparable, and
    // must clear the bound with orders of magnitude to spare for the
    // trigger budget to dominate.
    import graft.streaming.TxPipeline
    import graft.streaming.TxPipeline.ChangeEvent
    val n = 100000
    val events = (0 until n).map { i =>
      val kind = i % 7 match {
        case 0 => "begin"
        case 6 => "commit"
        case _ => "mutation"
      }
      ChangeEvent(1L, i.toLong, kind, "update", s"pk$i", i.toLong,
        Map("value" -> i.toString))
    }
    // warm-up then timed fold, batched as micro-batches of 1000
    def run(): Long = {
      val t0 = System.nanoTime()
      events.grouped(1000).foldLeft(TxPipeline.emptyState) { (st, batch) =>
        TxPipeline.advance(1L, batch, st)._1
      }
      System.nanoTime() - t0
    }
    run()
    val perEventMicros = run() / 1000.0 / n
    // reference bound is 10 ms = 10000 µs END TO END; the state machine
    // itself must be far under it (it shares the event loop budget)
    assert(perEventMicros < 1000.0,
      f"state-machine fold costs $perEventMicros%.1f µs/event")
  }
}
