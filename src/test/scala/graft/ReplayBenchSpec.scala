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
}
