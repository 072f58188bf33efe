package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement tool (guide §1): per-query cost
  * attribution the bench's single wall number can't give — how many
  * JOBS (actions), STAGES (shuffle boundaries × retries) and TASKS a
  * query costs, and how the wall splits between DataFrame CONSTRUCTION
  * (where the iterative kernels run their loops) and the final count
  * action. Methodology matches Bench: cold + warm per query, same
  * session config, same groupBy().count().collect() action.
  *
  *   sbt "runMain graft.Profile SFDIR q1,q2,... [reps]"
  *
  * Output (stderr): one line per query per run:
  *   [prof] <name> run=<n> total=… build=… act=… jobs=… stages=… tasks=…
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietKnownNoise()
    GraftCatalog.installOptimizations(spark)
    GraftSession.applyEnvHooks(spark)
    GraftSession.tuneForData(spark, dir)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    try {
      spark.read.parquet(s"$dir/lineitem.parquet").count()
      spark.read.parquet(s"$dir/documents.parquet").count()
    } catch { case _: Throwable => }
    def steal(): Long = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().find(_.startsWith("cpu "))
          .getOrElse("").trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } finally src.close()
    } catch { case _: Throwable => 0L }
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[prof] unknown query: $n")
        case Some(fn) =>
          (1 to reps).foreach { rep =>
            // settle listener events from the previous run
            Thread.sleep(150)
            jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
            val st0 = steal()
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            val t1 = System.nanoTime()
            val cnt = df.groupBy().count().collect()(0).getLong(0)
            val t2 = System.nanoTime()
            Thread.sleep(150)
            val sSec = (steal() - st0) / 100.0
            System.err.println(
              f"[prof] $n run=$rep total=${(t2 - t0) / 1e9}%.3f " +
                f"build=${(t1 - t0) / 1e9}%.3f act=${(t2 - t1) / 1e9}%.3f " +
                s"jobs=${jobs.get} stages=${stages.get} " +
                s"tasks=${tasks.get} taskSec=${taskMs.get / 1000.0} " +
                f"steal=$sSec%.2f rows=$cnt")
            try graft.util.Caches.releaseAll(spark, blocking = true)
            catch { case _: Throwable => }
          }
      }
    }
    spark.stop()
  }
}
