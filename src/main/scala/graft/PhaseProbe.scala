package graft

/** One-off driver-phase attribution probe for the optimization round:
  * where does a query's CONSTRUCTION time go — Dataset analysis,
  * optimization, physical planning — and how big are the trees?
  *
  *   sbt "runMain graft.PhaseProbe SFDIR q1,q2,..."
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.get()
    GraftSession.tuneForData(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          System.err.println("[job] " + j.stageInfos.map(si =>
            si.name + " | " + si.details.linesIterator
              .filter(_.contains("graft")).take(2).mkString(" <- "))
            .mkString(" || "))
        }
      })
    try {
      spark.read.parquet(s"$dir/lineitem.parquet").count()
      spark.read.parquet(s"$dir/documents.parquet").count()
    } catch { case _: Throwable => }
    def count(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Long = {
      var n = 0L
      p.foreach { node =>
        n += 1
        node match {
          case q: org.apache.spark.sql.catalyst.plans.QueryPlan[_] =>
            q.expressions.foreach(e => e.foreach(_ => n += 1))
          case _ =>
        }
      }
      n
    }
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        val fn = SparkEntry.queries(n)
        Thread.sleep(100); jobs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        Thread.sleep(100)
        val buildJobs = jobs.get
        val an = df.queryExecution.analyzed
        val t2 = System.nanoTime()
        val opt = df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        val sp = df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        System.err.println(
          f"[phase] $n rep=$rep construct+analyze=${(t1 - t0) / 1e9}%.3f " +
            s"buildJobs=$buildJobs " +
            f"(analyzedNodes=${count(an)}) optimize=${(t3 - t2) / 1e9}%.3f " +
            f"(optNodes=${count(opt)}) plan=${(t4 - t3) / 1e9}%.3f " +
            f"(physNodes=${count(sp)})")
        try graft.util.Caches.releaseAll(spark, blocking = true)
        catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}
