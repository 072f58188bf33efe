package graft

import java.util.concurrent.CyclicBarrier
import org.apache.spark.sql.functions._

/** Concurrency contracts behind the bench's serving leg (VERDICT r13
  * item 7): the model-state memos must not stampede — N sessions
  * racing to the same model must run ONE build — and concurrent query
  * execution over one session must agree with serial execution.
  */
class ConcurrencySpec extends SparkSpec {

  test("model-state memo: racing threads run the builder exactly once") {
    import spark.implicits._
    val build = spark.range(5000).select(col("id").as("k")).toDF()
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val memo = new graft.util.Caches.PlanMemo[String, Long](maxEntries = 4)
    val n = 8
    val barrier = new CyclicBarrier(n)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until n).map { _ =>
      val t = new Thread(() => {
        barrier.await() // maximize the race
        results.add(memo.get(build, "model") {
          builds.incrementAndGet()
          build.count() // a real Spark action inside the builder
        })
      })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(builds.get() == 1,
      s"builder stampeded: ran ${builds.get()} times for one key")
    assert(results.size == n && results.asScala.forall(_ == 5000L))
  }

  test("bloom model cache: concurrent j3 executions share one bitset build") {
    operators.RuntimeFilter.invalidateBloomCache()
    val (gets0, builds0) = graft.util.Caches.memoStats
    val n = 4
    val barrier = new CyclicBarrier(n)
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        spark.sparkContext
          .setLocalProperty("spark.scheduler.pool", s"spec$i")
        barrier.await()
        counts.add(operators.RuntimeFilter.j3BloomSemi(spark, sf).count())
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val (gets1, builds1) = graft.util.Caches.memoStats
    assert(counts.asScala.toSet.size == 1, "all threads agree on rows")
    assert(gets1 - gets0 >= n, "every execution consulted the memo")
    assert(builds1 - builds0 <= 1,
      s"bloom bitset built ${builds1 - builds0} times across $n " +
        "concurrent executions — the model memo must absorb the race")
  }

  private implicit class QAsScala[A](
      q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = {
      val it = q.iterator()
      new Iterator[A] {
        def hasNext: Boolean = it.hasNext
        def next(): A = it.next()
      }
    }
  }
}
