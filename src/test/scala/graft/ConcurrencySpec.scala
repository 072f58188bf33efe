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

  test("loopScope conf is private to the scope (VERDICT r16 item 4)") {
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    graft.util.Par.loopScope(spark, 1) { scoped =>
      // the scope sees its pinned conf …
      assert(scoped.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(scoped.conf.get("spark.sql.shuffle.partitions") == "1")
      // … while the shared session is untouched — a concurrent query
      // planning on it mid-loop still plans adaptively at full width
      assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqe0)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == parts0)
      val parent = spark.range(1000).groupBy(col("id") % 7).count()
      assert(parent.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan"),
        "parent-session plan lost AQE while a loop scope was active")
      // a frame rebound into the scope shuffles at the pinned count
      val scopedDf = graft.util.Par.rebind(scoped,
        spark.range(1000).toDF()).groupBy(col("id") % 7).count()
      scopedDf.collect()
      assert(scopedDf.rdd.getNumPartitions == 1,
        "rebound frame must inherit the scope's pinned partitions")
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqe0)
  }

  test("concurrent leg stays green while a CC-family loop runs " +
    "on a second thread") {
    import spark.implicits._
    // a chain graph: CC runs several pointer-jump rounds, keeping the
    // loop scope alive while the other thread queries the parent
    val pairs = (0L until 400L).map(i => (i, i + 1))
      .toDF("d1", "d2")
    @volatile var ccLabels: Array[org.apache.spark.sql.Row] = null
    val ccThread = new Thread(() => {
      ccLabels = functions.Dedup.connectedComponents(pairs)
        .orderBy("id").collect()
    })
    ccThread.start()
    // parent-session queries racing the loop: correct rows AND
    // adaptive plans throughout
    var adaptiveSeen = true
    while (ccThread.isAlive) {
      val q = spark.range(10000).groupBy(col("id") % 13).count()
      adaptiveSeen &= q.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan")
      assert(q.collect().map(_.getLong(1)).sum == 10000L)
    }
    ccThread.join()
    assert(adaptiveSeen,
      "a parent-session query planned without AQE during the CC loop")
    assert(ccLabels.length == 401 && ccLabels.forall(_.getLong(1) == 0L),
      "chain collapses to one component labeled by its minimum")
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
