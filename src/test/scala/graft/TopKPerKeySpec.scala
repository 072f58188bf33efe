package graft

import graft.operators.{RelationalExt, ScaleOps}
import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

/** The native per-key top-k operator (logical node + strategy +
  * physical exec) versus its window-function twin.
  */
class TopKPerKeySpec extends SparkSpec {

  test("w9 equals the w2 window twin row for row") {
    val native = ScaleOps.w9NativeTopk(spark, sf).collect()
    val window = RelationalExt.w2TopOrders(spark, sf).collect()
    assert(native.length === window.length && native.nonEmpty)
    native.zip(window).foreach { case (n, w) =>
      assert(n.getLong(0) === w.getLong(0), "o_custkey")
      assert(n.getLong(1) === w.getLong(1), "o_orderkey")
      assert(n.getLong(2) === w.getLong(2), "price_cents")
      assert(n.getLong(3) === w.getLong(3), "rk")
    }
  }

  test("plan: native exec after one hash exchange, and NO sort") {
    // strip the final presentation orderBy — the operator itself must
    // plan sort-free (WindowExec's per-partition sort is the thing
    // this operator exists to remove)
    val df = TopKPerKey.topKPerKey(
      Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice")),
      keys = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)),
      k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"native exec missing:\n$plan")
    assert(plan.contains("hashpartitioning(o_custkey"),
      s"expected a key hash exchange:\n$plan")
    assert(!plan.toLowerCase.contains("sort"), s"sort crept in:\n$plan")
    // the window twin DOES sort — the contrast this operator removes
    val twin = RelationalExt.w2TopOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(twin.contains("Sort"), "twin lost its sort? update this spec")
  }

  test("small groups, k=1, and null keys behave") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (Some(1L), 10L, 5L), (Some(1L), 11L, 9L), (Some(1L), 12L, 9L),
      (Some(2L), 20L, 1L), // group smaller than k
      (None: Option[Long], 30L, 3L), (None: Option[Long], 31L, 7L))
      .toDF("g", "id", "v")
    val top2 = TopKPerKey.topKPerKey(df, Seq("g"),
        Seq(("v", true), ("id", false)), k = 2)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(top2 === Set(
      (Some(1L), 11L, 9L, 1L), (Some(1L), 12L, 9L, 2L), // tie → id order
      (Some(2L), 20L, 1L, 1L), // short group fully ranked
      (None, 31L, 7L, 1L), (None, 30L, 3L, 2L))) // null key is a group
    val top1 = TopKPerKey.topKPerKey(df, Seq("g"),
        Seq(("v", true), ("id", false)), k = 1)
      .collect()
    assert(top1.length === 3 && top1.forall(_.getLong(3) == 1L))
  }

  test("null ORDER values rank like the window form (desc: nulls last)") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 10L, Some(5L)), (1L, 11L, None),
      (1L, 12L, Some(9L)), (1L, 13L, None))
      .toDF("g", "id", "v")
    val native = TopKPerKey.topKPerKey(df, Seq("g"),
        Seq(("v", true), ("id", false)), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val window = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(native === window)
    // Spark's desc default is NULLS LAST: the two nulls trail 9 and 5
    assert(native === Set((12L, 1L), (10L, 2L), (11L, 3L)))
  }

  test("fuzz: equals the window form on skewed random data") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    // skewed keys (hot key 0), heavy value ties — the adversarial case
    // for heap-vs-sort equivalence; id is the unique tiebreak
    val rows = (0 until 2000).map { id =>
      val g = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(20).toLong
      (g, id.toLong, rnd.nextInt(8).toLong)
    }
    val df = rows.toDF("g", "id", "v").repartition(7)
    for (k <- Seq(1, 3, 16)) {
      val native = TopKPerKey.topKPerKey(df, Seq("g"),
          Seq(("v", true), ("id", false)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val window = df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(native === window, s"k=$k diverged from the window form")
    }
  }

  test("rank column name is caller-controlled and collision-checked") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq((1L, 2L)).toDF("g", "v")
    val out = TopKPerKey.topKPerKey(df, Seq("g"), Seq(("v", false)),
      k = 5, rankName = "position")
    assert(out.columns.toSeq === Seq("g", "v", "position"))
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("missing"), Seq(("v", false)), 1)
    }
    // a rankName equal to an existing column would duplicate the
    // attribute name in the output schema → ambiguous references
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("g"), Seq(("v", false)), 1,
        rankName = "v")
    }
  }

  test("partial-phase flush: bounded memory stays lossless vs the " +
    "window twin at a tiny flush threshold") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    // high key cardinality (every other row a fresh key) forces the
    // partial heap map toward partition size — exactly the shape the
    // flush bound exists for; a 4-row threshold makes every partition
    // flush many times
    val rows = (1L to 5000L).map(i =>
      (i % 1000, i, (i * 2654435761L) % 100003L))
    val df = rows.toDF("g", "id", "v").repartition(7)
    val prev = spark.conf.getOption("graft.topk.partialFlushRows")
    spark.conf.set("graft.topk.partialFlushRows", "4")
    try {
      val native = TopKPerKey.topKPerKey(df, Seq("g"),
          Seq(("v", true), ("id", false)), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val window = df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(native === window,
        "flushing partial phase must not change the result")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.topk.partialFlushRows", v)
      case None => spark.conf.unset("graft.topk.partialFlushRows")
    }
  }

  test("final-phase sort fallback: exceeding the retained-rows bound " +
    "spills to external sort and still matches the window twin") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    // high key cardinality + k larger than most groups drives the final
    // phase's retained count past a tiny bound on every partition, so
    // every task takes the sort-fallback path (the partial phase also
    // flushes, stacking both degradations)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 4000).map { id =>
      val g = if (rnd.nextInt(5) == 0) 0L else rnd.nextInt(1500).toLong
      (g, id.toLong, rnd.nextInt(6).toLong)
    }
    val df = rows.toDF("g", "id", "v").repartition(5)
    val prevF = spark.conf.getOption("graft.topk.finalRetainedRows")
    val prevP = spark.conf.getOption("graft.topk.partialFlushRows")
    spark.conf.set("graft.topk.finalRetainedRows", "8")
    spark.conf.set("graft.topk.partialFlushRows", "16")
    try {
      for (k <- Seq(1, 3, 16)) {
        val nativeDf = TopKPerKey.topKPerKey(df, Seq("g"),
          Seq(("v", true), ("id", false)), k)
        val native = nativeDf.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
        val window = df.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        assert(native === window,
          s"k=$k diverged from the window form under the sort fallback")
        // prove the fallback actually ran: the final exec's metric
        // (AQE wraps the executed tree — descend through it)
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{
          AdaptiveSparkPlanExec, QueryStageExec}
        def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
          case q: QueryStageExec => p +: nodes(q.plan)
          case o => p +: o.children.flatMap(nodes)
        }
        val fallbacks =
          nodes(nativeDf.queryExecution.executedPlan).collect {
            case e: graft.plans.TopKPerKeyExec if !e.partial =>
              e.metrics("numFallbackSorts").value
          }.sum
        assert(fallbacks > 0,
          s"k=$k: expected at least one partition on the sort fallback")
      }
    } finally {
      prevF match {
        case Some(v) => spark.conf.set("graft.topk.finalRetainedRows", v)
        case None => spark.conf.unset("graft.topk.finalRetainedRows")
      }
      prevP match {
        case Some(v) => spark.conf.set("graft.topk.partialFlushRows", v)
        case None => spark.conf.unset("graft.topk.partialFlushRows")
      }
    }
  }

  test("float/double key columns are rejected (raw-byte grouping)") {
    val sparkS = spark
    import sparkS.implicits._
    // raw UnsafeProjection key bytes would split -0.0 vs 0.0 (and NaN
    // bit patterns) into separate groups, diverging from the window
    // twin's normalized grouping — the operator must refuse, not drift
    val df = Seq((0.0, 1L), (-0.0, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("g"), Seq(("v", false)), 1)
    }
    val dfF = df.select(col("g").cast("float").as("g"), col("v"))
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(dfF, Seq("g"), Seq(("v", false)), 1)
    }
  }
}
