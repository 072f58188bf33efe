package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("HLL distinct counts land within the configured error of exact") {
    val approx = Sketches.skApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, o)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$flag parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$flag orders: $ao vs $o")
    }
  }

  test("approximate percentiles bracket the exact quantiles") {
    val r = Sketches.skApproxPercentiles(spark, sf).collect().head
    val (p50, p95, p99) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(p50 < p95 && p95 < p99)
    val exact = Tables.lineitem(spark, sf)
      .stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(p50 - exact) / exact < 0.05,
      s"p50 $p50 vs exact-ish $exact")
  }

  test("CMS heavy-hitter estimates respect the one-sided error bound") {
    val est = Sketches.skHeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      // CMS never underestimates; overestimate bounded by eps·N
      assert(est(k) >= n, s"$k: ${est(k)} < $n")
      assert(est(k) <= n + (0.001 * total).toLong + 1,
        s"$k: ${est(k)} vs $n (N=$total)")
    }
  }

  test("HLL union of per-source sketches equals a direct corpus sketch") {
    val rows = Sketches.skHllUnion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis
        .wsTokens(col("text"))).as("tok"))
    // merged estimate == directly-computed corpus sketch estimate
    // (union over same-width sketches is lossless)
    val direct = toks
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(tok, 12))")
        .cast("long")).head().getLong(0)
    assert(rows("__all__") === direct,
      "union of per-source sketches must equal the one-shot sketch")
    // and within HLL error of the exact corpus vocabulary
    val exact = toks.distinct().count()
    assert(math.abs(rows("__all__") - exact).toDouble / exact < 0.05,
      s"union est ${rows("__all__")} vs exact $exact")
    // every per-source estimate is bounded by the union's key space
    rows.filter(_._1 != "__all__").values
      .foreach(v => assert(v <= rows("__all__") * 2))
  }

  test("join-size sketch: one-sided, concentrated, and exact side true") {
    val r = Sketches.skJoinSize(spark, sf).collect().head
    val (nl, nr) = (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"))
    val exact = r.getAs[Long]("exact_pairs")
    val est = r.getAs[Long]("est_pairs")
    // the exact side really is the join size (independent recompute
    // through the actual join, which the estimator never executes)
    val joined = Tables.events(spark, sf).select(col("user_id").as("k"))
      .join(Tables.orders(spark, sf).select(col("o_custkey").as("k")),
        Seq("k"))
      .count()
    assert(exact === joined, "exact side must equal the executed join")
    // CMS inner product: collisions only add → never an underestimate
    assert(est >= exact, s"one-sided bound violated: $est < $exact")
    // Markov + min over depths: overshoot ≤ 4·|A|·|B|/W with
    // probability 1 − 4^-D; deterministic data, so once green always
    // green
    val bound = exact + 4L * nl * nr / 16384L
    assert(est <= bound, s"est $est above concentration bound $bound")
  }
}
