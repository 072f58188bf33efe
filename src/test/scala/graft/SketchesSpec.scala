package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("HLL distinct counts land within the configured error of exact") {
    // the query's own bounds flags (now oracled by the driver) hold
    val rows = Sketches.skApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} parts outside bounds")
      assert(r.getBoolean(4), s"${r.getString(0)} orders outside bounds")
    }
    // and the raw estimates stay within 10% of exact (direct agg)
    val both = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("ao"))
      .collect()
    both.foreach { r =>
      val (p, o, ap, ao) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.abs(ap - p).toDouble / p < 0.1, s"parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"orders: $ao vs $o")
    }
  }

  test("approximate percentiles bracket the exact quantiles") {
    // the query's rank-interval flags (now oracled by the driver) hold
    val r = Sketches.skApproxPercentiles(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
      s"percentile rank bounds violated: $r")
    // and the raw estimates are ordered and near exact (direct agg)
    val est = Tables.lineitem(spark, sf).agg(
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)),
      approx_percentile(col("l_extendedprice"), lit(0.95), lit(1000)),
      approx_percentile(col("l_extendedprice"), lit(0.99), lit(1000)))
      .collect().head
    val (p50, p95, p99) =
      (est.getDouble(0), est.getDouble(1), est.getDouble(2))
    assert(p50 < p95 && p95 < p99)
    val exact = Tables.lineitem(spark, sf)
      .stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(p50 - exact) / exact < 0.05,
      s"p50 $p50 vs exact-ish $exact")
  }

  test("CMS heavy-hitter estimates respect the one-sided error bound") {
    // the query's own bound flags (now oracled by the driver) hold:
    // never_under is CMS's hard guarantee, within_eps the eps·N bound
    val rows = Sketches.skHeavyHitters(spark, sf).collect()
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)), s"exact count: $r")
      assert(r.getBoolean(2), s"CMS underestimated: $r")
      assert(r.getBoolean(3), s"CMS above eps*N bound: $r")
    }
  }

  test("HLL union gate: all bounds flags true, exact vocab charged back") {
    val rows = Sketches.skHllUnionGate(spark, sf).collect()
    val srcs = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length === srcs + 1) // per source + __all__
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_err"), r.toString)
      assert(r.getAs[Boolean]("union_lossless"), r.toString)
      assert(r.getAs[Long]("exact_vocab") > 0)
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
