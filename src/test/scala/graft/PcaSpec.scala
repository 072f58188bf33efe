package graft

import graft.functions.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def collected: Array[Array[Double]] =
    Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("distributed iteration is the driver-side iteration, step for step") {
    // the corpus' top eigenvalues are near-degenerate (λ2/λ1 ≈ 1), so
    // NO iteration count pins one eigenvector — the checkable claim is
    // algorithmic equivalence: the distributed pass at t iterations
    // must land where the driver-side pass at t iterations lands
    // (any vector in the near-top eigenspace serves whitening equally)
    val iters = 8
    val (mean, v, lambda) =
      Pca.topComponent(Tables.embeddings(spark, sf), iters)
    val xs = collected
    val d = xs.head.length
    val n = xs.length.toDouble
    assert(v.length === d)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    val mu = Array.tabulate(d)(k => xs.map(_(k)).sum / n)
    mean.zip(mu).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4, "distributed mean matches")
    }
    var w = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lam = 0.0
    for (_ <- 0 until iters) {
      val cw = Array.fill(d)(0.0)
      xs.foreach { x =>
        var c = 0.0
        var k = 0
        while (k < d) { c += (x(k) - mu(k)) * w(k); k += 1 }
        k = 0
        while (k < d) { cw(k) += (x(k) - mu(k)) * c; k += 1 }
      }
      val g = cw.map(_ / n)
      val norm = math.sqrt(g.map(x => x * x).sum)
      lam = w.zip(g).map { case (a, b) => a * b }.sum
      w = g.map(_ / norm)
      val lead = w.find(math.abs(_) > 1e-12)
      if (lead.exists(_ < 0)) w = w.map(x => -x)
    }
    val cos = math.abs(v.zip(w).map { case (a, b) => a * b }.sum)
    assert(cos > 0.9999, s"distributed diverged from driver: |cos|=$cos")
    assert(math.abs(lambda - lam) / lam < 1e-2,
      s"eigenvalue off: $lambda vs $lam")
    assert(lambda > 0)
  }

  test("component is bit-identical across partition layouts") {
    val emb = Tables.embeddings(spark, sf)
    val (m1, v1, l1) = Pca.topComponent(emb.repartition(3))
    val (m2, v2, l2) = Pca.topComponent(emb.repartition(11))
    assert(m1.toSeq === m2.toSeq)
    assert(v1.toSeq === v2.toSeq, "integer folds must erase layout order")
    assert(l1 === l2)
  }

  test("emb_pca_power: per-label projection stats are consistent") {
    val rows = Pca.embPcaPower(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.embeddings(spark, sf).count())
    // variance along the top component is the eigenvalue: the pooled
    // second moment of centered projections must reproduce it closely
    val pooled = rows.map(r =>
      r.getAs[Double]("mean_sq_proj") * r.getAs[Long]("n")).sum / total
    val lambda = rows.head.getAs[Double]("eigenvalue")
    assert(math.abs(pooled - lambda) / lambda < 0.05,
      s"pooled projection variance $pooled vs eigenvalue $lambda")
    rows.foreach(r => assert(r.getAs[Double]("eigenvalue") === lambda))
  }

  test("pca gate: unit norm, Jensen, and the Rayleigh identity all hold") {
    val rows = Pca.embPcaPowerGate(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("jensen_ok"), r.toString)
      assert(r.getAs[Boolean]("rayleigh_ok"), r.toString)
      assert(r.getAs[Boolean]("unit_norm_ok"), r.toString)
    }
  }

  test("JL distortion: matches a driver recompute exactly, geometry survives") {
    val got = Pca.embJlDistortion(spark, sf).collect()
    val n = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 30).count()
    assert(got.length === (n * (n - 1) / 2).toInt)
    // regenerate the sign matrix with the same LCG
    var s = 0xd1b54a32d192ed03L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (s < 0L) -1.0 else 1.0
    }
    val signs = Array.fill(32, 64)(next())
    val vecs = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 30).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def dotIdx(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotIdx(a, b) / (math.sqrt(dotIdx(a, a)) * math.sqrt(dotIdx(b, b)))
    def proj(v: Array[Double]): Array[Double] = signs.map(dotIdx(v, _))
    got.foreach { r =>
      val (a, b) = (vecs(r.getAs[Long]("v1")), vecs(r.getAs[Long]("v2")))
      assert(r.getAs[Double]("cos_full") === cos(a, b))
      assert(r.getAs[Double]("cos_jl") === cos(proj(a), proj(b)))
      assert(r.getAs[Double]("abs_err") ===
        math.abs(cos(a, b) - cos(proj(a), proj(b))))
    }
    // JL quality: projecting 64→32 must keep pairwise cosine geometry
    // coarse but usable — mean gap well under the concentration scale
    val meanErr = got.map(_.getAs[Double]("abs_err")).sum / got.length
    assert(meanErr < 0.25, s"mean cosine distortion too high: $meanErr")
  }

  test("JL recall: equals the exact/projected top-k intersection size") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val all = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    var s = 0xd1b54a32d192ed03L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (s < 0L) -1.0 else 1.0
    }
    val signs = Array.fill(32, 64)(next())
    def dotIdx(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotIdx(a, b) / (math.sqrt(dotIdx(a, a)) * math.sqrt(dotIdx(b, b)))
    def proj(v: Array[Double]): Array[Double] = signs.map(dotIdx(v, _))
    val got = Pca.embJlRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall_at_k"))).toMap
    assert(got.keySet === (0L until 10L).toSet)
    for (q <- 0L until 10L) {
      val qv = all(q)
      val cands = all.toSeq.filter(_._1 != q)
      val exact = cands.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      // two-stage pipeline: projected top-50 shortlist, exact re-rank
      val qp = proj(qv)
      val shortlist = cands.map { case (id, v) => (id, cos(qp, proj(v))) }
        .sortBy { case (id, c) => (-c, id) }.take(50).map(_._1).toSet
      val finalTopK = cands.filter(c => shortlist(c._1))
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val hits = (exact & finalTopK).size.toLong
      assert(got(q)._1 === hits, s"q$q n_hit")
      assert(got(q)._2 === hits.toDouble / 10.0)
    }
    // usable-retrieval gate: shortlist+rerank must keep most of top-k
    // (at d'=16 pure projected ranking managed ~0.12 and the pipeline
    // 0.36 — the measurements that set d'=32)
    val totalRecall = got.values.map(_._2).sum / got.size
    assert(totalRecall > 0.5, s"mean JL pipeline recall: $totalRecall")
  }
}
