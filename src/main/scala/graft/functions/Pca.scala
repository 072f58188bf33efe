package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of the embedding corpus by distributed
  * power iteration — the dimensionality-reduction primitive an
  * embedding pipeline wants before ANN indexing (decorrelation,
  * whitening, OPQ-style rotations all start here).
  *
  * Spark shape, 100 TB notes:
  *  - the iterate v (d doubles) and the mean μ are MODEL STATE: they
  *    enter each pass as array literals, so an iteration is ONE corpus
  *    scan — per row the scalar c = (x−μ)ᵀv via a codegen'd dot
  *    product, then the d-vector contribution (x−μ)·c;
  *  - the vector sum folds like [[Pq.trainCodebooks]]' means: each
  *    contribution rounds to a 2^20-scaled long and per-dimension LONG
  *    sums shuffle with map-side partials (d cells total back to the
  *    driver) — long addition commutes, so the component is BIT-STABLE
  *    across partitionings and shuffle widths (PcaSpec asserts);
  *  - Gram/covariance matrices are never materialized: power iteration
  *    needs only C·v products, which is why it scales where an O(d²)
  *    covariance build per pass would not (and at d where d² IS
  *    affordable, the same foldVector builds the matrix directly).
  *
  * Sign convention: the first coordinate with |v_k| > 1e-12 is made
  * positive, so the eigenvector (unique up to sign) is deterministic.
  *
  * Convergence honesty: power iteration closes on the top eigenvector
  * at rate (λ2/λ1)^t. On a flat spectrum the t-step iterate is a mix
  * of near-top directions — still deterministic and still capturing
  * ~λ1 of variance (what whitening needs) — so PcaSpec pins STEP
  * EQUIVALENCE with a driver-side reference at equal t, not agreement
  * with an (equally unconverged) long run.
  */
object Pca {

  private val Scale = 1048576.0d // 2^20: |x|≤O(10), n≤10^9 stays in int64

  /** Exact layout-independent fold of a per-row d-vector expression:
    * per-dimension sums of 2^20-scaled longs, returned as doubles. */
  private def foldVector(rows: DataFrame, vec: Column, d: Int)
      : Array[Double] = {
    val collected = rows
      .select(posexplode(vec).as(Seq("k", "e")))
      .groupBy("k")
      .agg(sum(floor(col("e") * lit(Scale) + lit(0.5d)).cast("long"))
        .as("s"))
      .collect()
    val out = new Array[Double](d)
    collected.foreach(r =>
      out(r.getAs[Int]("k")) = r.getAs[Long]("s").toDouble / Scale)
    out
  }

  private def litVec(v: Array[Double]): Column =
    array(v.map(lit).toIndexedSeq: _*)

  /** (mean, component, eigenvalue): the corpus mean, the unit top
    * eigenvector of the covariance, and its eigenvalue (variance along
    * the component). */
  def topComponent(emb: DataFrame, iters: Int = 8)
      : (Array[Double], Array[Double], Double) = {
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    val cached = emb
      .select(transform(col("embedding"), _.cast("double")).as("x"))
      .persist()
    try {
      val n = cached.count().toDouble
      val mean = foldVector(cached, col("x"), d).map(_ / n)
      // deterministic seed: the uniform unit vector (no data order, no RNG)
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val muDotV = mean.zip(v).map { case (a, b) => a * b }.sum
        val c = VectorFunctions.dot_product(col("x"), litVec(v)) - lit(muDotV)
        val contrib = transform(col("x"),
          (xk, k) => (xk - element_at(litVec(mean), k + 1)) * c)
        val w = foldVector(cached, contrib, d).map(_ / n)
        val norm = math.sqrt(w.map(x => x * x).sum)
        require(norm > 0, "degenerate covariance: zero C*v product")
        lambda = v.zip(w).map { case (a, b) => a * b }.sum // Rayleigh vᵀCv
        var vn = w.map(_ / norm)
        val lead = vn.find(math.abs(_) > 1e-12)
        if (lead.exists(_ < 0)) vn = vn.map(x => -x)
        v = vn
      }
      (mean, v, lambda)
    } finally { cached.unpersist(); () }
  }

  /** Declared query: project every embedding onto the corpus' top
    * component and profile the projection per label — the "is the
    * leading direction of variance aligned with my labels?" check run
    * before trusting embedding clusters. Rows-only (power iteration
    * isn't SQL); PcaSpec verifies the component against a driver-side
    * eigensolve and pins bit-stability across layouts. */
  def embPcaPower(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val (mean, v, lambda) = topComponent(emb)
    val c = VectorFunctions.dot_product(
      transform(col("embedding"), _.cast("double")), litVec(v)) -
      lit(mean.zip(v).map { case (a, b) => a * b }.sum)
    emb
      .withColumn("proj", c)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("proj") * lit(Scale) + lit(0.5d)).cast("long"))
          .as("sproj"),
        sum(floor(col("proj") * col("proj") * lit(Scale) + lit(0.5d))
          .cast("long")).as("sproj2"))
      .select(col("label"), col("n"),
        (col("sproj").cast("double") / lit(Scale) / col("n").cast("double"))
          .as("mean_proj"),
        (col("sproj2").cast("double") / lit(Scale) / col("n").cast("double"))
          .as("mean_sq_proj"),
        lit(lambda).as("eigenvalue"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca_power" -> (embPcaPower _))

  val oracles: Map[String, String] = Map.empty
}
