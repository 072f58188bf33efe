package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("dot/norm/cosine: self-cosine is 1, cosine bounded") {
    val selfCos = emb.limit(20)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(selfCos.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("brute-force top-k: k rows per query, ranked by descending cosine") {
    val topk = Similarity.simTopK(spark, sf)
    val byQuery = topk.groupBy("q_id").count().collect()
    assert(byQuery.length === 10)
    assert(byQuery.forall(_.getLong(1) === 5))
    val ranks = topk.filter(col("q_id") === 0)
      .orderBy("rank").collect().map(_.getDouble(2))
    assert(ranks.toSeq === ranks.sorted(Ordering[Double].reverse).toSeq)
  }

  test("brute-force matches a driver-side exact computation") {
    val vecs = emb.filter(col("vec_id") <= 60).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q0 = vecs(0L)
    val expected = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(q0, v) }
    val got = Similarity.topKBruteForce(
      emb.filter(col("vec_id") === 0), emb.filter(col("vec_id") <= 60), 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2))
    val expTop = expected.toSeq.sortBy { case (id, c) => (-c, id) }.take(3)
    assert(got.map(_._1).toSeq === expTop.map(_._1))
    got.zip(expTop).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-9) }
  }

  test("LSH: bucket keys are deterministic and candidates rank exactly") {
    val k1 = Similarity.withLshKey(emb.limit(50), "embedding")
      .select("vec_id", "lsh_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k2 = Similarity.withLshKey(emb.limit(50), "embedding")
      .select("vec_id", "lsh_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1 === k2, "same planes every evaluation")
    val ann = Similarity.simLsh(spark, sf)
    // every ANN result is a same-bucket candidate with correct rank order
    assert(ann.filter(col("rank") > 5).count() === 0)
  }

  test("LSH recall: identical vectors always share a bucket") {
    val sparkS = spark
    import sparkS.implicits._
    val dup = emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", lit(99999L))
    val u = emb.unionByName(dup)
    val keys = Similarity.withLshKey(u.filter(col("vec_id").isin(3, 99999)),
      "embedding").select("lsh_key").distinct().count()
    assert(keys === 1)
  }

  test("quantized near-dup query is label-partitioned and complete") {
    val q = Similarity.simQuantized(spark, sf)
    val total = q.agg(sum("n_vecs")).collect().head.getLong(0)
    assert(total === emb.count())
  }
}
