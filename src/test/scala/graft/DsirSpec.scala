package graft

import graft.functions.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  /** Tiny corpus with a sharp target/raw vocabulary split: target
    * (en) docs speak "alpha beta", raw-only (zh) docs speak "gamma
    * delta", and one mixed doc sits between. */
  private def fixture = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (1L, "alpha beta alpha beta", "en", "src0", 21L),
      (2L, "alpha beta beta alpha", "en", "src0", 21L),
      (3L, "gamma delta gamma delta", "zh", "src1", 23L),
      (4L, "gamma delta delta gamma", "zh", "src1", 23L),
      (5L, "alpha beta gamma delta", "zh", "src2", 22L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("weights match the closed-form smoothed-count ratio") {
    val got = Dsir.dsirWeights(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // Corpus: c_r = 5 for each of alpha/beta/gamma/delta (V=4, R=20);
    // target (en): c_t(alpha)=c_t(beta)=4, c_t(gamma)=c_t(delta)=0, T=8.
    // Doc 1: n=4 target words → num=4·(4+1)=20, den=4·(5+1)=24.
    assert(got(1L) === ((4L, 20L, 24L, (20.0 * 24.0) / (24.0 * 12.0))))
    // Doc 3: pure raw-only words → num=4·(0+1)=4, den=24.
    assert(got(3L) === ((4L, 4L, 24L, (4.0 * 24.0) / (24.0 * 12.0))))
    // Doc 5: mixed → num=2·5+2·1=12.
    assert(got(5L)._2 === 12L)
  }

  test("target-domain docs outrank raw-only docs; mixed sits between") {
    val w = Dsir.dsirWeights(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(w(1L) > w(5L) && w(5L) > w(3L))
    assert(w(1L) === w(2L)) // bag-of-words: permutations score equally
  }

  test("resample keeps the top slice deterministically") {
    val sel = Dsir.dsirResample(fixture, n = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the two pure-target docs win; nothing else selected
    assert(sel === Map("src0" -> 2L))
  }

  test("degenerate corpora stay finite: no target docs, empty text") {
    val sparkS = spark
    import sparkS.implicits._
    val noTarget = Seq(
      (1L, "gamma delta", "zh", "src0", 11L),
      (2L, "", "fr", "src1", 0L) // empty text → one "" token, n=1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = Dsir.dsirWeights(noTarget).collect()
    assert(w.length === 2)
    w.foreach { r =>
      val weight = r.getDouble(4)
      assert(!weight.isNaN && !weight.isInfinite && weight > 0.0)
      // T=0: every word's smoothed target count is 1 → num = n_tokens
      assert(r.getLong(2) === r.getLong(1))
    }
  }

  test("real-table weights are positive, finite, and corpus-complete") {
    val docs = Tables.documents(spark, sf)
    val w = Dsir.dsirWeights(docs)
    assert(w.count() === docs.count())
    assert(w.filter(col("weight") <= 0.0 || isnan(col("weight"))
      || col("weight").isNull).count() === 0)
    // English docs carry more target mass on average than non-English
    val byLang = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("weight").as("aw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false))
  }
}
