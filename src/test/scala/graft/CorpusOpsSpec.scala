package graft

import graft.functions.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  // ── boilerplate tile pruning ──────────────────────────────────────

  /** 4 docs sharing one exact 4-word tile at a tile boundary, plus a
    * partial trailing tile that textually repeats everywhere (but must
    * never be treated as boilerplate). */
  private lazy val tiled = Seq(
    (1L, "aa bb cc dd u1 u2 u3 u4 zz", "en", "s0", 9L),
    (2L, "aa bb cc dd v1 v2 v3 v4 zz", "en", "s0", 9L),
    (3L, "aa bb cc dd w1 w2 w3 w4 zz", "en", "s0", 9L),
    (4L, "aa bb cc dd x1 x2 x3 x4 zz", "en", "s0", 9L),
    (5L, "p1 p2 p3 p4 p5 p6 p7 p8 zz", "en", "s0", 9L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("boilerplate tile dropped everywhere but the keeper; partial tile survives") {
    val out = CorpusOps.boilerplatePrune(tiled, k = 4, tau = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is the keeper: keeps the hot tile, loses nothing
    assert(out(1L) === ((3L, 0L, "aa bb cc dd u1 u2 u3 u4 zz")))
    // docs 2-4 drop exactly the hot tile, keep their unique middle + 'zz'
    assert(out(2L) === ((3L, 1L, "v1 v2 v3 v4 zz")))
    assert(out(3L) === ((3L, 1L, "w1 w2 w3 w4 zz")))
    assert(out(4L) === ((3L, 1L, "x1 x2 x3 x4 zz")))
    // doc 5 shares only the partial trailing tile 'zz' → untouched
    assert(out(5L) === ((3L, 0L, "p1 p2 p3 p4 p5 p6 p7 p8 zz")))
  }

  test("boilerplate prune on real docs: kept text is a subsequence of the original") {
    val out = CorpusOps.boilerplatePrune(docs, k = 4, tau = 2)
    assert(out.count() === docs.count())
    // something pruned, but not everything
    val dropped = out.agg(sum("n_dropped")).first().getLong(0)
    val total = out.agg(sum("n_tiles")).first().getLong(0)
    assert(dropped > 0, "tau=2 must be non-vacuous on the synthetic corpus")
    assert(dropped < total / 2, "pruning should not gut the corpus")
    // every kept doc's words appear in the original in order
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), split(col("text_kept"), " ").as("kept"),
        split(col("text"), " ").as("orig"))
      .filter(col("text_kept") =!= "")
      .collect()
    joined.foreach { r =>
      val kept = r.getSeq[String](1)
      val orig = r.getSeq[String](2)
      var j = 0
      kept.foreach { w =>
        val at = orig.indexOf(w, j)
        assert(at >= 0, s"doc ${r.getLong(0)}: '$w' out of order")
        j = at + 1
      }
    }
  }

  test("a doc-frequency-tau tile (not above tau) is NOT pruned") {
    val out = CorpusOps.boilerplatePrune(
      tiled.filter(col("doc_id") <= 2), k = 4, tau = 2)
    // tile appears in 2 docs = tau → below the > tau cut, both keep it
    assert(out.filter(col("n_dropped") > 0).count() === 0)
  }

  // ── sequential Poisson sampling ───────────────────────────────────

  test("priority sample matches a driver-side replay and is layout-invariant") {
    val k = 25
    val out = CorpusOps.prioritySample(docs, k = k)
    val got = out.select("doc_id").as[Long].collect()
    assert(got.length === k)
    // driver replay of the same priority formula
    val base = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
    val expected = base.map { case (id, w) =>
      val u = (((id + 11) % 1000003 + 1000003) % 1000003) *
        2654435761L % 1048576 + 1
      (id, w.toDouble / u)
    }.sortBy { case (id, p) => (-p, id) }.take(k).map(_._1)
    assert(got.toSeq === expected.toSeq)
    // invariant under partitioning
    val re = CorpusOps.prioritySample(docs.repartition(13), k = k)
      .select("doc_id").as[Long].collect()
    assert(re.toSeq === got.toSeq)
  }

  test("priority sample favors heavier docs") {
    val out = CorpusOps.prioritySample(docs, k = 50)
    val sampleMean = out.agg(avg("w")).first().getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).first().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  // ── corpus overlap ────────────────────────────────────────────────

  test("corpus overlap computes exact pairwise Jaccard on a known fixture") {
    // s1 bigrams: {a b, b c} ; s2: {a b, b x} ; s3: {q r}
    val fix = Seq(
      (1L, "a b c", "s1", 5L), (2L, "a b x", "s2", 5L),
      (3L, "q r", "s3", 3L))
      .toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
    val out = CorpusOps.corpusOverlap(fix).collect()
    assert(out.length === 1, "only s1×s2 intersect")
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("s1", "s2")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 2L, 1L)))
    assert(r.getDouble(5) === 1.0 / 3.0) // jaccard: 1 common of 3 distinct
    assert(r.getDouble(6) === 0.5)       // containment: 1 of min(2,2)
  }

  test("corpus overlap on real docs: symmetric bounds hold") {
    val out = CorpusOps.corpusOverlap(docs)
    assert(out.filter(col("jaccard") < 0 || col("jaccard") > 1).count() === 0)
    assert(out.filter(col("containment") < col("jaccard")).count() === 0,
      "containment ≥ jaccard always")
    assert(out.filter(col("n_common") > least(col("n1"), col("n2")))
      .count() === 0)
  }

  // ── integer surprisal ─────────────────────────────────────────────

  test("surprisal matches hand computation on a tiny corpus") {
    // tokens: a×4, b×2, c×1, d×1 → N=8
    // s(a)=⌊log2(8/4)⌋=1  s(b)=⌊log2(8/2)⌋=2  s(c)=s(d)=⌊log2 8⌋=3
    val fix = Seq(
      (1L, "a a b c"), // 1+1+2+3 = 7
      (2L, "a a b d")) // 1+1+2+3 = 7
      .toDF("doc_id", "text")
    val out = CorpusOps.surprisalScores(fix).collect()
    out.foreach { r =>
      assert(r.getLong(1) === 4L)
      assert(r.getLong(2) === 7L)
      assert(r.getInt(3) === 3)
      assert(r.getDouble(4) === 7.0 / 4.0)
    }
  }

  test("surprisal is layout-invariant (integer folds commute)") {
    val a = CorpusOps.surprisalScores(docs).collect()
    val b = CorpusOps.surprisalScores(docs.repartition(17)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  // ── corpus version diff ───────────────────────────────────────────

  test("version diff classifies added/removed/changed/same exactly") {
    val v1 = Seq(
      (1L, "kept text", "sA", 9L),
      (2L, "old body", "sA", 8L),
      (3L, "gone", "sB", 4L))
      .toDF("doc_id", "text", "source", "n_chars")
    val v2 = Seq(
      (1L, "kept text", "sA", 9L),
      (2L, "new body", "sA", 8L),
      (4L, "fresh", "sB", 5L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = CorpusOps.versionDiff(v1, v2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("sA", "same")) === ((1L, 9L, 9L)))
    assert(out(("sA", "changed")) === ((1L, 8L, 8L)))
    assert(out(("sB", "removed")) === ((1L, 4L, 0L)))
    assert(out(("sB", "added")) === ((1L, 0L, 5L)))
    assert(out.size === 4)
  }

  test("tp_version_diff: every status non-vacuous, totals reconcile") {
    val out = CorpusOps.tpVersionDiff(spark, sf).cache()
    val statuses = out.select("status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses === Set("added", "removed", "changed", "same"))
    // v1 doc count = same + changed + removed; v2 = same + changed + added
    val n = docs.count()
    val byStatus = out.groupBy("status")
      .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1n = docs.filter(col("doc_id") % 10 =!= 9).count()
    val v2n = docs.filter(col("doc_id") % 10 =!= 0).count()
    assert(byStatus("same") + byStatus("changed") + byStatus("removed") === v1n)
    assert(byStatus("same") + byStatus("changed") + byStatus("added") === v2n)
    assert(n >= v1n && n >= v2n)
    out.unpersist()
  }
}
