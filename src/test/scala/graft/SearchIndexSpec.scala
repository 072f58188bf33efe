package graft

import graft.functions.{Dedup, SearchIndex, TrainPrep}
import org.apache.spark.sql.functions._

class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  /** Bigrams: "x y" in docs 1-3 (tf 2 in doc 1), "a b" in 2 and 4,
    * "c d" in 3 and 4, everything else hapax. */
  private lazy val tiny = Seq(
    (1L, "x y x y", "en", "s0", 7L),
    (2L, "x y a b", "en", "s0", 7L),
    (3L, "x y c d", "en", "s0", 7L),
    (4L, "a b c d", "en", "s0", 7L),
    (5L, "e f", "en", "s0", 3L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ── posting-list build ────────────────────────────────────────────

  test("postings: df/cf/list contents, hapax dropped, stop band stats-only") {
    val out = SearchIndex.postings(tiny, dfMin = 2, dfMax = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    // hapax bigrams fall below dfMin
    assert(out.keySet === Set("x y", "a b", "c d"))
    // "a b": df=2 cf=2, inside the band → full aligned lists
    val ab = out("a b")
    assert(ab.getLong(1) === 2L && ab.getLong(2) === 2L)
    assert(ab.getString(3) === "2,4")
    assert(ab.getString(4) === "1,1")
    // "x y": df=3 > dfMax → stats survive (cf counts doc 1 twice),
    // lists are quarantined
    val xy = out("x y")
    assert(xy.getLong(1) === 3L && xy.getLong(2) === 4L)
    assert(xy.isNullAt(3) && xy.isNullAt(4))
  }

  test("postings: tf list aligns with doc list (repeated phrase)") {
    val out = SearchIndex.postings(tiny, dfMin = 2, dfMax = 10)
      .filter(col("t") === "x y").head()
    assert(out.getString(3) === "1,2,3")
    // doc 1 holds "x y" twice
    assert(out.getString(4) === "2,1,1")
  }

  test("postings on the corpus: band bounds hold and lists are sorted") {
    val out = SearchIndex.postings(docs).cache()
    // both sides of the band are non-vacuous on the synthetic corpus
    assert(out.filter(col("posting_docs").isNotNull).count() > 0)
    assert(out.filter(col("posting_docs").isNull).count() > 0)
    assert(out.filter(col("df") < 3).isEmpty)
    assert(out.filter(col("df") <= 20 && col("posting_docs").isNull).isEmpty)
    assert(out.filter(col("df") > 20 && col("posting_docs").isNotNull).isEmpty)
    // listed band: df == list length, cf == Σtf, lists doc-sorted
    val bad = out.filter(col("posting_docs").isNotNull)
      .withColumn("__d", transform(split(col("posting_docs"), ","),
        x => x.cast("long")))
      .withColumn("__f", transform(split(col("posting_tfs"), ","),
        x => x.cast("long")))
      .filter(size(col("__d")) =!= col("df") ||
        aggregate(col("__f"), lit(0L), (a, x) => a + x) =!= col("cf") ||
        to_json(col("__d")) =!= to_json(array_sort(col("__d"))))
    assert(bad.isEmpty)
    out.unpersist()
  }

  // ── conjunctive search ────────────────────────────────────────────

  test("conjunctive search: AND semantics and tf ranking") {
    val out = SearchIndex.conjunctiveSearch(tiny, nTerms = 2, k = 10)
      .collect()
    // top-2 terms by cf: "x y" (4), "a b" (2, tie vs "c d" broken by
    // text); only doc 2 holds both
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(out.head.getLong(3) === 2L) // x y + a b
  }

  test("conjunctive search on the corpus is non-vacuous and bounded") {
    val out = SearchIndex.conjunctiveSearch(docs).collect()
    assert(out.nonEmpty, "top-2-phrase AND query must match some doc")
    assert(out.length <= 20)
    // ranking is non-increasing in sum_tf
    val tfs = out.map(_.getLong(3))
    assert(tfs.zip(tfs.tail).forall { case (x, y) => x >= y })
  }

  // ── positional phrase search ──────────────────────────────────────

  test("phrase search: positional AND, not boolean AND") {
    // top trigram is "x y z" (3 occurrences). Doc 12 contains BOTH its
    // bigrams ("x y", "y z") but never adjacent — boolean conjunction
    // would match it; the positional phrase must not.
    val fixture = Seq(
      (11L, "x y z x y z", "en", "s0", 11L), // phrase ×2
      (12L, "x y p y z", "en", "s0", 9L), // both bigrams, no phrase
      (13L, "x y z", "en", "s0", 5L), // phrase ×1
      (14L, "q r s", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = SearchIndex.phraseSearch(fixture)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("phrase_tf"))
    assert(out.toSeq === Seq(11L -> 2L, 13L -> 1L))
  }

  test("phrase search on the corpus is non-vacuous and tf-ordered") {
    val out = SearchIndex.phraseSearch(docs).collect()
    assert(out.nonEmpty, "top-trigram phrase must match some doc")
    assert(out.length <= 20)
    val tfs = out.map(_.getAs[Long]("phrase_tf"))
    assert(tfs.forall(_ >= 1))
    assert(tfs.zip(tfs.tail).forall { case (x, y) => x >= y })
  }

  // ── ranked disjunctive search ─────────────────────────────────────

  test("ranked search: scores equal a driver-side BM25 reference exactly") {
    val out = SearchIndex.rankedSearch(tiny, nTerms = 3, k = 10,
      dfMin = 2).collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // rarest indexable bigrams (df>=2): "a b"(2), "c d"(2), "x y"(3)
    val df = Map("a b" -> 2.0, "c d" -> 2.0, "x y" -> 3.0)
    val tf = Map( // (doc, term) -> tf
      (1L, "x y") -> 2.0, (2L, "x y") -> 1.0, (3L, "x y") -> 1.0,
      (2L, "a b") -> 1.0, (4L, "a b") -> 1.0,
      (3L, "c d") -> 1.0, (4L, "c d") -> 1.0)
    val dl = Map(1L -> 3.0, 2L -> 3.0, 3L -> 3.0, 4L -> 3.0, 5L -> 1.0)
    val n = 5.0; val sumDl = 13.0
    def s20(doc: Long, t: String): Long = {
      val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
      val s = idf * (tf((doc, t)) * 2.2) /
        (tf((doc, t)) + 1.2 * (0.25 + 0.75 * (dl(doc) / (sumDl / n))))
      math.floor(s * 1048576.0 + 0.5).toLong
    }
    val expected = tf.keys.toSeq.groupBy(_._1).map { case (doc, ks) =>
      doc -> (ks.size.toLong,
        ks.map { case (d, t) => s20(d, t) }.sum.toDouble / 1048576.0)
    }
    assert(out === expected)
  }

  test("ranked search on the corpus is non-vacuous and rank-ordered") {
    val out = SearchIndex.rankedSearch(docs).collect()
    assert(out.nonEmpty && out.length <= 10)
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    assert(out.forall(_.getLong(2) >= 1L))
  }

  // ── near-dup kill-rule survivorship ───────────────────────────────

  test("survivorship: killed copy charged to its own source") {
    val dup = Seq(
      (1L, "w1 w2 w3 w4 w5", "en", "sA", 14L),
      (2L, "w1 w2 w3 w4 w5", "en", "sB", 14L),
      (3L, "z1 z2", "en", "sB", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.survivorshipBySource(dup)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // sA holds the keeper (doc 1): nothing dropped
    assert(out("sA") === ((1L, 1L, 0L, 0L)))
    // sB's copy loses to doc 1; the short doc (no 4-grams) survives
    assert(out("sB") === ((2L, 1L, 1L, 14L)))
  }

  test("survivorship reconciles with the prefix-jaccard pair stream") {
    val killed = Dedup.ddPrefixJaccard(spark, sf)
      .select("d2").distinct().count()
    val surv = Dedup.survivorshipBySource(docs)
      .agg(sum("n_dropped"), sum("n_docs")).head()
    assert(surv.getLong(0) === killed)
    assert(surv.getLong(1) === docs.count())
  }

  // ── largest-remainder budget allocation ───────────────────────────

  test("budget allocation sums exactly to B and honors remainders") {
    val skew = Seq(
      (1L, "a a a a a a a", "en", "s1", 13L), // 7 tokens
      (2L, "b b b b b", "en", "s2", 9L), // 5
      (3L, "c c c", "en", "s3", 5L), // 3
      (4L, "d d", "en", "s4", 3L)) // 2  → W=17, B=5
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TrainPrep.budgetAllocation(skew)
      .collect().map(r => r.getString(0) -> r).toMap
    // floors: 7·5/17=2, 5·5/17=1, 3·5/17=0, 2·5/17=0 → Σ=3, R=2
    // remainders: 1, 8, 15, 10 → extras to s3 (15) and s4 (10)
    assert(out("s1").getLong(5) === 2L)
    assert(out("s2").getLong(5) === 1L)
    assert(out("s3").getLong(5) === 1L)
    assert(out("s4").getLong(5) === 1L)
    assert(out.values.map(_.getLong(5)).sum === 5L)
  }

  test("budget allocation on the corpus: Σalloc == W div 3 exactly") {
    val toks = docs.agg(
      sum(size(split(col("text"), "\\s+")).cast("long"))).head().getLong(0)
    val alloc = TrainPrep.budgetAllocation(docs)
      .agg(sum("alloc")).head().getLong(0)
    assert(alloc === toks / 3)
  }

  test("hybrid RRF: contiguous ranks, both channels contribute, " +
    "rrf recomputes from the channel ranks") {
    val out = SearchIndex.hyHybridRrf(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to rs.length), s"query $q ranks not contiguous")
      assert(rs.length <= 10)
      // no self-retrieval
      assert(rs.forall(_.getAs[Long]("c_id") != q), s"query $q self-hit")
    }
    // the fusion is non-degenerate: lexical-only, semantic-only and
    // dual-channel results all appear, and a dual-channel hit tops at
    // least one query (that is WHY one fuses)
    assert(out.exists(r =>
      r.getAs[Boolean]("in_text") && !r.getAs[Boolean]("in_vec")))
    assert(out.exists(r =>
      !r.getAs[Boolean]("in_text") && r.getAs[Boolean]("in_vec")))
    assert(out.exists(r =>
      r.getAs[Boolean]("in_text") && r.getAs[Boolean]("in_vec") &&
        r.getAs[Int]("rank") == 1))
    out.foreach { r =>
      val rrf = r.getAs[Double]("rrf")
      // each channel contributes at most 1/61 (rank 1); at least one
      // channel is present (rank ≤ 20 ⇒ ≥ 1/80)
      assert(rrf > 1.0 / 81.0 && rrf <= 2.0 / 61.0 + 1e-12)
      // text-channel rows carry matched terms; vector-only rows none
      if (!r.getAs[Boolean]("in_text"))
        assert(r.getAs[Long]("n_matched") === 0L)
      else assert(r.getAs[Long]("n_matched") >= 1L)
    }
  }

  test("adaptive vector channel: cell sizing, budget trip, IVF recall") {
    import graft.functions.SearchIndex
    // integer cell-sizing rule: smallest power of two in [8, 1024]
    // with mean occupancy <= 2048
    assert(SearchIndex.hyCells(500) === 8)
    assert(SearchIndex.hyCells(20000) === 16)
    assert(SearchIndex.hyCells(200000) === 128)
    assert(SearchIndex.hyCells(10000000) === 1024) // clamp
    // budget arithmetic: every certification scale stays exact, sf10
    // (200k corpus, ~2k panel) trips to IVF
    def trips(n: Long) = n * (n / 100L + 1L) > SearchIndex.HyExactBudget
    assert(!trips(500) && !trips(2000) && !trips(20000))
    assert(trips(200000))
    // the forced-IVF shape retrieves with real overlap vs exact (the
    // oracled gate asserts >= 0.5 mean; pin tighter on the fixed corpus)
    val emb = Tables.embeddings(spark, sf)
    val exact = SearchIndex.hyVecChannel(emb, forceIvf = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SearchIndex.hyVecChannel(emb, forceIvf = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    // IVF results never include the query itself
    assert(approx.forall { case (q, c) => q != c })
    val byQ = exact.groupBy(_._1)
    val recalls = byQ.map { case (q, hits) =>
      hits.count(approx.contains).toDouble / hits.size }
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean IVF-channel recall too low: ${recalls.sum / recalls.size}")
    assert(recalls.forall(_ >= 0.25),
      s"per-query IVF-channel recall floor broken: ${recalls.toSeq.sorted}")
  }
}
