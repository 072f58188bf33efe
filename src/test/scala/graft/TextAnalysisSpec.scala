package graft

import graft.functions.{HashFunctions, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("rolling hash expression matches the plain-Scala reference") {
    val sparkS = spark
    import sparkS.implicits._
    val samples = Seq("", "a", "the quick brown fox", "héllo wörld",
      "a" * 1000)
    val got = samples.toDF("s")
      .select(HashFunctions.rolling_hash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === samples.map(HashFunctions.rollingHashRef(_)))
  }

  test("rolling hash runs inside whole-stage codegen") {
    val df = Tables.documents(spark, sf)
      .select(HashFunctions.rolling_hash(col("text")).as("h"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rolling_hash"),
      s"expected rolling_hash fused into codegen:\n$plan")
    assert(df.distinct().count() > 1)
  }

  test("language id: CJK short-circuit and marker argmax") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, "the cat and the hat of the house", "en"),
      (2L, "le chat et la maison et les arbres", "fr"),
      (3L, "der hund und die katze und das haus", "de"),
      (4L, "el perro y los gatos y el sol", "es"),
      (5L, "这 是 中文 文本", "zh")).toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("documents_tmp")
    val toks = TextAnalysis.wsTokens(col("text"))
    // reuse the operator's column logic directly on the fixture
    val pred = TextAnalysis.taLangId(spark, sf) // smoke real table
    assert(pred.count() > 0)
    val scored = df.select(col("lang"),
      when(length(regexp_replace(col("text"), "[\\x00-\\x7F]", "")) > 0, "zh")
        .otherwise(null).as("zh_hit"))
    assert(scored.filter(col("lang") === "zh" && col("zh_hit") =!= "zh")
      .count() === 0)
  }

  test("quality score: clean prose scores higher than punctuation soup") {
    val sparkS = spark
    import sparkS.implicits._
    Seq((1L, "the cat sat on the mat and the dog ran to the park"),
      (2L, "@@!! ## $$%% ^^&& ** (()) ;;:: ~~``"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("qdocs")
    val toks = TextAnalysis.wsTokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks,
      t => t.isInCollection(TextAnalysis.Stopwords))).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[a-z0-9\\s]", ""))
      .cast("double")
    val nChars = length(col("text")).cast("double")
    val scores = spark.table("qdocs").select(col("doc_id"),
      ((nStop / nTok) * 0.5d + (lit(1.0d) - nPunct / nChars) * 0.3d
        + least(nChars / nTok / 10.0d, lit(1.0d)) * 0.2d).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("token counts are positive and ws <= chars") {
    val counts = TextAnalysis.taTokenCount(spark, sf).collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      assert(r.getAs[Int]("n_ws_tokens") > 0)
      assert(r.getAs[Int]("n_ws_tokens") <= r.getAs[Int]("n_chars_computed"))
    }
  }

  test("redaction scrubs planted emails and URLs, leaves prose intact") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq(
      "contact alice.smith+spam@example.co.uk for details",
      "see https://example.com/a?b=c&d=e and http://x.io/p",
      "plain text with no pii at all",
      "mixed: bob@test.org then https://y.z/path end").toDF("text")
    val out = docs.select(TextAnalysis.redacted(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) === "contact <EMAIL> for details")
    assert(out(1) === "see <URL> and <URL>")
    assert(out(2) === "plain text with no pii at all")
    assert(out(3) === "mixed: <EMAIL> then <URL> end")
  }

  test("vocabulary builder: document frequency, deterministic ties") {
    val v = TextAnalysis.taVocab(spark, sf, k = 20).collect()
    assert(v.length === 20)
    val freqs = v.map(_.getLong(1))
    assert(freqs.toSeq === freqs.sorted(Ordering[Long].reverse).toSeq)
    // doc frequency can never exceed the corpus size
    val n = Tables.documents(spark, sf).count()
    assert(freqs.forall(_ <= n))
  }

  test("fingerprint shards spread across buckets") {
    val shards = TextAnalysis.taFingerprint(spark, sf)
      .select("shard").distinct().count()
    assert(shards > 10, s"expected spread across 64 buckets, got $shards")
  }

  test("rare bigrams: matches a naive string-bigram recomputation") {
    val got = TextAnalysis.taRareBigrams(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_rare")))
      .toMap
    // naive reference: string bigrams, corpus frequency, rare = freq 1
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val grams = texts.map { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      id -> toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }.toSeq
    }
    val freq = grams.flatMap(_._2).groupBy(identity).map {
      case (g, occ) => g -> occ.length
    }
    grams.filter(_._2.nonEmpty).foreach { case (id, gs) =>
      val (nGrams, nRare) = got(id)
      assert(nGrams === gs.length, s"doc $id gram count")
      assert(nRare === gs.count(freq(_) == 1).toLong, s"doc $id rare count")
    }
    assert(got.values.forall { case (n, r) => r <= n })
  }

  test("char gini: matches a naive per-character recomputation") {
    val got = TextAnalysis.taCharGini(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("gini"))).toMap
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    texts.filter(_._2.nonEmpty).foreach { case (id, t) =>
      // count by code point string as substring(…, i, 1) does
      val counts = t.map(_.toString).groupBy(identity).map(_._2.length)
      val n = counts.sum.toLong
      val ss = counts.map(c => c.toLong * c).sum
      val (gn, gd, gg) = got(id)
      assert(gn === n, s"doc $id char count")
      assert(gd === counts.size.toLong, s"doc $id distinct chars")
      assert(gg === (n * n - ss).toDouble / (n * n).toDouble,
        s"doc $id gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
  }

  test("oov rate: matches a driver-side top-k vocabulary recompute") {
    val rows = TextAnalysis.tcOovRate(spark, sf, k = 50).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf).select("source", "text")
      .collect().flatMap { r =>
        r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)
          .map(r.getAs[String]("source") -> _)
      }
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(50).map(_._1).toSet
    val bySource = toks.groupBy(_._1)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val ts = bySource(s).map(_._2)
      assert(r.getAs[Long]("n_tokens") === ts.length.toLong)
      assert(r.getAs[Long]("n_oov") ===
        ts.count(t => !vocab.contains(t)).toLong, s"source $s")
    }
  }

  test("tf-idf: scores recompute exactly; top term per doc is the arg-max") {
    val got = TextAnalysis.taTfidf(spark, sf).collect()
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val n = texts.length
    val tf: Map[(Long, String), Long] = texts.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).groupBy(identity)
        .map { case (tok, occ) => (id, tok) -> occ.length.toLong }
    }.toMap
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (t, ks) => t -> ks.size.toLong }
    def score(id: Long, term: String): Double =
      (tf((id, term)) * (n + 1)).toDouble / (df(term) + 1).toDouble
    got.foreach { r =>
      val (id, term) = (r.getAs[Long]("doc_id"), r.getAs[String]("term"))
      assert(r.getAs[Long]("tf") === tf((id, term)))
      assert(r.getAs[Long]("df") === df(term))
      assert(r.getAs[Double]("score") === score(id, term))
    }
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq ===
        (1 to rs.length).toSeq)
      val maxScore = tf.keys.filter(_._1 == id)
        .map { case (_, t) => score(id, t) }.max
      assert(rs.minBy(_.getAs[Int]("rnk")).getAs[Double]("score")
        === maxScore, s"doc $id top term is not the arg-max")
    }
  }
  test("gopher battery: each rule trips on its crafted violator") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.col
    val good = (Seq.fill(12)("the flux and port with that grid have") :+
      "be of it").mkString(" ")                  // 97 words, all rules pass
    val docs = Seq(
      (1L, good),
      (2L, "the and of short"),                           // word count < 50
      (3L, Seq.fill(60)("a").mkString(" ") + " the of be"), // mean len < 3
      (4L, good + " " + Seq.fill(15)("#").mkString(" ")),   // symbol ratio
      (5L, (1 to 10).map(i => s"- item $i the of be and with have that more pad words here now").mkString("\n")), // all bullets
      (6L, (1 to 10).map(_ => "the of be and trailing words something...").mkString("\n")), // ellipsis lines
      (7L, good + " " + Seq.fill(40)("123").mkString(" ")), // alpha < 80%
      (8L, Seq.fill(60)("zork gleep") .mkString(" "))       // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherBattery(docs, stopFloor = 2)
      .orderBy("doc_id").collect()
    def flags(i: Int) = (out(i).getAs[Boolean]("r_word_count"),
      out(i).getAs[Boolean]("r_word_len"), out(i).getAs[Boolean]("r_symbol"),
      out(i).getAs[Boolean]("r_bullet"), out(i).getAs[Boolean]("r_ellipsis"),
      out(i).getAs[Boolean]("r_alpha"), out(i).getAs[Boolean]("r_stop"),
      out(i).getAs[Boolean]("pass_gopher"))
    assert(flags(0) === ((true, true, true, true, true, true, true, true)))
    assert(!out(1).getAs[Boolean]("r_word_count"))
    assert(!out(2).getAs[Boolean]("r_word_len"))
    assert(!out(3).getAs[Boolean]("r_symbol"))
    assert(!out(4).getAs[Boolean]("r_bullet"))
    assert(!out(5).getAs[Boolean]("r_ellipsis"))
    assert(!out(6).getAs[Boolean]("r_alpha"))
    assert(!out(7).getAs[Boolean]("r_stop"))
    assert(out.drop(1).forall(r => !r.getAs[Boolean]("pass_gopher")))
  }

  test("gopher battery is a narrow no-shuffle projection") {
    val df = TextAnalysis.taGopherFilters(spark, sf, stopFloor = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"battery should not shuffle:\n$plan")
    assert(df.count() > 0)
  }

  test("single-column battery verdicts stay in lockstep with the " +
    "batteries (gopherPassCol / repetitionPassFromStats)") {
    val docs = Tables.documents(spark, sf)
    // gopher: the expression verdict must equal the battery's flag
    // row-for-row, at both stop floors
    Seq(1, 2).foreach { floor =>
      val battery = TextAnalysis.gopherBattery(docs, floor)
        .select(col("doc_id"), col("pass_gopher"))
      val expr = docs.select(col("doc_id"),
        TextAnalysis.gopherPassCol(col("text"), floor).as("p"))
      val diverged = battery.join(expr, "doc_id")
        .filter(col("pass_gopher") =!= col("p")).count()
      assert(diverged === 0L, s"gopher verdict diverged at floor $floor")
    }
    val battery = TextAnalysis.repetitionBattery(docs)
      .select(col("doc_id"), col("pass_repetition"))
    val expr = docs.select(col("doc_id"),
      TextAnalysis.repetitionPassFromStats(
        graft.functions.RepetitionFunctions.repetition_stats(col("text")))
        .as("p"))
    val diverged = battery.join(expr, "doc_id")
      .filter(col("pass_repetition") =!= col("p")).count()
    assert(diverged === 0L, "repetition verdict diverged")
  }

}
