package graft

import graft.functions.{RepetitionRuntime, TextAnalysis}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher repetition battery (`ta_gopher_repetition`): hand-computed
  * fixtures per statistic, crafted rule violators, edge cases, and
  * equality with an independent plain-Scala reference on randomized
  * repetitive documents. */
class RepetitionSpec extends SparkSpec {

  private def stats(text: String): Map[String, Long] = {
    val row = RepetitionRuntime.repetitionStats(UTF8String.fromString(text))
    RepetitionRuntime.FieldNames.zipWithIndex
      .map { case (f, i) => f -> row.getLong(i) }.toMap
  }

  test("line stats: duplicate line instances and their chars") {
    val s = stats("a b c\nx\na b c\ny")
    assert(s("n_lines") === 4L)
    assert(s("dup_lines") === 2L)      // both instances of "a b c"
    assert(s("line_chars") === 12L)    // 5 + 1 + 5 + 1
    assert(s("dup_line_chars") === 10L)
  }

  test("top 2-gram: count ties break to the lexicographically smallest") {
    // 2-grams: "a b" x2, "b a" x2, "a c" x1 -> tie, "a b" wins
    val s = stats("a b a b a c")
    assert(s("word_chars") === 6L)
    assert(s("top2_chars") === 4L) // 2 occurrences x 2 token chars
  }

  test("top 3-gram counts char mass of the most frequent gram") {
    // tokens: ab cd ab cd ab -> 3-grams: "ab cd ab" x2, "cd ab cd" x1
    val s = stats("ab cd ab cd ab")
    assert(s("top3_chars") === 12L) // 2 x (2+2+2)
  }

  test("dup 5-gram coverage: union of covered positions, no double count") {
    // 11 tokens; "p q r s t" occurs at 0 and 6 -> covers 0-4 and 6-10
    val s = stats("p q r s t u p q r s t")
    assert(s("word_chars") === 11L)
    assert(s("dup5_chars") === 10L)
    // overlapping dup grams must not double-count: all-same-token doc
    val u = stats(Seq.fill(12)("z").mkString(" "))
    assert(u("dup5_chars") === 12L) // every position covered once
    assert(u("dup10_chars") === 12L)
  }

  test("docs shorter than n have zero gram stats") {
    val s = stats("only three tokens")
    assert(s("top4_chars") === 0L)
    RepetitionRuntime.DupNs.foreach(n => assert(s(s"dup${n}_chars") === 0L))
    // 2-grams tie at count 1 -> smallest is "only three": 1 x (4+5)
    assert(s("top2_chars") === 9L)
  }

  test("empty and whitespace-only text") {
    val e = stats("")
    assert(e("n_lines") === 1L && e("line_chars") === 0L)
    assert(e("word_chars") === 0L)
    val w = stats("   ")
    assert(w("word_chars") === 0L)
    RepetitionRuntime.TopNs.foreach { n =>
      assert(w(s"top${n}_chars") === 0L || w(s"top${n}_chars") >= 0L)
    }
  }

  test("battery flags: crafted violators trip exactly their rule") {
    val sparkS = spark
    import sparkS.implicits._
    val clean = (1 to 30).map(i => s"w$i x$i y$i z$i").mkString("\n")
    val docs = Seq(
      (1L, clean),
      // >30% duplicate lines
      (2L, (Seq.fill(5)("same line here") ++
        (1 to 6).map(i => s"uniq $i")).mkString("\n")),
      // top 2-gram mass > 20%
      (3L, Seq.fill(20)("heavy pair").mkString(" ") + " " +
        (1 to 10).map(i => s"u$i").mkString(" ")),
      // duplicated 10-gram coverage > 10%
      (4L, {
        val gram = (1 to 10).map(i => s"g$i").mkString(" ")
        gram + " " + gram + " " + (1 to 50).map(i => s"f$i").mkString(" ")
      })
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionBattery(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("pass_repetition"))
    assert(!out(1).getAs[Boolean]("r_dup_line"))
    assert(!out(2).getAs[Boolean]("r_top2"))
    assert(!out(3).getAs[Boolean]("r_dup10"))
    assert(out.drop(1).forall(r => !r.getAs[Boolean]("pass_repetition")))
  }

  // ── independent plain-Scala reference ────────────────────────────
  private def refStats(text: String): Map[String, Long] = {
    val lines = text.split("\n", -1).toSeq
    val lineCounts = lines.groupBy(identity).view.mapValues(_.size).toMap
    val dupLineInst = lines.filter(l => lineCounts(l) >= 2)
    val toks = text.split("\\s+", -1).toSeq
    def grams(n: Int): Seq[String] =
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    def topChars(n: Int): Long = {
      val g = grams(n)
      if (g.isEmpty) 0L
      else {
        val counts = g.groupBy(identity).view.mapValues(_.size).toMap
        val best = counts.toSeq.minBy { case (s, c) => (-c, s) }
        best._2.toLong * (best._1.length - (n - 1))
      }
    }
    def dupCov(n: Int): Long = {
      val g = grams(n)
      if (g.isEmpty) 0L
      else {
        val counts = g.groupBy(identity).view.mapValues(_.size).toMap
        val covered = scala.collection.mutable.Set.empty[Int]
        g.zipWithIndex.foreach { case (gr, i) =>
          if (counts(gr) >= 2) (i until i + n).foreach(covered += _)
        }
        covered.toSeq.map(toks(_).length.toLong).sum
      }
    }
    Map(
      "n_lines" -> lines.size.toLong,
      "dup_lines" -> dupLineInst.size.toLong,
      "line_chars" -> lines.map(_.length.toLong).sum,
      "dup_line_chars" -> dupLineInst.map(_.length.toLong).sum,
      "word_chars" -> toks.map(_.length.toLong).sum) ++
      RepetitionRuntime.TopNs.map(n => s"top${n}_chars" -> topChars(n)) ++
      RepetitionRuntime.DupNs.map(n => s"dup${n}_chars" -> dupCov(n))
  }

  test("property: kernel equals the plain-Scala reference on random docs") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("a", "bb", "ccc", "dd", "e", "fff", "gh")
    (1 to 60).foreach { _ =>
      val nTok = 1 + rnd.nextInt(80)
      // repetitive by construction: small vocab + occasional block copy
      val base = Seq.fill(nTok)(vocab(rnd.nextInt(vocab.length)))
      val withBlock =
        if (nTok > 12 && rnd.nextBoolean()) {
          val s = rnd.nextInt(nTok - 11)
          base ++ base.slice(s, s + 11)
        } else base
      val sep = () => if (rnd.nextInt(5) == 0) "\n" else " "
      val text = withBlock.map(t => t + sep()).mkString.trim
      assert(stats(text) === refStats(text), s"text=<$text>")
    }
  }

  test("ql_lm_buckets: tiles are per-language, ordered, and keep head+middle") {
    val out = functions.LangModel.qlLmBuckets(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_.getAs[Long]("bucket"))
      // tile sizes differ by at most 1
      val sizes = byBucket.values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"lang=$lang sizes=$sizes")
      // monotone: min mean_p of bucket b >= max mean_p of bucket b+1
      val sorted = byBucket.toSeq.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((_, hi), (_, lo)) =>
          assert(hi.map(_.getAs[Double]("mean_p")).min >=
            lo.map(_.getAs[Double]("mean_p")).max - 1e-15)
        case _ =>
      }
    }
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("bucket") <= 2L))
      val lbl = r.getAs[Long]("bucket") match {
        case 1L => "head"; case 2L => "middle"; case _ => "tail"
      }
      assert(r.getAs[String]("bucket_label") === lbl)
    }
  }
}
