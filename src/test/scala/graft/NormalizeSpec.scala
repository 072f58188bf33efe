package graft

import graft.functions.{NormalizeFunctions, NormalizeRuntime, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NFC normalization expression + the ta_normalize cleanup query. */
class NormalizeSpec extends SparkSpec {

  test("kernel: composes combining sequences, identity on NFC input") {
    // decomposed → precomposed (Latin and Hangul composition)
    assert(NormalizeRuntime.nfc(UTF8String.fromString("e\u0301")).toString
      === "\u00e9")
    assert(NormalizeRuntime.nfc(UTF8String.fromString("o\u0308")).toString
      === "\u00f6")
    assert(NormalizeRuntime.nfc(UTF8String.fromString("\u1100\u1161"))
      .toString === "\uac00")
    // ASCII fast path and already-composed input return the SAME object
    // (no re-encode): the 100 TB bulk pays one byte scan, nothing else
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NormalizeRuntime.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("caf\u00e9 \uac00")
    assert(NormalizeRuntime.nfc(composed) eq composed)
    // ZWSP survives NFC (it is the query's regexp strip, not the
    // normalizer, that removes it)
    assert(NormalizeRuntime.nfc(UTF8String.fromString("a\u200bb"))
      .toString === "a\u200bb")
  }

  test("expression: null-safe, fused into whole-stage codegen") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(Some("e\u0301clair"), None, Some("abc"))
      .toDF("s")
      .select(NormalizeFunctions.nfc_normalize(col("s")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "\u00e9clair")
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) === "abc")
    // codegen check needs a non-foldable source (a local Seq collapses
    // to LocalTableScan at optimization time): use the parquet scan
    val scan = Tables.documents(spark, sf)
      .select(NormalizeFunctions.nfc_normalize(col("text")).as("n"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_normalize"),
      s"expected nfc_normalize fused into codegen:\n$plan")
  }

  test("accent-fold kernel: folds marks, keeps atomics, recomposes") {
    import graft.functions.NormalizeRuntime.foldAccents
    def f(s: String) =
      foldAccents(UTF8String.fromString(s)).toString
    assert(f("caf\u00e9") === "cafe") // composed
    assert(f("cafe\u0301") === "cafe") // decomposed e + acute
    assert(f("ni\u00f1o") === "nino")
    assert(f("stra\u0301\u0301ca") === "straca") // stacked marks
    // atomic letters without decompositions survive — not transliteration
    assert(f("\u00f8l") === "\u00f8l")
    assert(f("\u0142an") === "\u0142an")
    // Hangul: NFD jamo must RE-compose (utf8proc parity)
    assert(f("\uac00") === "\uac00")
    // ASCII fast path returns the same object
    val ascii = UTF8String.fromString("plain")
    assert(foldAccents(ascii) eq ascii)
  }

  test("ta_accent_fold: injected diacritics fold back to the original") {
    val out = TextAnalysis.taAccentFold(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dirtyN = r.getAs[Int]("n_chars_dirty")
      val foldN = r.getAs[Int]("n_chars_fold")
      val restored = r.getAs[Boolean]("restored")
      assert(foldN <= dirtyN, s"doc $id fold cannot grow")
      // é/á injections fold back; ø docs may keep the atomic letter
      if (id % 7 != 0)
        assert(restored, s"doc $id should fold back to the original")
      assert(!r.getAs[String]("text_fold").exists(_ == '\u0301'),
        s"doc $id still carries a combining mark")
    }
    // the ø branch is exercised and detectably NOT restored
    assert(out.exists(r =>
      r.getAs[Long]("doc_id") % 7 == 0 && !r.getAs[Boolean]("restored")))
  }

  test("ta_normalize: composition round-trips the injected dirt") {
    val out = TextAnalysis.taNormalize(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"),
        col("text"), length(col("text")).as("n_orig"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "a", ""))).as("n_a"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", ""))).as("n_sp")),
        "doc_id")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nOrig = r.getAs[Int]("n_orig")
      val nA = r.getAs[Int]("n_a"); val nSp = r.getAs[Int]("n_sp")
      // the combining accents compose away and the ZWSPs strip away:
      // normalized char count equals the original, always
      assert(r.getAs[Int]("n_chars_norm") === nOrig, s"doc $id norm len")
      val expDirty = nOrig + (if (id % 3 == 0) nA else 0) +
        (if (id % 5 == 0) nSp else 0)
      assert(r.getAs[Int]("n_chars_dirty") === expDirty, s"doc $id dirty")
      // only the accent injection survives normalization as a change
      assert(r.getAs[Boolean]("changed") === (id % 3 == 0 && nA > 0),
        s"doc $id changed flag")
      if (id % 3 != 0)
        assert(r.getAs[String]("text_norm") === r.getAs[String]("text"))
      else
        assert(r.getAs[String]("text_norm") ===
          r.getAs[String]("text").replace("a", "\u00e1"))
    }
  }
}
