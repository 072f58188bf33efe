package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared static kernel for Unicode normalization, directly linkable
  * from generated Java (the [[ShingleRuntime]] pattern — the expression
  * stays inside whole-stage codegen).
  */
object NormalizeRuntime {
  private val NFC = java.text.Normalizer.Form.NFC
  private val NFD = java.text.Normalizer.Form.NFD

  /** NFC-normalize. Two fast paths make this parquet-scan-speed on the
    * real distribution: (1) pure-ASCII input is NFC by definition — one
    * branchy byte scan (SIMD-friendly `& 0x80` test) returns the input
    * UTF8String by reference, no String round-trip; a web corpus is
    * overwhelmingly ASCII, so the normalizer almost never runs.
    * (2) non-ASCII input that is already composed (`isNormalized`, the
    * JDK's quick-check pass) also returns by reference. Only rows that
    * actually change pay the String decode + compose + re-encode.
    */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && (bytes(i) & 0x80) == 0) i += 1
    if (i == bytes.length) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }

  /** Accent folding: NFD-decompose, drop combining marks (category
    * Mn), recompose to NFC. The final NFC pass is what makes this
    * byte-equal to utf8proc's `strip_accents` (the DuckDB oracle) on
    * scripts whose decomposition is not mark-based — Hangul NFD yields
    * conjoining jamo that must re-compose to the syllable, while the
    * jamo themselves are untouched (they are Lo, not Mn). Diacritics
    * fold (é→e, ñ→n, combining sequences likewise); atomic letters
    * without a decomposition (ø, ł) survive — accent folding is NOT
    * transliteration. Same ASCII fast path as [[nfc]]: the 100 TB
    * bulk pays one byte scan and returns by reference.
    */
  def foldAccents(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && (bytes(i) & 0x80) == 0) i += 1
    if (i == bytes.length) return s
    val nfd = java.text.Normalizer.normalize(s.toString, NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    var dropped = false
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) == Character.NON_SPACING_MARK)
        dropped = true
      else sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    val out = java.text.Normalizer.normalize(sb.toString, NFC)
    if (!dropped && out == s.toString) s
    else UTF8String.fromString(out)
  }
}

/** Unicode NFC normalization as a native Catalyst expression — the
  * first step of any text-curation pipeline (canonically-equivalent
  * byte sequences must collapse BEFORE hashing, deduplication, or
  * tokenization, or `é` and `é` count as different
  * documents). A Scala UDF here would box every row on the 100 TB
  * ingest scan; this stays in whole-stage codegen and the
  * [[NormalizeRuntime]] ASCII fast path skips the JDK normalizer for
  * the bulk of the corpus.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeRuntime.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeRuntime.nfc($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `accent_fold(str)` — diacritic removal (NFD → strip Mn → NFC) as a
  * codegen'd Catalyst expression: the dedup-key normalizer that makes
  * `café`, `café` (decomposed) and `cafe` collide BEFORE hashing.
  */
case class AccentFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"

  override def nullSafeEval(input: Any): Any =
    NormalizeRuntime.foldAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeRuntime.foldAccents($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NormalizeFunctions {
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def accent_fold(c: Column): Column =
    ColumnBridge.column(AccentFold(ColumnBridge.expression(c)))
}
