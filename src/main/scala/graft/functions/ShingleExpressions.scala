package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass shingle/n-gram hashing over raw UTF-8 bytes —
  * the imperative kernels both the interpreted `eval` path and the
  * generated code call (a top-level object gets static forwarders, so
  * `graft.functions.ShingleRuntime.x(...)` is directly linkable from
  * janino-compiled code). Keeping one kernel guarantees the two paths
  * cannot diverge.
  */
object ShingleRuntime {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Token spans as a packed (starts, ends, count) — `split("\s+", -1)`
    * segments including empty edge tokens. */
  private def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var cap = 32
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var k = 0
    var i = 0
    var tokStart = 0
    while (i <= n) {
      if (i == n || isWs(bytes(i))) {
        if (k == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(k) = tokStart; ends(k) = i; k += 1
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    (starts, ends, k)
  }

  /** Distinct rolling hashes of every adjacent token pair (first
    * occurrence order — matches `array_distinct`). */
  def bigramShingleHashes(input: UTF8String, base: Long): ArrayData = {
    val bytes = input.getBytes
    val (starts, ends, k) = tokenSpans(bytes)
    if (k < 2) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long](k * 2)
    var t = 0
    while (t < k - 1) {
      var h = 0L
      var j = starts(t)
      while (j < ends(t)) { h = h * base + (bytes(j) & 0xff); j += 1 }
      h = h * base + 0x20 // the joining space
      j = starts(t + 1)
      while (j < ends(t + 1)) { h = h * base + (bytes(j) & 0xff); j += 1 }
      seen.add(h)
      t += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Rolling hash of every n consecutive tokens joined by one space,
    * duplicates preserved in position order. */
  def ngramHashes(input: UTF8String, n: Int, base: Long): ArrayData = {
    val bytes = input.getBytes
    val (starts, ends, k) = tokenSpans(bytes)
    if (k < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](k - n + 1)
    var t = 0
    while (t <= k - n) {
      var h = 0L
      var w = 0
      while (w < n) {
        var j = starts(t + w)
        while (j < ends(t + w)) { h = h * base + (bytes(j) & 0xff); j += 1 }
        if (w < n - 1) h = h * base + 0x20 // the joining space
        w += 1
      }
      out(t) = h
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Single-pass word-bigram shingle hasher: text → distinct rolling
  * hashes of every adjacent token pair, in one scan over the UTF-8
  * bytes. Replaces the regex-split + per-bigram-concat + per-bigram-
  * hash pipeline on the dedup hot path (no intermediate token/bigram
  * strings are materialized at all).
  *
  * Semantics contract (verified against the compositional formulation
  * in `ShingleExpressionsSpec`): tokens are exactly Java
  * `split("\\s+", -1)` segments — `\s` = the six ASCII whitespace
  * chars, leading/trailing separators produce empty edge tokens — and
  * each shingle hash equals `RollingHash(tok_i + " " + tok_{i+1})`.
  * ASCII scanning is UTF-8-safe: multi-byte sequences never contain
  * ASCII bytes. Distinctness preserves first occurrence, matching
  * `array_distinct`.
  *
  * Codegen: emits a call to the [[ShingleRuntime]] kernel, so the
  * expression stays inside whole-stage codegen (no interpreted-
  * projection fallback splitting the dedup scan stage).
  */
case class BigramShingleHashes(child: Expression, base: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleRuntime.bigramShingleHashes(
      input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleRuntime" +
        s".bigramShingleHashes($c, ${base}L);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Single-pass word n-gram hasher (the decontamination primitive):
  * text → rolling hash of every n consecutive tokens joined by a
  * single space, duplicates preserved in position order. One scan over
  * the UTF-8 bytes, no token or n-gram strings materialized — replaces
  * an interpreted split+slice+join+hash HOF chain that was the
  * slowest stage of the dc_decontamination bench query. Tokens are
  * `split("\\s+", -1)` segments like [[BigramShingleHashes]]; codegen
  * calls the shared [[ShingleRuntime]] kernel. */
case class NgramHashes(child: Expression, n: Int, base: Long)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleRuntime.ngramHashes(input.asInstanceOf[UTF8String], n, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleRuntime" +
        s".ngramHashes($c, $n, ${base}L);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleFunctions {
  def bigram_shingle_hashes(c: Column,
      base: Long = HashFunctions.DefaultBase): Column =
    ColumnBridge.column(
      BigramShingleHashes(ColumnBridge.expression(c), base))

  def ngram_hashes(c: Column, n: Int,
      base: Long = HashFunctions.DefaultBase): Column =
    ColumnBridge.column(
      NgramHashes(ColumnBridge.expression(c), n, base))
}
