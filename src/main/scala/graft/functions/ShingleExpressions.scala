package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

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
  */
case class BigramShingleHashes(child: Expression, base: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_shingle_hashes"

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // token spans [start, end), including empty edge tokens à la
    // split("\s+", -1)
    val starts = new mutable.ArrayBuffer[Int](32)
    val ends = new mutable.ArrayBuffer[Int](32)
    var i = 0
    var tokStart = 0
    while (i <= n) {
      if (i == n || isWs(bytes(i))) {
        starts += tokStart; ends += i
        // skip the whitespace run
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    val k = starts.length
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

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Single-pass word n-gram hasher (the decontamination primitive):
  * text → rolling hash of every n consecutive tokens joined by a
  * single space, duplicates preserved in position order. One scan over
  * the UTF-8 bytes, no token or n-gram strings materialized — replaces
  * an interpreted split+slice+join+hash HOF chain that was the
  * slowest stage of the dc_decontamination bench query. Tokens are
  * `split("\\s+", -1)` segments like [[BigramShingleHashes]]. */
case class NgramHashes(child: Expression, n: Int, base: Long)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n-gram width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    val starts = new mutable.ArrayBuffer[Int](32)
    val ends = new mutable.ArrayBuffer[Int](32)
    var i = 0
    var tokStart = 0
    while (i <= len) {
      if (i == len || isWs(bytes(i))) {
        starts += tokStart; ends += i
        i += 1
        while (i < len && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    val k = starts.length
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
