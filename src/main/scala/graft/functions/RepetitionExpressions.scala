package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics — the Gopher repetition-removal
  * rules (Rae et al. 2021, appendix A1.1: duplicate line / most-common
  * n-gram / duplicated n-gram filters) computed per document in ONE
  * scan, emitting exact INTEGER numerators and denominators so the
  * downstream fractions are each a single correctly-rounded IEEE
  * division and the pass/fail flags are integer cross-multiplications
  * — both bit-identical across engines, hence hash-comparable against
  * a SQL oracle.
  *
  * Definitions (engine-neutral, verified in `RepetitionSpec`):
  *  - lines = the document split on `\n`; a line INSTANCE is a
  *    duplicate iff its exact string occurs >= 2 times in the doc.
  *    `dup_lines` counts all such instances, `dup_line_chars` their
  *    summed code-point lengths.
  *  - tokens = `split("\\s+", -1)` segments (the corpus-wide contract
  *    shared with [[ShingleRuntime]]); `word_chars` = summed token
  *    code-point lengths.
  *  - the TOP n-gram (n = 2,3,4) is the most frequent word n-gram,
  *    ties broken by lexicographically SMALLEST space-joined gram
  *    (binary compare — equals SQL `ORDER BY cnt DESC, gram ASC`);
  *    `top{n}_chars` = count * (joined-gram code points - (n-1)),
  *    i.e. count x summed token lengths.
  *  - `dup{n}_chars` (n = 5..10) = summed code-point lengths of token
  *    POSITIONS covered by at least one occurrence of an n-gram that
  *    occurs >= 2 times (coverage union, no double counting).
  *
  * Why per-doc and zero-shuffle: every statistic is a function of one
  * document alone, so the whole battery is an embarrassingly-parallel
  * projection — at 100 TB it runs as a map-only scan with NO shuffle,
  * NO grams table, and per-row memory bounded by document size (the
  * gram count map holds <= T strings of <= n tokens). The alternative
  * (explode grams + groupBy(doc_id, gram)) shuffles ~n x corpus-token
  * rows; this kernel shuffles nothing.
  *
  * Gram/line counting keys on the exact STRING (not a hash), so there
  * is no collision caveat: counts match the oracle's GROUP BY exactly.
  */
object RepetitionRuntime {

  val TopNs: Array[Int] = Array(2, 3, 4)
  val DupNs: Array[Int] = Array(5, 6, 7, 8, 9, 10)

  /** Field layout of the emitted struct (all LongType). */
  val FieldNames: Array[String] =
    Array("n_lines", "dup_lines", "line_chars", "dup_line_chars",
      "word_chars") ++
      TopNs.map(n => s"top${n}_chars") ++
      DupNs.map(n => s"dup${n}_chars")

  val Schema: StructType =
    StructType(FieldNames.map(f => StructField(f, LongType, nullable = false)))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Code points in bytes[from, until): count non-continuation bytes —
    * equals SQL `length()` for valid UTF-8, and byte count on ASCII. */
  @inline private def charLen(bytes: Array[Byte], from: Int, until: Int): Long = {
    var c = 0L
    var i = from
    while (i < until) { if ((bytes(i) & 0xc0) != 0x80) c += 1; i += 1 }
    c
  }

  def repetitionStats(input: UTF8String): InternalRow = {
    val bytes = input.getBytes
    val n = bytes.length
    val out = new Array[Any](FieldNames.length)

    // ---- line stats: split on '\n', count exact-string occurrences.
    {
      val counts = new java.util.HashMap[String, Array[Long]]()
      var nLines = 0L
      var lineChars = 0L
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || bytes(i) == '\n') {
          val s = new String(bytes, start, i - start,
            java.nio.charset.StandardCharsets.UTF_8)
          val len = charLen(bytes, start, i)
          val e = counts.get(s)
          if (e == null) counts.put(s, Array(1L, len)) else e(0) += 1
          nLines += 1
          lineChars += len
          start = i + 1
        }
        i += 1
      }
      var dupLines = 0L
      var dupLineChars = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(0) >= 2) { dupLines += e(0); dupLineChars += e(0) * e(1) }
      }
      out(0) = nLines; out(1) = dupLines; out(2) = lineChars
      out(3) = dupLineChars
    }

    // ---- token spans (split("\s+", -1) incl. empty edge tokens).
    var cap = 32
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var t = 0
    locally {
      var i = 0
      var tokStart = 0
      while (i <= n) {
        if (i == n || isWs(bytes(i))) {
          if (t == cap) {
            cap *= 2
            starts = java.util.Arrays.copyOf(starts, cap)
            ends = java.util.Arrays.copyOf(ends, cap)
          }
          starts(t) = tokStart; ends(t) = i; t += 1
          i += 1
          while (i < n && isWs(bytes(i))) i += 1
          tokStart = i
        } else i += 1
      }
    }
    val tokLen = new Array[Long](t)
    var wordChars = 0L
    locally {
      var j = 0
      while (j < t) {
        tokLen(j) = charLen(bytes, starts(j), ends(j))
        wordChars += tokLen(j)
        j += 1
      }
    }
    out(4) = wordChars

    // joined gram string for tokens [j, j+gn)
    def gramAt(j: Int, gn: Int): String = {
      val sb = new java.lang.StringBuilder()
      var w = 0
      while (w < gn) {
        if (w > 0) sb.append(' ')
        sb.append(new String(bytes, starts(j + w), ends(j + w) - starts(j + w),
          java.nio.charset.StandardCharsets.UTF_8))
        w += 1
      }
      sb.toString
    }

    // ---- top n-gram char mass (n = 2, 3, 4)
    var fi = 5
    var ni = 0
    while (ni < TopNs.length) {
      val gn = TopNs(ni)
      val m = t - gn + 1
      if (m <= 0) out(fi) = 0L
      else {
        // count -> per-gram [count, charWeight]; key = exact string
        val counts = new java.util.HashMap[String, Array[Long]](m * 2)
        var j = 0
        while (j < m) {
          val g = gramAt(j, gn)
          val e = counts.get(g)
          if (e == null) {
            var w = 0L
            var q = 0
            while (q < gn) { w += tokLen(j + q); q += 1 }
            counts.put(g, Array(1L, w))
          } else e(0) += 1
          j += 1
        }
        var bestCount = -1L
        var bestChars = 0L
        var bestGram: String = null
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue()(0)
          if (c > bestCount ||
            (c == bestCount && e.getKey.compareTo(bestGram) < 0)) {
            bestCount = c
            bestGram = e.getKey
            bestChars = c * e.getValue()(1)
          }
        }
        out(fi) = bestChars
      }
      fi += 1
      ni += 1
    }

    // ---- duplicated n-gram coverage (n = 5..10)
    ni = 0
    while (ni < DupNs.length) {
      val gn = DupNs(ni)
      val m = t - gn + 1
      if (m <= 0) out(fi) = 0L
      else {
        val counts = new java.util.HashMap[String, Array[Long]](m * 2)
        val grams = new Array[String](m)
        var j = 0
        while (j < m) {
          val g = gramAt(j, gn)
          grams(j) = g
          val e = counts.get(g)
          if (e == null) counts.put(g, Array(1L)) else e(0) += 1
          j += 1
        }
        val covered = new Array[Boolean](t)
        j = 0
        while (j < m) {
          if (counts.get(grams(j))(0) >= 2) {
            var q = j
            val lim = j + gn
            while (q < lim) { covered(q) = true; q += 1 }
          }
          j += 1
        }
        var cov = 0L
        j = 0
        while (j < t) { if (covered(j)) cov += tokLen(j); j += 1 }
        out(fi) = cov
      }
      fi += 1
      ni += 1
    }

    new GenericInternalRow(out)
  }
}

/** text -> struct of 14 exact integer repetition statistics (see
  * [[RepetitionRuntime]]). Codegen emits one static kernel call, so
  * the projection stays inside whole-stage codegen. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionRuntime.Schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionRuntime.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionRuntime" +
        s".repetitionStats($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RepetitionFunctions {
  def repetition_stats(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}
