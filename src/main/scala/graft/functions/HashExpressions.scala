package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Karp–Rabin) over a string's UTF-8 bytes —
  * the document-fingerprinting primitive (also the shingle hash for
  * MinHash dedup). Implemented as a native Catalyst expression WITH
  * `doGenCode`, so it stays inside whole-stage codegen on the 100 TB
  * hot path (a Scala UDF here would box every row and break the
  * pipeline into iterator calls).
  *
  * h = Σ byte_i · base^(n-1-i) in Long arithmetic (overflow wraps —
  * deterministic on every JVM).
  */
case class RollingHash(child: Expression, base: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash packed from an array of token hashes: bit j is set
  * iff tokens with bit j set are a (weak) majority — `2·count_j ≥ n`.
  *
  * Replaces a 64-pass higher-order `aggregate(sequence(0,63), filter…)`
  * pipeline: HOF lambdas are interpreted per element, which benched at
  * ~3 ms/doc at sf0.1; this is one generated Java loop (~µs/doc).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (2 * counts(j) >= n) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $counts[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if (2 * $counts[$j] >= $n) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature in one pass: slot i holds
  * `min over h of ((h mod P) · a_i + b_i) mod P` (pmod semantics, same
  * values as the higher-order formulation it replaces — prime < 2^31
  * and a_i < 2^23 keep the product ANSI-safe).
  */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long],
    prime: Long) extends UnaryExpression {
  require(as.length == bs.length)
  private val k = as.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // eval returns null for EMPTY input arrays even when the child is
  // non-nullable; without this override the default (child.nullable)
  // would claim non-nullable, making codegen emit an assignment to a
  // constant-false isNull and letting NullPropagation erase the
  // IsNotNull guard that keeps degenerate docs out of LSH bands
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val hm = ((h % prime) + prime) % prime
      var s = 0
      while (s < k) {
        val v = (hm * as(s) + bs(s)) % prime // operands positive → % = pmod
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bArr = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    long $hm = (($h % ${prime}L) + ${prime}L) % ${prime}L;
         |    for (int $s = 0; $s < $k; $s++) {
         |      long $v = ($hm * $aArr[$s] + $bArr[$s]) % ${prime}L;
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Count of common elements between two SORTED-ASCENDING arrays of
  * distinct longs — the verification kernel of the exact-similarity
  * joins (|A ∩ B| for Jaccard). One linear merge scan per row: no
  * per-row hash set, no intermediate result array — replaces
  * `size(array_intersect(a, b))`, which builds an OpenHashSet AND a
  * result array per candidate pair and measured 1.3 s of a 2.6 s
  * query at sf0.1 on 358k candidates. Callers own the contract that
  * both inputs are sorted and distinct (`array_sort(array_distinct …)`
  * at set build); unsorted input silently undercounts, so the
  * gram-set builders are the only call sites.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx < vy) i += 1
      else if (vx > vy) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val vx = ctx.freshName("vx"); val vy = ctx.freshName("vy")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i); long $vy = $b.getLong($j);
         |  if ($vx < $vy) $i++;
         |  else if ($vx > $vy) $j++;
         |  else { $n++; $i++; $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object HashFunctions {
  val DefaultBase: Long = 1000003L

  /** Evaluate a SQL-registration argument that must be a constant
    * integer (e.g. `ngram_hashes(text, 3)`). A non-foldable argument
    * (a column, a non-literal expression) would otherwise surface as
    * an opaque eval-time exception from the unbound expression. */
  def constInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, arg: String): Int = {
    require(e.foldable,
      s"$fn: $arg must be a constant integer, got non-foldable ${e.sql}")
    e.eval().asInstanceOf[Number].intValue
  }

  /** Column-level rolling hash. */
  def rolling_hash(c: Column, base: Long = DefaultBase): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base))

  /** Column-level SimHash over an array<long> of token hashes. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** |A ∩ B| over two sorted-distinct array<long> columns. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level MinHash signature over an array<long> of shingle
    * hashes. */
  def minhash_signature(c: Column, as: Seq[Long], bs: Seq[Long],
      prime: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(c), as, bs, prime))

  /** Plain-Scala reference implementation (test oracle + driver-side
    * uses). Must stay byte-for-byte equivalent to the expression. */
  def rollingHashRef(s: String, base: Long = DefaultBase): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }
}
