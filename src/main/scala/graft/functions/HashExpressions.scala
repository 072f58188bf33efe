package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
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

object HashFunctions {
  val DefaultBase: Long = 1000003L

  /** Column-level rolling hash. */
  def rolling_hash(c: Column, base: Long = DefaultBase): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base))

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
