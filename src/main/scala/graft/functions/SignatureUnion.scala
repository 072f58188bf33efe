package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate: union of MinHash signatures by element-wise min —
  * the custom-UDAF extension point (SURVEY.md §2.7: a typed
  * `Aggregator` is the one place the reference surface plausibly wants
  * one). The MinHash union property makes this exact, not approximate:
  *
  *   sig(A ∪ B) = elementwiseMin(sig(A), sig(B))
  *
  * so a groupBy over document signatures yields the signature of the
  * group's combined shingle set without ever materializing it — an
  * O(K)-state partial aggregate (map-side combinable, merge-associative)
  * that turns corpus-level similarity into a tiny shuffle at 100 TB.
  */
object SignatureUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  private def mergeInto(acc: Array[Long], sig: Seq[Long]): Array[Long] =
    if (sig == null || sig.isEmpty) acc
    else if (acc.isEmpty) sig.toArray
    else {
      // mixed-width signatures are invalid input (different MinHashK
      // generations); fail loudly rather than truncate or overrun
      require(sig.length == acc.length,
        s"signature width mismatch: ${sig.length} vs ${acc.length}")
      var i = 0
      while (i < acc.length) {
        if (sig(i) < acc(i)) acc(i) = sig(i)
        i += 1
      }
      acc
    }

  override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] =
    mergeInto(acc, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    mergeInto(a, b.toSeq)

  override def finish(acc: Array[Long]): Seq[Long] = acc.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form for untyped groupBy/agg use. */
  def column: TypedColumn[Seq[Long], Seq[Long]] = this.toColumn
}
