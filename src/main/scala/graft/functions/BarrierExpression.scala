package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that keeps its subtree OUT of Catalyst's constraint
  * set — the lever that stops `InferFiltersFromConstraints` from
  * copying an expensive probe-side predicate onto the other side of an
  * equi-join.
  *
  * Why it exists: a Bloom pre-filter `mightContain(l_orderkey)` applied
  * to the probe side of `lineitem ⋈ orders ON l_orderkey = o_orderkey`
  * becomes a Filter constraint; constraint inference rewrites it
  * through the join equality into `mightContain(o_orderkey)` and plants
  * it on the BUILD-side scan. Semantically a no-op (every build key
  * passes the Bloom built from itself), but the build stage's task
  * binary then carries a second copy of the bitset literal — ~16 MB per
  * task broadcast at sf10 — plus two wasted hashes per build row
  * (VERDICT r13 finding 1).
  *
  * Mechanics: `QueryPlan.getAllValidConstraints` admits only
  * DETERMINISTIC predicates into the constraint set, so flagging this
  * node non-deterministic removes the subtree from inference while
  * `eval`/`doGenCode` stay a pure pass-through — zero runtime cost, no
  * codegen break (FilterExec codegens non-deterministic predicates).
  * The flag is a lie ONLY about propagation: the value is a pure
  * function of its input row. The cost of that lie is bounded to the
  * wrapped predicate itself — Catalyst stops reordering/merging THIS
  * conjunct (it already sits exactly where the caller wants it, directly
  * on the scan) and nothing else.
  */
case class ConstraintBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the point of the node: non-deterministic ⇒ never a constraint,
  // never inferred across a join equality
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "no_infer"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ConstraintBarrier {
  /** Wrap a Column so optimizer constraint inference cannot clone it
    * across join equalities. */
  def noInfer(c: Column): Column =
    ColumnBridge.column(ConstraintBarrier(ColumnBridge.expression(c)))
}
