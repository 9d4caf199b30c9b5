package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity passthrough whose ONLY job is to be a COLLAPSE BARRIER
  * (round-15 optimization): `deterministic = false` makes both
  * CollapseProject and physical-planning projection collapse
  * (ScanOperation) refuse to substitute the child expression into
  * downstream projections.
  *
  * Why that matters: a chain of per-row stages (PII augment → scrub →
  * battery signals) written as stacked projections is re-inlined by the
  * planner into one projection per OUTPUT column — each battery signal
  * gets its own private copy of the whole upstream text pipeline
  * (measured on q_pipeline_pretrain_v2: 33-177 KB per output
  * expression, thousands of duplicated CASE branches). Whole-stage
  * codegen's subexpression elimination normally recovers
  * evaluate-once at runtime, but generated code of that size trips the
  * JVM's method limits and falls back to the INTERPRETED path, where
  * every copy really evaluates. Wrapping the expensive producer in
  * `eval_once` pins it as a materialized per-row attribute instead:
  * the child is evaluated exactly once per row and every consumer
  * reads the result.
  *
  * Value-transparent: eval and codegen forward the child unchanged
  * (same value, same nullability), so results — and every oracle —
  * are bit-identical; only the plan shape changes. The
  * `deterministic=false` flag is a planner fence, not a semantic
  * claim: the child expressions used with it are pure functions
  * (FunctionsSpec pins eval_once(x) === x).
  *
  * Optimizer consequences to keep in mind at call sites: filters
  * cannot be pushed BELOW an eval_once output (use it only above any
  * scan-pruning predicates), and constant folding stops at the
  * barrier.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}
