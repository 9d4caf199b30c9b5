package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helper so generated Java can call the loop directly (Scala emits
  * a static forwarder for top-level object methods).
  */
object PolyHashUtil {
  final val Mod = 1000000007L

  /** h_{i+1} = (h_i * 31 + length(t)*7 + ascii(t)) mod 1e9+7 — identical to
    * the SQL `aggregate(transform(...))` fold it replaces (and to the
    * DuckDB list_reduce oracle), just one codegen'd call per row instead of
    * an interpreted lambda per token.
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      // SQL users can pass arrays with null elements: treat as empty string
      // (len = 0, first = 0 — same contribution as "")
      val t = arr.getUTF8String(i)
      val len = if (t == null) 0L else t.numChars().toLong
      // ascii() = first code point (0 for empty); ASCII fast path reads the
      // raw byte, otherwise fall back to the string's first code point.
      val first =
        if (t == null || t.numBytes() == 0) 0L
        else {
          val b = t.getByte(0)
          if (b >= 0) b.toLong else t.toString.codePointAt(0).toLong
        }
      h = (h * 31L + len * 7L + first) % Mod
      i += 1
    }
    h
  }
}

/** Rolling polynomial document fingerprint over a token array — native
  * codegen'd replacement for the interpreted higher-order-function fold
  * (ArrayAggregate is CodegenFallback; this stays in whole-stage codegen).
  */
case class PolyTokenHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(v: Any): Any =
    PolyHashUtil.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PolyHashUtil.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): PolyTokenHash =
    copy(child = newChild)
}
