package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated Java calls the parse directly. Returns
  * Long.MinValue as the failure sentinel (never a legal int32 value, so
  * it cannot collide with a parsed result).
  */
object TryParseIntUtil {
  final val Fail = Long.MinValue

  /** Strict-integer grammar: optional surrounding ASCII whitespace,
    * optional sign, decimal digits, int32 range — the same accepted set
    * as Spark's TRY-mode string->int cast on integer-shaped input, minus
    * fractional forms (which the engine's queries never feed it). The
    * point is the failure path: a plain `return`, not a thrown-and-caught
    * exception per malformed row (Spark's TRY cast constructs a full
    * NumberFormatException for every non-numeric value — at 600k
    * always-failing rows that alone costs seconds).
    */
  def parse(s: UTF8String): Long = {
    val t = s.trim()
    val n = t.numBytes()
    if (n == 0) return Fail
    val first = t.getByte(0)
    val neg = first == '-'
    var i = if (neg || first == '+') 1 else 0
    if (i >= n) return Fail
    var acc = 0L
    while (i < n) {
      val b = t.getByte(i)
      if (b < '0' || b > '9') return Fail
      acc = acc * 10 + (b - '0')
      if (acc > 2147483648L) return Fail // past |Int.MinValue|: overflow
      i += 1
    }
    val v = if (neg) -acc else acc
    if (v < Int.MinValue || v > Int.MaxValue) Fail else v
  }
}

/** Error-tolerant string->int parse as a native codegen expression:
  * returns NULL on malformed input WITHOUT exception control flow.
  * Replaces `try_cast(x AS INT)` in hot paths where most values fail to
  * parse — Spark's TRY cast materializes a NumberFormatException (stack
  * trace and all) per bad row, which dominated q_try_funcs' runtime.
  * FunctionsSpec pins agreement with try_cast over the shared grammar.
  */
case class TryParseInt(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"try_parse_int expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "try_parse_int"

  override def nullSafeEval(v: Any): Any = {
    val r = TryParseIntUtil.parse(v.asInstanceOf[UTF8String])
    if (r == TryParseIntUtil.Fail) null else r.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      long r = graft.functions.TryParseIntUtil.parse($c);
      if (r == Long.MIN_VALUE) { ${ev.isNull} = true; }
      else { ${ev.value} = (int) r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): TryParseInt =
    copy(child = newChild)
}
