package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helper so generated Java calls the loop directly. Bit-identical
  * to Hashing.simhash64 (same MurmurHash3.stringHash -> splitmix64 per
  * token) so the parity spec can pin native == UDF.
  */
object SimHashUtil {
  def compute(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // SQL users can pass arrays with null elements: treat as empty string
      val t = arr.getUTF8String(i)
      val h = Hashing.splitmix64(
        MurmurHash3.stringHash(if (t == null) "" else t.toString).toLong)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** SimHash-64 fingerprint as a native codegen expression: `array<string>`
  * tokens -> `long`; each bit is the sign of the per-position +1/-1 vote
  * over all token hashes. Replaces the boxed Seq[String] UDF in the
  * q_dedup_simhash hot path — the last non-native function in any
  * registered query.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_fp"

  override def nullSafeEval(v: Any): Any =
    SimHashUtil.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHashUtil.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
