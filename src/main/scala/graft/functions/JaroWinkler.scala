package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated Java calls the similarity directly (the
  * TryParseIntUtil pattern). Textbook Jaro with the Winkler prefix boost
  * gated at jaro > 0.7 — the same definition DuckDB's
  * `jaro_winkler_similarity` implements (verified empirically over every
  * blocked fixture pair, and by the no-boost-below-0.7 probe), so the
  * DuckDB oracle can score the identical pairs.
  *
  * Byte-level matching: DuckDB's implementation ALSO matches per UTF-8
  * byte (its café/cafe score is the 5-vs-4-byte computation, not the
  * code-point one), so the two engines agree on multi-byte input as
  * well — pinned with non-ASCII reference pairs in FunctionsSpec.
  */
object JaroWinklerUtil {

  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    // DuckDB convention: ANY empty side (including both) scores 0.0
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, l2 - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order, count
    // positional mismatches, halve with INTEGER division — DuckDB floors
    // an odd mismatch count (fuzz-verified: 4000 random pairs agree with
    // floor, 194 diverge with the fractional t some textbooks use)
    var diff = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) diff += 1
        k += 1
      }
      i += 1
    }
    val t = (diff / 2).toDouble
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (p < pmax && s1(p) == s2(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

/** Jaro-Winkler string similarity as a native codegen expression — the
  * typo/phonetic scorer for entity-resolution joins. A Scala UDF here
  * would deserialize both UTF8Strings per candidate pair out of Tungsten
  * rows and box the result; this stays inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType.isInstanceOf[StringType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerUtil.jw($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
