package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native replacements for the two remaining interpreted HOF hot paths
  * the round-14 verdict flagged (task 2): q_char_entropy's per-char
  * sorted-run `aggregate` fold and q_span_mask's per-token
  * `filter(sequence(...), ix -> exists(ivs, ...))` keep lambda. Both
  * are VALUE-IDENTICAL to the SQL forms they replace (pinned by
  * HofNativeSpec laws; the SQL forms stay in Text.scala as the
  * reference algebra) — only the per-element interpreter churn goes
  * away.
  */
object MaskEntropyUtil {

  /** Character entropy of `s` with the EXACT fold semantics of the SQL
    * form `aggregate(array_sort(filter(split(text, ''), ...)), ...)`:
    * one `-p·ln(p)` term per DISTINCT code point, accumulated in
    * ascending code-point order (= the UTF8-binary sort order of the
    * single-char strings, so the IEEE sum sequence matches the SQL
    * fold and the DuckDB `ORDER BY c` fold bit-for-bit), with
    * p = run / length(text). Returns (n_distinct, entropy).
    */
  def charEntropy(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long](64)
    var total = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      total += 1L
      i += Character.charCount(cp)
    }
    val distinct = counts.size
    val keys = new Array[Int](distinct)
    val it = counts.keySet().iterator()
    var j = 0
    while (it.hasNext) { keys(j) = it.next(); j += 1 }
    java.util.Arrays.sort(keys)
    val len = total.toDouble
    var acc = 0.0
    j = 0
    while (j < distinct) {
      val p = counts.get(keys(j)).toDouble / len
      // StrictMath, not Math: Spark's `ln` evaluates via StrictMath.log,
      // and Math.log can differ by an ulp — the value-identity law
      // compares doubles EXACTLY
      acc += -p * StrictMath.log(p)
      j += 1
    }
    new GenericInternalRow(Array[Any](distinct.toLong, acc))
  }

  /** Span masking of a token array by 1-based inclusive intervals —
    * the EXACT semantics of the SQL keep-filter
    * `filter(sequence(1, size(w)), ix -> NOT exists(ivs, v ->
    * ix >= v.s AND ix <= v.e))` plus the
    * `array_join(transform(keep, ix -> element_at(w, ix)), ' ')`
    * emission: n_masked counts every covered INDEX (null tokens
    * included), the joined text skips null tokens without a delimiter
    * (concat_ws semantics, identical to array_join). Intervals are
    * sorted and merged once, so coverage is a two-pointer walk —
    * O(tokens + ivs·log ivs) instead of the lambda's
    * O(tokens × ivs) interpreted dispatches. Exists-over-any-interval
    * equals covered-by-merged-intervals, so the verdict per index is
    * unchanged.
    */
  def spanMask(w: ArrayData, ivs: ArrayData): InternalRow = {
    val n = w.numElements()
    val m = ivs.numElements()
    val starts = new Array[Long](m)
    val ends = new Array[Long](m)
    var nIv = 0
    var i = 0
    while (i < m) {
      // null interval elements are skipped (internal call sites — the
      // collect_list aggregation — never produce them)
      if (!ivs.isNullAt(i)) {
        val iv = ivs.getStruct(i, 2)
        starts(nIv) = iv.getLong(0)
        ends(nIv) = iv.getLong(1)
        nIv += 1
      }
      i += 1
    }
    // sort by start (index sort: m is the per-doc island count — tiny)
    val order = (0 until nIv).sortBy(k => starts(k))
    // merge into disjoint ascending intervals
    val ms = new Array[Long](nIv)
    val me = new Array[Long](nIv)
    var nm = 0
    for (k <- order) {
      if (nm > 0 && starts(k) <= me(nm - 1) + 1) {
        if (ends(k) > me(nm - 1)) me(nm - 1) = ends(k)
      } else { ms(nm) = starts(k); me(nm) = ends(k); nm += 1 }
    }
    val keptToks = new java.util.ArrayList[UTF8String](n)
    var kept = 0L
    var p = 0
    var ix = 1L
    while (ix <= n) {
      while (p < nm && me(p) < ix) p += 1
      val covered = p < nm && ms(p) <= ix
      if (!covered) {
        kept += 1L
        keptToks.add(w.getUTF8String((ix - 1).toInt))
      }
      ix += 1L
    }
    val joined = UTF8String.concatWs(UTF8String.fromString(" "),
      keptToks.toArray(new Array[UTF8String](keptToks.size())): _*)
    new GenericInternalRow(Array[Any](n.toLong, n.toLong - kept, joined))
  }
}

/** struct(n_distinct, entropy) of a string's characters — see
  * [[MaskEntropyUtil.charEntropy]].
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = CharEntropyStats.struct
  override def prettyName: String = "char_entropy_stats"

  override def nullSafeEval(v: Any): Any =
    MaskEntropyUtil.charEntropy(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MaskEntropyUtil.charEntropy($a)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {
  private[functions] val struct: StructType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
}

/** struct(n_tokens, n_masked, masked_text) of tokens masked by 1-based
  * inclusive (s, e) intervals — see [[MaskEntropyUtil.spanMask]].
  * Callers with a nullable interval side (the left-join miss of clean
  * docs) coalesce it to an empty typed array — "no intervals" and
  * "keep everything" coincide by the SQL form's own null
  * short-circuit.
  */
case class SpanMaskStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
          ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, LongType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "span_mask_stats expects (array<string>, " +
          s"array<struct<bigint,bigint>>), got (${l.simpleString}, " +
          s"${r.simpleString})")
    }
  override def dataType: DataType = SpanMaskStats.struct
  override def prettyName: String = "span_mask_stats"

  override def nullSafeEval(w: Any, ivs: Any): Any =
    MaskEntropyUtil.spanMask(w.asInstanceOf[ArrayData],
      ivs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MaskEntropyUtil.spanMask($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SpanMaskStats =
    copy(left = newLeft, right = newRight)
}

object SpanMaskStats {
  private[functions] val struct: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("masked_text", StringType, nullable = false)))
}
