package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native replacements for the interpreted
  * `aggregate(array_sort(arr), <6-field RLE struct>, ...)` folds behind
  * the Gopher repetition battery (Text.repFoldSql). The four fold
  * outputs are bit-identical to the SQL form — the fold's algebra is
  * order-independent (mx = max multiplicity; topcov = max coverage
  * among the max-multiplicity values; dupch/dupin = Σ over values with
  * multiplicity > 1 of cnt·chars / cnt), so a hash count-map replaces
  * the sort + per-element struct churn entirely: O(n) instead of
  * O(n log n), zero per-element allocations, and the whole battery
  * stays inside whole-stage codegen. A fifth field `chars`
  * (Σ cnt·chars over ALL values — the `aggregate(arr, 0L, (a,x) ->
  * a + length(x))` total the battery previously folded separately)
  * rides along for free.
  *
  * Null elements: skipped for every field except `mx`, which counts
  * each null as a singleton run — exactly the SQL fold's behavior
  * (nulls never chain through `x = acc.prev` and contribute nothing to
  * topcov/dupch/dupin). Internal call sites (split() lines/paragraphs,
  * normTokens grams) never produce null elements.
  */
object RepRleUtil {

  /** Shared reduction: occurrence counts → (mx, topcov, dupch, dupin,
    * chars). `nullSingletons` = number of null elements seen (each a
    * 1-run for mx).
    */
  private def reduce(counts: java.util.HashMap[UTF8String, Long],
      nullSingletons: Long): InternalRow = {
    var mx = if (nullSingletons > 0) 1L else 0L
    var topcov = 0L
    var dupch = 0L
    var dupin = 0L
    var chars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue
      val cov = cnt * e.getKey.numChars().toLong
      chars += cov
      if (cnt > mx) { mx = cnt; topcov = cov }
      else if (cnt == mx && cov > topcov) topcov = cov
      if (cnt > 1) { dupch += cov; dupin += cnt }
    }
    new GenericInternalRow(Array[Any](mx, topcov, dupch, dupin, chars))
  }

  /** RLE stats of the array's elements as they stand (lines,
    * paragraphs). */
  def rleStats(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](Math.max(8, m))
    var nulls = 0L
    var i = 0
    while (i < m) {
      val v = arr.getUTF8String(i)
      if (v == null) nulls += 1L
      else counts.merge(v, 1L, (a, b) => a + b)
      i += 1
    }
    reduce(counts, nulls)
  }

  /** RLE stats of the space-joined n-token windows of `arr` — the
    * native form of `repFoldSql(repGramArrSql(n))`. Window strings are
    * built with concat_ws(' ') null semantics (null tokens and their
    * delimiters skipped), so the gram VALUES — and therefore every
    * count and character length — match the SQL chain exactly.
    */
  def gramStats(arr: ArrayData, n: Int): InternalRow = {
    val m = arr.numElements()
    if (m < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L))
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Long](Math.max(8, m))
    var s = 0
    while (s <= m - n) {
      val window = new Array[UTF8String](n)
      var j = 0
      while (j < n) { window(j) = toks(s + j); j += 1 }
      val gram = UTF8String.concatWs(sep, window: _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      s += 1
    }
    reduce(counts, 0L)
  }
}

/** struct(mx, topcov, dupch, dupin, chars) of an array's repeated
  * elements (see [[RepRleUtil.rleStats]]).
  */
case class RepRleStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_rle_stats expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = RepRleStats.struct
  override def prettyName: String = "rep_rle_stats"

  override def nullSafeEval(v: Any): Any =
    RepRleUtil.rleStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RepRleUtil.rleStats($a)")

  override protected def withNewChildInternal(newChild: Expression): RepRleStats =
    copy(child = newChild)
}

object RepRleStats {
  private[functions] val struct: StructType = StructType(Seq(
    StructField("mx", LongType, nullable = false),
    StructField("topcov", LongType, nullable = false),
    StructField("dupch", LongType, nullable = false),
    StructField("dupin", LongType, nullable = false),
    StructField("chars", LongType, nullable = false)))
}

/** struct(mx, topcov, dupch, dupin, chars) of the n-token windows of a
  * words array (see [[RepRleUtil.gramStats]]).
  */
case class RepGramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"rep_gram_stats: window width must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"rep_gram_stats expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = RepRleStats.struct
  override def prettyName: String = "rep_gram_stats"

  override def nullSafeEval(v: Any): Any =
    RepRleUtil.gramStats(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RepRleUtil.gramStats($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepGramStats =
    copy(child = newChild)
}
