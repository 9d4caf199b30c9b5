package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document Cavnar–Trenkle rank profile — the classification
  * side of the trigram lang-id family computed entirely WITHIN one row.
  * Value-identical to the SQL chain
  * `explode(transform(sequence(1, length(nt)-2), i -> substring(nt,i,3)))`
  * → `groupBy(doc, tg).count()` → `row_number() over (partition by doc
  * order by cnt desc, tg asc) <= K`, but with no exploded trigram rows
  * leaving the projection: the old chain shuffled ~one row per corpus
  * CHARACTER into the count aggregate and the same volume again through
  * the per-doc rank window — at 100 TB those are two corpus-sized
  * shuffles for what is a per-document computation. Equality of the
  * orders: Spark's string ordering and UTF8String.compareTo are both
  * binary, substring() here is code-point based like SQL substring, and
  * the (count desc, trigram asc) comparator is a total order per doc,
  * so the top-K cut is deterministic and identical. Pinned equal to the
  * SQL derivation by LangIdSpec's native-vs-SQL law; the DuckDB oracle
  * (independent third algebra) unchanged.
  */
object TrigramUtil {

  private val emptyProfile = new GenericArrayData(Array.empty[Any])

  /** Top-`k` trigram ranks of the (already-normalized) text as
    * array<struct<tg:string, rank:long>>; empty for texts under 3
    * chars. One O(bytes) pass: code-point starts are indexed once and
    * windows slice the shared byte array — calling
    * `UTF8String.substring` per window would re-seek from the string
    * head every call (O(chars²) per doc; measured as a 1.7× REGRESSION
    * vs the SQL chain before this fix).
    */
  /** Code-point start offsets of `bytes`, one linear walk; the extra
    * trailing slot is the end sentinel. Returns (starts, nChars). */
  private def codePointStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    val starts = new Array[Int](bytes.length + 1)
    var off = 0
    var n = 0
    while (off < bytes.length) {
      starts(n) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    starts(n) = bytes.length
    (starts, n)
  }

  def rankProfile(nt: UTF8String, k: Int): ArrayData = {
    val bytes = nt.getBytes
    val (starts, n) = codePointStarts(bytes)
    if (n < 3) return emptyProfile
    val counts = new java.util.HashMap[UTF8String, Long](Math.min(n, 4096))
    var i = 0
    while (i <= n - 3) {
      val tg = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      counts.merge(tg, 1L, (a, b) => a + b)
      i += 1
    }
    val entries = new java.util.ArrayList[java.util.Map.Entry[UTF8String, Long]](
      counts.entrySet())
    entries.sort(new java.util.Comparator[java.util.Map.Entry[UTF8String, Long]] {
      override def compare(a: java.util.Map.Entry[UTF8String, Long],
          b: java.util.Map.Entry[UTF8String, Long]): Int = {
        val byCnt = java.lang.Long.compare(b.getValue, a.getValue) // desc
        if (byCnt != 0) byCnt else a.getKey.compareTo(b.getKey)    // asc
      }
    })
    val m = Math.min(k, entries.size())
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = new GenericInternalRow(
        Array[Any](entries.get(r).getKey, (r + 1).toLong))
      r += 1
    }
    new GenericArrayData(out)
  }

  /** `size(rankProfile(nt, k))` without building the profile:
    * min(distinct trigrams, k) via a HashSet with an EARLY EXIT once k
    * distinct trigrams are seen — most real documents clear K=150
    * within their first few hundred characters, so the n_tgs branch of
    * LangId.classify (which only needs the count) pays a fraction of
    * the full count-map + sort + struct build it previously
    * re-evaluated (round-14 review).
    */
  def profileSize(nt: UTF8String, k: Int): Long = {
    val bytes = nt.getBytes
    val (starts, n) = codePointStarts(bytes)
    if (n < 3) return 0L
    val seen = new java.util.HashSet[UTF8String](Math.min(2 * k, 4096))
    var i = 0
    while (i <= n - 3 && seen.size() < k) {
      seen.add(UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i)))
      i += 1
    }
    seen.size().toLong
  }
}



/** min(distinct trigram count, k) of a normalized text — the size of
  * [[TrigramUtil.rankProfile]] without materializing it.
  */
case class TrigramProfileSize(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"trigram_profile_size: k must be >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_profile_size expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "trigram_profile_size"

  override def nullSafeEval(v: Any): Any =
    TrigramUtil.profileSize(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TrigramUtil.profileSize($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): TrigramProfileSize =
    copy(child = newChild)
}

/** array<struct<tg, rank>> top-k trigram profile of a normalized text
  * (see [[TrigramUtil.rankProfile]]).
  */
case class TrigramRankProfile(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"trigram_rank_profile: k must be >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_rank_profile expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tg", StringType, nullable = false),
    StructField("rank", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "trigram_rank_profile"

  override def nullSafeEval(v: Any): Any =
    TrigramUtil.rankProfile(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TrigramUtil.rankProfile($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): TrigramRankProfile =
    copy(child = newChild)
}
