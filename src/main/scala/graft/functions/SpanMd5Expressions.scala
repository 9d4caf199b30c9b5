package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native replacements for the interpreted
  * `transform(sequence(...), i -> md5(array_join(slice(w, i, k), ' ')))`
  * HOF chains behind the span-dedup and DSIR families. The md5 VALUES are
  * bit-identical to the SQL form (same UTF-8 bytes, same lowercase hex /
  * leading-8-hex-chars integer), so every DuckDB oracle and every
  * persisted store built from the SQL form stays valid — only the
  * per-span interpreter overhead (lambda dispatch, slice allocation,
  * join-string churn) goes away.
  */
object SpanMd5Util {

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5(): java.security.MessageDigest =
    java.security.MessageDigest.getInstance("MD5")

  /** Joins tokens [start, start+k) with ' ' into the digest, SKIPPING
    * null elements and their delimiters — exactly `array_join(..., ' ')`
    * / `concat_ws(' ', ...)` null semantics, so the value-identity
    * contract holds for SQL users passing arrays with null elements too
    * (internal call sites never produce null tokens).
    */
  private def updateJoined(md: java.security.MessageDigest,
      toks: Array[Array[Byte]], start: Int, k: Int): Unit = {
    var emitted = 0
    var j = 0
    while (j < k) {
      val t = toks(start + j)
      if (t != null) {
        if (emitted > 0) md.update(' '.toByte)
        md.update(t)
        emitted += 1
      }
      j += 1
    }
  }

  private def tokenBytes(arr: ArrayData): Array[Array[Byte]] = {
    val m = arr.numElements()
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) null else t.getBytes
      i += 1
    }
    toks
  }

  /** `array<string>` tokens -> `array<string>` md5 hex of every k-token
    * window joined with ' ' — value-identical to
    * `transform(sequence(1, size(w)-k+1), i -> md5(array_join(slice(w,i,k), ' ')))`.
    */
  def spans(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val toks = tokenBytes(arr)
    val md = md5()
    val out = new Array[Any](m - k + 1)
    var s = 0
    while (s <= m - k) {
      md.reset()
      updateJoined(md, toks, s, k)
      val d = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      out(s) = UTF8String.fromString(new String(hex))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** `array<string>` tokens -> `array<long>` of k-window md5 integer
    * ids — value-identical to
    * `transform(sequence(1, size(w)-k+1), i -> CAST(conv(substring(md5(
    *   <k tokens joined with ' '>), 1, 8), 16, 10) AS BIGINT))`
    * (the md5's first 4 bytes read as an unsigned 32-bit integer),
    * reduced mod nB when nB > 0. Shared by the DSIR bigram bucketing
    * (k=2, nB=1024) and the winnowing gram ids (k=4, raw).
    */
  def spanIds(arr: ArrayData, k: Int, nB: Int): ArrayData = {
    val m = arr.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Long])
    val toks = tokenBytes(arr)
    val md = md5()
    val out = new Array[Long](m - k + 1)
    var s = 0
    while (s <= m - k) {
      md.reset()
      updateJoined(md, toks, s, k)
      val d = md.digest()
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(s) = if (nB > 0) u32 % nB else u32
      s += 1
    }
    new GenericArrayData(out)
  }

  def bigramBuckets(arr: ArrayData, nB: Int): ArrayData = spanIds(arr, 2, nB)

  /** `array<string>` tokens -> `array<long>` of NON-OVERLAPPING k-token
    * chunk md5 ids, one per chunk (`size div k` of them) — the digest of
    * `array_join(slice(w, (i-1)*k + 1, k), ' ')` with its first 8 bytes
    * read big-endian as a signed 64-bit id. 64 bits (not [[spanIds]]'
    * 32) because these ids KEY corpus-wide distinct-counts: at ~10^6
    * distinct segments a u32 id birthday-collides with near-certainty,
    * silently merging two segments' document counts, while 64-bit md5
    * prefixes keep the expected collision count at n²/2^65 (~3e-3 even
    * at 10^10 segments; widen to the full digest beyond that).
    */
  def chunkIds64(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    val n = m / k
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val toks = tokenBytes(arr)
    val md = md5()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      updateJoined(md, toks, i * k, k)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** k-token span md5 fingerprints (see [[SpanMd5Util.spans]]). */
case class SpanMd5s(child: Expression, k: Int = 8) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_md5s expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "span_md5s"

  override def nullSafeEval(v: Any): Any =
    SpanMd5Util.spans(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SpanMd5Util.spans($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanMd5s =
    copy(child = newChild)
}

/** k-window md5 integer ids (see [[SpanMd5Util.spanIds]]) — the
  * winnowing gram-id form (k=4, no modulus).
  */
case class SpanMd5Ids(child: Expression, k: Int = 4)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_md5_ids expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_md5_ids"

  override def nullSafeEval(v: Any): Any =
    SpanMd5Util.spanIds(v.asInstanceOf[ArrayData], k, 0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SpanMd5Util.spanIds($a, $k, 0)")

  override protected def withNewChildInternal(newChild: Expression): SpanMd5Ids =
    copy(child = newChild)
}

/** Non-overlapping k-chunk 64-bit md5 ids (see
  * [[SpanMd5Util.chunkIds64]]) — the segment-dedup key form.
  */
case class ChunkMd5Ids64(child: Expression, k: Int = 4)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_md5_ids64 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chunk_md5_ids64"

  override def nullSafeEval(v: Any): Any =
    SpanMd5Util.chunkIds64(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SpanMd5Util.chunkIds64($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): ChunkMd5Ids64 =
    copy(child = newChild)
}

/** Hashed-bigram bucket ids (see [[SpanMd5Util.bigramBuckets]]). */
case class BigramMd5Buckets(child: Expression, nB: Int = 1024)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_md5_buckets expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_md5_buckets"

  override def nullSafeEval(v: Any): Any =
    SpanMd5Util.bigramBuckets(v.asInstanceOf[ArrayData], nB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SpanMd5Util.bigramBuckets($a, $nB)")

  override protected def withNewChildInternal(newChild: Expression): BigramMd5Buckets =
    copy(child = newChild)
}
