package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helpers so generated Java calls the loops directly (Scala emits
  * static forwarders for top-level object methods) — both expressions stay
  * inside whole-stage codegen.
  */
object NgramHashUtil {

  /** `array<string>` tokens -> sorted distinct `array<long>` of rolling
    * n-gram hashes: each token is murmur-hashed once, gram hashes combine
    * token hashes — no gram strings are ever materialized.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val nTok = arr.numElements()
    val m = nTok - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val tokHash = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        // SQL users can pass arrays with null elements: treat as empty string
        val t = arr.getUTF8String(i)
        val bytes = if (t == null) Array.emptyByteArray else t.getBytes
        tokHash(i) = Hashing.splitmix64(
          MurmurHash3.bytesHash(bytes, 0x9747b28c).toLong)
        i += 1
      }
      val grams = new Array[Long](m)
      i = 0
      while (i < m) {
        var h = 0L
        var j = 0
        while (j < n) { h = Hashing.splitmix64(h * 31L + tokHash(i + j)); j += 1 }
        grams(i) = h
        i += 1
      }
      // sorted + deduped: deterministic order, distinct-set semantics
      java.util.Arrays.sort(grams)
      var w = 0
      i = 0
      while (i < m) {
        if (w == 0 || grams(i) != grams(w - 1)) { grams(w) = grams(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(grams, w))
    }
  }
}

object MinHashUtil {
  // gamma table cache per (k, seed): computed once per JVM, shared by all
  // tasks — the per-row loop only reads it
  private val gammaCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  def gammas(k: Int, seed: Long): Array[Long] =
    gammaCache.computeIfAbsent((k, seed),
      _ => Array.tabulate(k)(j => Hashing.splitmix64(seed + j)))

  /** Pre-hashed shingles -> k per-permutation minima of splitmix64(x ^ gamma_j). */
  def compute(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val g = gammas(k, seed)
    val m = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = Hashing.splitmix64(x ^ g(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native n-gram shingle hashing: `array<string>` tokens -> sorted distinct
  * `array<long>` of rolling n-gram hashes.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(' ', w[i], ...))`
  * + per-gram UDF pipeline: no gram strings are ever materialized, and
  * downstream operators shuffle 8-byte longs instead of ~30-byte strings.
  * Jaccard on the hash sets equals Jaccard on the gram sets up to 2^-64
  * collisions. Since the gram-store change, the oracled exact paths
  * (q_ngram_jaccard, q_simjoin_prefix) ALSO run on these hashes while
  * their DuckDB oracles keep string grams — sound because a collision
  * within any compared pair's gram sets (~|G|²/2^64 per pair) would
  * surface as a driver hash MISMATCH, not silent agreement; the oracle
  * gate itself is the collision detector.
  */
case class NgramHashes(child: Expression, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(v: Any): Any =
    NgramHashUtil.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NgramHashUtil.compute($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** MinHash signature from pre-hashed shingles: `array<long>` -> `array<long>`
  * of k per-permutation minima, h_j(x) = splitmix64(x ^ gamma_j).
  *
  * NOT the textbook (a*x + b) mod p family: with x < 2^32 and a < 2^30,
  * a*x + b < p = 2^61 for half the x range, so h is MONOTONE in x there —
  * all k "permutations" attain their min at the same smallest-x shingle,
  * and one unshared small-x gram makes two 0.99-Jaccard docs disagree on
  * every signature slot (observed on the sf0.001 fixture: docs 8 vs 120,
  * 5/64 matches at jaccard 0.986). Full avalanche mixing per permutation
  * restores E[match fraction] = Jaccard.
  */
case class MinHashFromHashes(child: Expression, k: Int = 64, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def nullSafeEval(v: Any): Any =
    MinHashUtil.compute(v.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashUtil.compute($a, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}
