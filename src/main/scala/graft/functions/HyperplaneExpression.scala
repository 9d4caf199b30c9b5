package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Static helper so generated Java calls the loop directly. The plane
  * coefficient matrix is computed ONCE per (nBits, dim, seed) per JVM and
  * shared by every task (same pattern as MinHashUtil.gammaCache) — the
  * per-row loop only reads it. The predecessor UDF regenerated all
  * nBits*dim SplitMix64 coefficients inside every row's evaluation
  * (1024 hash calls per vector at defaults).
  */
object HyperplaneUtil {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  /** Flattened nBits x dim coefficient matrix; coefficient (j, d) is
    * uniform(-0.5, 0.5) from splitmix64(seed + j*1024 + d) — bit-identical
    * to Hashing.hyperplaneBits' per-row derivation.
    */
  def planes(nBits: Int, dim: Int, seed: Long): Array[Double] =
    planeCache.computeIfAbsent((nBits, dim, seed), _ => {
      val p = new Array[Double](nBits * dim)
      var j = 0
      while (j < nBits) {
        var d = 0
        while (d < dim) {
          val u = (Hashing.splitmix64(seed + j * 1024L + d) >>> 11).toDouble /
            (1L << 53).toDouble
          p(j * dim + d) = u - 0.5
          d += 1
        }
        j += 1
      }
      p
    })

  def compute(arr: ArrayData, nBits: Int, dim: Int, seed: Long): Long = {
    val p = planes(nBits, dim, seed)
    val n = math.min(dim, arr.numElements())
    var out = 0L
    var j = 0
    while (j < nBits) {
      var dot = 0.0
      var d = 0
      val base = j * dim
      while (d < n) {
        dot += p(base + d) * arr.getFloat(d)
        d += 1
      }
      if (dot > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Random-hyperplane LSH bit code as a native codegen expression:
  * `array<float>` embedding -> `long` of nBits sign bits, bit j =
  * sign(dot(plane_j, v)). P(bit differs) = angle/pi (Charikar's SimHash
  * for vectors). Bit-compatible with Hashing.hyperplaneBits (the boxed
  * UDF it replaces — kept as the parity reference in specs).
  *
  * Default is the FULL 64-bit code: band width is then chosen at query
  * time from the corpus size (graft.operators.Lsh.bandBits), so band
  * buckets stay ~constant-sized as the corpus grows. The round-2 16-bit
  * default capped bands at 4 bits = 16 buckets/band, which degenerates the
  * band equi-join toward n^2/16 candidate pairs at scale.
  */
case class HyperplaneBits(child: Expression, nBits: Int = 64, dim: Int = 64,
    seed: Long = 42L) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bits expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(v: Any): Any =
    HyperplaneUtil.compute(v.asInstanceOf[ArrayData], nBits, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.HyperplaneUtil.compute($a, $nBits, $dim, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}
