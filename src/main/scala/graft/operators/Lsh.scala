package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared banding machinery for the 64-bit LSH codes (hyperplane /
  * simhash). The scale invariant: a band equi-join's candidate volume is
  * ~ nBands * n * bucketSize, so bucketSize — not bucket COUNT — must stay
  * bounded as the corpus grows. Band width is therefore chosen from the
  * corpus size: 2^bits ≈ n / targetBucket.
  *
  * With a fixed-width band (round 2 used 4 bits = 16 buckets/band) the
  * bucket size is n/16 and the join degenerates toward n^2/16 pairs; with
  * the adaptive width the candidate set stays O(n) until the 16-bit cap
  * (n ≈ targetBucket * 2^16 ≈ 2M vectors per independent code — beyond
  * that, scale out with multiple independent 64-bit codes rather than
  * wider bands, which would cost recall).
  */
object Lsh {

  /** Band width in bits targeting ~`targetBucket` vectors per band bucket:
    * smallest width in {4, 8, 16} (the divisors of 64 that give whole
    * bands) with 2^bits >= n / targetBucket; 16 at the cap.
    */
  def bandBits(n: Long, targetBucket: Long = 32L): Int = {
    val ratio = math.max(1.0, n.toDouble / targetBucket)
    Seq(4, 8, 16).find(b => (1L << b) >= ratio).getOrElse(16)
  }

  /** Explode a 64-bit code column into one (band, bv) row per band:
    * 64/bits disjoint slices of `bits` bits each. Using the WHOLE code —
    * more, narrower bands at small n; fewer, wider bands at large n —
    * keeps recall high while the adaptive width bounds bucket size.
    */
  def explodeBands(df: DataFrame, codeCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 16 && 64 % bits == 0,
      s"band width must divide 64 and be <= 16, got $bits")
    val nBands = 64 / bits
    val mask = (1L << bits) - 1
    df.withColumn("x", explode(expr(
        s"transform(sequence(0, ${nBands - 1}), " +
          s"b -> struct(b AS band, shiftright($codeCol, b * $bits) & $mask AS bv))")))
      .withColumn("band", col("x.band"))
      .withColumn("bv", col("x.bv"))
      .drop("x")
  }
}
