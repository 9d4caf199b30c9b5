package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared machinery for the two-level banded distributed prefix sum —
  * the scale-safe replacement for `Window.orderBy(...)` running sums
  * over corpus-sized tables (used by q_ks_2samp's ECDF, q_auc's
  * Mann-Whitney ranks, and the q_gini / q_lorenz revenue ranks).
  *
  * Shape: rows band into ≤ B value-range buckets; per-band partial
  * counts roll up on the B-bounded band table; the strictly-preceding
  * band offsets then turn every within-band cumulative window into an
  * independent `partitionBy(bkt)` partition. The only global structure
  * is the band table itself.
  *
  * Reference precedent: the reference's single master collects EVERY
  * reduce result into one dict (mincemeat.py:74-75); here even the
  * global-ordering metadata is B-bounded by construction.
  */
object Banding {

  /** Band assignment for a NON-NULL numeric column given broadcast
    * bounds `lo`/`hi` (already in scope as columns): ≤1024 value-range
    * buckets, degenerate range collapses to band 0. Shared by
    * Holistic.aucExact and Mining.bandedRevRank so the null/degenerate
    * edge handling lives in exactly one place. Monotone in the input
    * (floor of an affine map), so equal values can never straddle a
    * band. PRECONDITION: the input column is non-null — a null value
    * would band to null and silently fall out of the offsets inner
    * join; call sites filter or aggregate nulls away first (both
    * engines' rank semantics over null scores differ anyway, so the
    * contract excludes them).
    */
  def bucketize(x: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L))
      .otherwise(least(floor((x - lo) / ((hi - lo) / lit(1024.0))),
        lit(1023L)).cast(LongType))

  /** Band assignment DESCENDING in `x` (largest-first rank order):
    * bucketize on the negated value, so ascending bkt order = descending
    * value order and [[offsets]]' ascending fold yields
    * strictly-higher-value offsets. `lo`/`hi` are the ORIGINAL (min, max)
    * bounds. Used by the vocabulary frequency ranks (q_zipf /
    * q_encode_ids), whose type table is unbounded at corpus scale.
    */
  def bucketizeDesc(x: Column, lo: Column, hi: Column): Column =
    bucketize(-x, -hi, -lo)

  /** Strictly-preceding prefix sums over a band-bounded partials table.
    *
    * `bands` must have `bkt: Long` as its FIRST column followed by one
    * or more Long partial-sum columns; `outNames` names the returned
    * offset columns positionally. The band table is ≤ B rows BY
    * CONSTRUCTION (`bkt = least(floor(...), B-1)` at every call site),
    * so the collect is driver-bounded the same way the
    * Holistic.exactQuantiles2Pass histogram is — this is metadata, not
    * data. Folding the offsets on the driver instead of an
    * unpartitioned running-sum window removes the one remaining
    * single-task window AND its shuffle; the result comes back as a
    * LocalRelation, so the subsequent broadcast join ships it without
    * an extra job. All partials are exact longs, so the fold is
    * order-insensitive integer arithmetic.
    */
  def offsets(bands: DataFrame, outNames: Seq[String]): DataFrame = {
    val spark = bands.sparkSession
    val collected = bands.collect()
    collected.foreach(r => require(!r.isNullAt(0),
      "null band key reached Banding.offsets — a null value leaked past " +
        "the bucketize precondition (non-null input column)"))
    val rows = collected.sortBy(_.getLong(0))
    val acc = Array.fill(outNames.size)(0L)
    val out = new java.util.ArrayList[Row](rows.length)
    rows.foreach { r =>
      val offs = acc.toSeq
      outNames.indices.foreach(i => acc(i) += r.getLong(i + 1))
      out.add(Row.fromSeq(r.getLong(0) +: offs))
    }
    val schema = StructType(StructField("bkt", LongType, nullable = false) +:
      outNames.map(n => StructField(n, LongType, nullable = false)))
    spark.createDataFrame(out, schema)
  }
}
