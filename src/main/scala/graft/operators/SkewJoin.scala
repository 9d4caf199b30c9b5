package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't enough (e.g. one key is >> a single executor's memory
  * on the build side of a shuffled hash join).
  *
  * Left (large, skewed) rows get a uniform random-ish salt in [0, buckets);
  * right rows are replicated once per salt value. The join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers. Salt is
  * derived from stable row content (xxhash64 of all left columns), not
  * rand(), so results are deterministic and retries are safe — a task
  * re-execution must re-salt identically or rows are lost/duplicated.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // The right side is replicated once per salt bucket, so any join type
    // that emits unmatched RIGHT rows would duplicate them `buckets` times.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")
      .contains(jt),
      s"saltedEquiJoin does not support joinType=$joinType (right side is replicated)")
    val saltCol: Column =
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets))
    val l = left.withColumn("__salt", saltCol)
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
