package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** THE decimal-staging convention in one place: Spark↔DuckDB hash parity
  * requires every sum of doubles to accumulate as DECIMAL(18,6) (exact,
  * partition-order-independent) and surface as DOUBLE. Until round 7
  * this pair was re-implemented privately in Joins, Relational (twice)
  * and Windows — four copies of the repo's single most load-bearing
  * parity rule, where an edit missing one copy silently breaks the hash
  * gate. Squares and other wide products stage through DECIMAL(38,10)
  * at their call sites (see q_ttest / q_regression), which is a
  * different, deliberate precision — not covered here.
  */
object Parity {
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
}
