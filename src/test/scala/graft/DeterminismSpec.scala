package graft

import org.apache.spark.sql.DataFrame

/** Partition-invariance laws: a query's RESULT must not depend on how the
  * data happens to be partitioned, because at cluster scale partitioning
  * is an execution accident — AQE re-plans it, task retries re-shuffle
  * it, and a 100-TB reingest never reproduces the original split. Any
  * query that drifts under a partition change is silently
  * non-deterministic under retries (the trap rand()-based sampling and
  * float accumulation both fall into; this repo's answers are md5 bucket
  * keys and decimal partial sums).
  *
  * The law: run the same query under two co-prime shuffle-partition
  * settings and assert row-set equality. Covered families — the ones
  * whose OUTPUT would change if their internal order/bucketing leaked:
  * deterministic sampling (mixture / split / bottom-k), salted two-stage
  * aggregation (decimal partials), fixed-point PageRank (integer
  * contribution sums), and the exact-decimal flagship agg.
  */
class DeterminismSpec extends SparkSpec {

  private val lawQueries = Seq(
    "q1_agg",             // decimal partial sums: order-free by construction
    "q_skew_agg",         // two-stage salted agg must equal single-stage
    "q_mixture_sample",   // md5-bucket sampling: keep-set is content-keyed
    "q_train_test_split", // md5 split assignment
    "q_bottomk_sample",   // two-phase bottom-k: salted slice + re-rank
    "q_pagerank",         // integer fixed-point contribution sums
    "q_tpch_q8",          // conditional ratio: both sums exact decimals
    "q_tpch_q15",         // argmax equality on exact decimals, not doubles
    "q_assoc_rules",      // integer pair counts; conf/lift fixed double exprs
    "q_rfm",              // cutpoint scores from exact type-7 percentiles
    "q_gini",             // rank×decimal sums, one final double division
    "q_acf",              // integer moment sums through one fixed expression
    "q_jaro_names",       // per-pair scalar — no aggregation order at all
    "q_auc",              // banded rank prefix sums: integer-or-half exact
    "q_lorenz",           // banded rank + ntile arithmetic + decimal shares
    "q_tpch_q9",          // decimal-staged profit sums over the 6-way join
    "q_tpch_q11",         // decimal value sums + double threshold compare
    "q_tpch_q22")         // decimal balance sums + double mean threshold

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("results are invariant under co-prime shuffle-partition settings") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      lawQueries.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = rows(SparkEntry.queries(name)(spark, sf0001))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = rows(SparkEntry.queries(name)(spark, sf0001))
        spark.catalog.clearCache()
        assert(a === b,
          s"$name drifts under partitioning: only-in-3=${(a -- b).take(3)} " +
            s"only-in-7=${(b -- a).take(3)}")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
