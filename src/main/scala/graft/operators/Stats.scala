package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Statistical testing / robust-preprocessing operators — the "is this
  * data slice different" and "tame the outliers" tools a curation
  * pipeline runs after the per-row quality gates (reference precedent:
  * holistic `reducefn` folds over a key's full value list,
  * mincemeat.py:179-182 — these are the classic statistics those folds
  * get used for, re-expressed as partial-aggregable moment/count sums so
  * the corpus never ships raw rows to one place).
  *
  * Oracle-parity rules (see AnalyticsSpec / memory conventions): integer
  * counts everywhere possible; decimal(18,6)/(38,10) staging for sums of
  * doubles; cell folds in SORTED key order so both engines add the same
  * IEEE sequence; round(,6) only where a genuine irrational (sqrt/ln)
  * enters.
  */
object Stats {

  private val S = "c_mktsegment"
  private val P = "o_orderpriority"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Chi-square independence test on the mktsegment × orderpriority
    // contingency table (customer ⋈ orders). The fact join shuffles once
    // on custkey, the contingency agg map-combines to r*c = 25 rows, and
    // everything after (row/col totals, expected counts, the chi2 fold)
    // is windowing over that 25-row table — driver-safe at any corpus
    // size. Cell contributions fold in sorted (segment, priority) order
    // so Spark and DuckDB add the same IEEE sequence.
    "q_chisq" -> ((s, dir) => {
      val cells = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col(S).as("seg"), col(P).as("pri"))
        .agg(count(lit(1)).as("cnt"))
      val withTotals = cells
        .withColumn("rowtot", sum("cnt").over(Window.partitionBy("seg")))
        .withColumn("coltot", sum("cnt").over(Window.partitionBy("pri")))
        .withColumn("n", sum("cnt").over(Window.partitionBy()))
        .withColumn("r", size(collect_set("seg").over(Window.partitionBy())))
        .withColumn("c", size(collect_set("pri").over(Window.partitionBy())))
        .withColumn("e",
          (col("rowtot") * col("coltot")).cast(DoubleType) / col("n"))
        .withColumn("d", col("cnt").cast(DoubleType) - col("e"))
        .withColumn("contrib", col("d") * col("d") / col("e"))
      withTotals
        .groupBy("n", "r", "c")
        .agg(sort_array(collect_list(struct(col("seg"), col("pri"),
          col("contrib")))).as("cl"))
        .select(col("n"),
          ((col("r") - 1) * (col("c") - 1)).cast(LongType).as("dof"),
          least(col("r") - 1, col("c") - 1).cast(LongType).as("k"),
          // round(,6): the 25-term double fold is ordered identically on
          // both engines, but last-ulp division behavior can still differ
          // across DuckDB builds — surface only the rounded statistic and
          // derive Cramer's V from the ROUNDED chi2 so both engines feed
          // sqrt the same double
          round(aggregate(col("cl"), lit(0.0), (acc, x) => acc + x("contrib")),
            6).as("chi2"))
        .withColumn("cramers_v", round(sqrt(col("chi2") / (col("n") * col("k"))), 6))
        .drop("k")
    }),

    // Welch's two-sample t-test: does BUILDING spend differently from
    // AUTOMOBILE per order? Group moments (n, Σx, Σx²) are ONE
    // map-combined shuffle with exact-decimal partials (x² is an exact
    // IEEE product; the decimal cast rounds it identically in both
    // engines), then the t statistic is closed-form on a 2-row table.
    // This is the moments-then-formula shape every significance test
    // takes at 100 TB — raw values never leave their partitions.
    "q_ttest" -> ((s, dir) => {
      val m = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col(S).isin("BUILDING", "AUTOMOBILE"))
        .groupBy(col(S).as("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 6))).as("sx"),
          sum((col("o_totalprice") * col("o_totalprice"))
            .cast(DecimalType(38, 10))).as("sxx"))
        .select(col("seg"), col("n"),
          (col("sx").cast(DoubleType) / col("n")).as("m"),
          ((col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType) / col("n"))
            / (col("n") - 1)).as("v"))
      val w = m.groupBy().agg(
        max(when(col("seg") === "BUILDING", col("n"))).as("n1"),
        max(when(col("seg") === "BUILDING", col("m"))).as("mean1"),
        max(when(col("seg") === "BUILDING", col("v"))).as("v1"),
        max(when(col("seg") === "AUTOMOBILE", col("n"))).as("n2"),
        max(when(col("seg") === "AUTOMOBILE", col("m"))).as("mean2"),
        max(when(col("seg") === "AUTOMOBILE", col("v"))).as("v2"))
      w.withColumn("se1", col("v1") / col("n1"))
        .withColumn("se2", col("v2") / col("n2"))
        .withColumn("se", col("se1") + col("se2"))
        .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
          round((col("mean1") - col("mean2")) / sqrt(col("se")), 6)
            .as("t_stat"),
          round(col("se") * col("se") /
            (col("se1") * col("se1") / (col("n1") - 1) +
              col("se2") * col("se2") / (col("n2") - 1)), 6).as("welch_df"))
    }),

    // Winsorization: clip o_totalprice into its exact [p01, p99] band,
    // then report the per-priority mean of the clipped column. Two
    // corpus passes (global percentile agg → broadcast 1-row bounds back
    // onto the stream); percentile uses the same type-7 interpolation as
    // DuckDB quantile_cont, and the clipped doubles stage through
    // decimal(18,6) so the per-group sums are order-independent. The
    // robust-mean shape for heavy-tailed quality metrics at corpus scale.
    "q_winsorize" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val bounds = o.agg(
        expr("percentile(o_totalprice, 0.01)").as("p01"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      o.crossJoin(broadcast(bounds))
        .withColumn("clipped",
          least(greatest(col("o_totalprice"), col("p01")), col("p99")))
        .groupBy(col(P).as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_totalprice") < col("p01"), 1L).otherwise(0L))
            .as("n_clip_low"),
          sum(when(col("o_totalprice") > col("p99"), 1L).otherwise(0L))
            .as("n_clip_high"),
          sum(col("clipped").cast(DecimalType(18, 6))).as("sc"))
        .select(col("priority"), col("n"), col("n_clip_low"),
          col("n_clip_high"),
          (col("sc").cast(DoubleType) / col("n")).as("winsorized_mean"))
    }),

    // Mean imputation: a deterministic missingness rule (every 7th
    // event's value withheld) is filled with the per-event-type mean of
    // the PRESENT values, and the result is proven by re-aggregating the
    // imputed column. Means are a dimension-sized broadcast back onto
    // the stream (corpus never reshuffles); the imputed doubles stage
    // through decimal(18,6) so the proof sum is order-independent.
    "q_impute" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .withColumn("v",
          when(col("event_id") % 7 === 0, lit(null).cast(DoubleType))
            .otherwise(col("value")))
      val means = ev.groupBy(col("event_type"))
        .agg((sum(col("v").cast(DecimalType(18, 6))).cast(DoubleType) /
          count(col("v"))).as("mean_present"))
      ev.join(broadcast(means), Seq("event_type"))
        .withColumn("imputed", coalesce(col("v"), col("mean_present")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_missing"),
          max(col("mean_present")).as("mean_present"),
          sum(col("imputed").cast(DecimalType(18, 6))).cast(DoubleType)
            .as("sum_imputed"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q_chisq" ->
      """WITH cells AS (
           SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             count(*) AS cnt
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         t AS (
           SELECT seg, pri, cnt,
             sum(cnt) OVER (PARTITION BY seg) AS rowtot,
             sum(cnt) OVER (PARTITION BY pri) AS coltot,
             sum(cnt) OVER () AS n,
             (SELECT count(DISTINCT seg) FROM cells) AS r,
             (SELECT count(DISTINCT pri) FROM cells) AS c
           FROM cells),
         u AS (
           SELECT seg, pri, n, r, c,
             CAST(cnt AS DOUBLE) - CAST(rowtot * coltot AS DOUBLE) / n AS d,
             CAST(rowtot * coltot AS DOUBLE) / n AS e
           FROM t),
         f AS (
           SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
             CAST(least(r - 1, c - 1) AS BIGINT) AS k,
             round(list_reduce(list_prepend(0.0,
               list(d * d / e ORDER BY seg, pri)), (a, b) -> a + b), 6) AS chi2
           FROM u GROUP BY n, r, c)
         SELECT CAST(n AS BIGINT) AS n, dof, chi2,
           round(sqrt(chi2 / (n * k)), 6) AS cramers_v
         FROM f""",

    "q_ttest" ->
      """WITH m AS (
           SELECT c_mktsegment AS seg, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,10)))
               AS DOUBLE) AS sxx
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           GROUP BY 1),
         v AS (
           SELECT seg, n, sx / n AS mean,
             (sxx - sx * sx / n) / (n - 1) AS var
           FROM m),
         w AS (
           SELECT
             max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
             max(CASE WHEN seg = 'BUILDING' THEN mean END) AS mean1,
             max(CASE WHEN seg = 'BUILDING' THEN var END) AS v1,
             max(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS n2,
             max(CASE WHEN seg = 'AUTOMOBILE' THEN mean END) AS mean2,
             max(CASE WHEN seg = 'AUTOMOBILE' THEN var END) AS v2
           FROM v),
         se AS (
           SELECT n1, n2, mean1, mean2, v1 / n1 AS se1, v2 / n2 AS se2,
             v1 / n1 + v2 / n2 AS se
           FROM w)
         SELECT n1, n2, mean1, mean2,
           round((mean1 - mean2) / sqrt(se), 6) AS t_stat,
           round(se * se /
             (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 6) AS welch_df
         FROM se""",

    "q_winsorize" ->
      """WITH b AS (
           SELECT quantile_cont(o_totalprice, 0.01) AS p01,
             quantile_cont(o_totalprice, 0.99) AS p99
           FROM orders)
         SELECT o_orderpriority AS priority, count(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice < p01 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN o_totalprice > p99 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_high,
           CAST(SUM(CAST(least(greatest(o_totalprice, p01), p99)
             AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS winsorized_mean
         FROM orders, b
         GROUP BY 1""",

    "q_impute" ->
      """WITH ev AS (
           SELECT event_type,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
           FROM events),
         m AS (
           SELECT event_type,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(v)
               AS mean_present
           FROM ev GROUP BY 1)
         SELECT ev.event_type, count(*) AS n,
           CAST(SUM(CASE WHEN ev.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing,
           max(m.mean_present) AS mean_present,
           CAST(SUM(CAST(coalesce(ev.v, m.mean_present) AS DECIMAL(18,6)))
             AS DOUBLE) AS sum_imputed
         FROM ev JOIN m USING (event_type)
         GROUP BY 1"""
  )
}
