package graft

import graft.operators.Stats

/** Domain laws for the statistical-test queries (DuckDB parity is the
  * primary gate; these pin the statistics' internal invariants).
  */
class StatsSpec extends SparkSpec {

  test("chisq: dof and bounds hold on the fixture contingency table") {
    val r = Stats.queries("q_chisq")(spark, sf0001).collect().head
    val n = r.getAs[Long]("n")
    val dof = r.getAs[Long]("dof")
    val chi2 = r.getAs[Double]("chi2")
    val v = r.getAs[Double]("cramers_v")
    assert(dof === 16L) // 5 segments x 5 priorities
    assert(chi2 >= 0.0)
    // chi2 is bounded by n * min(r-1, c-1); Cramer's v therefore in [0,1]
    assert(chi2 <= n * 4.0)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("ttest: Welch df lies between min(n)-1 and pooled df") {
    val r = Stats.queries("q_ttest")(spark, sf0001).collect().head
    val n1 = r.getAs[Long]("n1")
    val n2 = r.getAs[Long]("n2")
    val df = r.getAs[Double]("welch_df")
    assert(df >= math.min(n1, n2) - 1.0 && df <= n1 + n2 - 2.0,
      s"welch df $df outside [${math.min(n1, n2) - 1}, ${n1 + n2 - 2}]")
  }

  test("winsorize: clip counts stay within the 1% tails") {
    val rows = Stats.queries("q_winsorize")(spark, sf0001).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    val lo = rows.map(_.getAs[Long]("n_clip_low")).sum
    val hi = rows.map(_.getAs[Long]("n_clip_high")).sum
    assert(lo > 0 && hi > 0, "1% tails must be non-empty on 1500 orders")
    // type-7 quantiles put at most ~1% of rows strictly outside each bound
    assert(lo <= n / 50 && hi <= n / 50, s"clipped too much: $lo/$hi of $n")
  }

  test("impute: missingness rule and mean-fill reconcile exactly") {
    val rows = Stats.queries("q_impute")(spark, sf0001).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val miss = r.getAs[Long]("n_missing")
      assert(miss > 0 && miss < n)
      // sum after imputation ~= mean * n when mean fills the holes:
      // |sum - n*mean| is bounded by the present values' spread around
      // the mean — weak sanity only; exact value is the oracle's job.
      assert(r.getAs[Double]("sum_imputed") > 0.0)
    }
  }
}
