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

  test("ks_2samp: distributed prefix-sum ECDF equals the brute-force D") {
    val r = Stats.queries("q_ks_2samp")(spark, sf0001).collect().head
    val (n1, n2, d) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Double]("ks_d"))
    // brute force on the collected fixture
    val rows = Tables(spark, sf0001, "orders")
      .select("o_totalprice", "o_orderpriority").collect()
      .map(x => (x.getDouble(0), x.getString(1) == "1-URGENT"))
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    assert(n1 === a.length.toLong && n2 === b.length.toLong)
    val brute = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length
        - b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(d - brute) < 1e-6, s"ks_d $d vs brute $brute")
    assert(d > 0.0 && d < 1.0)
  }

  test("js divergence: bounded by ln 2, zero against itself") {
    val r = Stats.queries("q_js_divergence")(spark, sf0001).collect().head
    val jsd = r.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9,
      s"JSD $jsd outside [0, ln 2]")
    // brute-force recompute from the fixture
    val toks = Tables(spark, sf0001, "documents").select("doc_id", "text")
      .collect().flatMap { x =>
        x.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(w => (x.getLong(0) % 2, math.min(w.length, 20)))
      }
    val h0 = toks.filter(_._1 == 0).groupBy(_._2).map { case (k, g) => k -> g.length }
    val h1 = toks.filter(_._1 == 1).groupBy(_._2).map { case (k, g) => k -> g.length }
    val (t0, t1) = (h0.values.sum.toDouble, h1.values.sum.toDouble)
    val brute = (h0.keySet ++ h1.keySet).toSeq.sorted.map { k =>
      val p = h0.getOrElse(k, 0) / t0
      val q = h1.getOrElse(k, 0) / t1
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
        (if (q > 0) q * math.log(q / m) / 2 else 0.0)
    }.sum
    assert(math.abs(jsd - brute) < 1e-6, s"jsd $jsd vs brute $brute")
  }

  test("mutual information: non-negative and bounded by min marginal entropy") {
    val r = Stats.queries("q_mutual_info")(spark, sf0001).collect().head
    val mi = r.getAs[Double]("mi_nats")
    assert(mi >= 0.0, s"MI must be non-negative, got $mi")
    val docs = Tables(spark, sf0001, "documents").select("lang", "source")
      .collect().map(x => (x.getString(0), x.getString(1)))
    val n = docs.length.toDouble
    def entropy(xs: Iterable[Int]): Double =
      xs.map(c => { val p = c / n; -p * math.log(p) }).sum
    val hLang = entropy(docs.groupBy(_._1).map(_._2.length))
    val hSrc = entropy(docs.groupBy(_._2).map(_._2.length))
    assert(mi <= math.min(hLang, hSrc) + 1e-9,
      s"MI $mi exceeds min marginal entropy ${math.min(hLang, hSrc)}")
    // brute force
    val brute = docs.groupBy(identity).map { case ((l, s2), g) =>
      val pxy = g.length / n
      val px = docs.count(_._1 == l) / n
      val py = docs.count(_._2 == s2) / n
      pxy * math.log(pxy / (px * py))
    }.sum
    assert(math.abs(mi - brute) < 1e-6, s"mi $mi vs brute $brute")
  }

  test("domain cap: kept set is exactly the 50 lowest md5 buckets per source") {
    val rows = graft.operators.Text.queries("q_domain_cap")(spark, sf0001)
      .collect()
    val docs = Tables(spark, sf0001, "documents").select("doc_id", "source")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val inSrc = docs.filter(_._2 == src).map(_._1)
      assert(r.getAs[Long]("n_total") === inSrc.length.toLong)
      val kept = inSrc.sortBy(id => (h(id), id)).take(50)
      assert(r.getAs[Long]("n_kept") === kept.length.toLong)
      assert(r.getAs[Long]("kept_docid_sum") === kept.sum)
    }
    assert(rows.map(_.getAs[Long]("n_total")).sum === docs.length.toLong)
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

  test("trend_robust: S bounds, pair count, and brute-force agreement") {
    val r = Stats.queries("q_trend_robust")(spark, sf0001).collect().head
    val n = r.getAs[Long]("n")
    val nPairs = r.getAs[Long]("n_pairs")
    val sStat = r.getAs[Long]("mk_s")
    assert(nPairs === n * (n - 1) / 2)
    assert(math.abs(sStat) <= nPairs)
    // brute force from the collected daily series — slopes over CALENDAR
    // day gaps (epoch days), matching the estimator's time axis
    val series = Tables(spark, sf0001, "events")
      .groupBy(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd").as("day"))
      .count().collect().sortBy(_.getString(0))
      .map(r => (java.time.LocalDate.parse(r.getString(0)).toEpochDay,
        r.getLong(1)))
    val brute = (for (i <- series.indices; j <- i + 1 until series.length)
      yield java.lang.Long.signum(series(j)._2 - series(i)._2).toLong).sum
    assert(sStat === brute, s"MK S $sStat vs brute $brute")
    val slopes = (for (i <- series.indices; j <- i + 1 until series.length)
      yield (series(j)._2 - series(i)._2).toDouble /
        (series(j)._1 - series(i)._1)).sorted
    // type-7 median of the pairwise slopes
    val m = slopes.length
    val med = if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
    assert(math.abs(r.getAs[Double]("theil_sen_slope") - med) < 1e-6)
  }

  test("psi: decile bins partition both halves; same-distribution PSI is stable") {
    val rows = Stats.queries("q_psi")(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("bin")).sorted === (1L to 10L))
    val n = Tables(spark, sf0001, "orders").count()
    assert(rows.map(r => r.getAs[Long]("c0") + r.getAs[Long]("c1")).sum === n)
    // getAs[Double] silently unboxes NULL to 0.0 — if the zero-cell
    // sentinel (NULL psi_term) ever appears on this fixture, fail loudly
    // instead of letting the stability law pass vacuously
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("psi_term")),
      s"NULL psi_term in bin ${r.getAs[Long]("bin")} — zero cell on the fixture"))
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi >= 0.0, "each (p-q)ln(p/q) term is non-negative")
    // the two halves are the SAME distribution, so PSI must sit far
    // below the 0.1 drift-alert threshold
    assert(psi < 0.05, s"PSI $psi implausibly high for identical halves")
  }

  test("bootstrap_ci: interval brackets the point estimate, width is sane") {
    val r = Stats.queries("q_bootstrap_ci")(spark, sf0001).collect().head
    val (mean, lo, hi) = (r.getAs[Double]("mean_x"),
      r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"))
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] must bracket the point estimate $mean")
    // Poisson(1) weights: CI half-width should be within ~6 sigma/sqrt(n)
    // of the classical SE (weights add variance but stay the same order)
    val stats = Tables(spark, sf0001, "orders")
      .selectExpr("avg(o_totalprice) m", "stddev_pop(o_totalprice) sd",
        "count(*) n").collect().head
    val se = stats.getDouble(1) / math.sqrt(stats.getLong(2).toDouble)
    assert(hi - lo < 12 * se, s"CI width ${hi - lo} vs se $se implausible")
    assert(hi - lo > se, s"CI width ${hi - lo} suspiciously tight vs se $se")
  }

  test("ab_test: counts partition users; z matches the closed form") {
    import org.apache.spark.sql.functions._
    val r = Stats.queries("q_ab_test")(spark, sf0001).collect().head
    val (n1, c1, n2, c2) = (r.getAs[Long]("n1"), r.getAs[Long]("c1"),
      r.getAs[Long]("n2"), r.getAs[Long]("c2"))
    val nUsers = Tables(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(n1 + n2 === nUsers)
    assert(c1 <= n1 && c2 <= n2)
    assert(c1 > 0 && c2 > 0 && (c1 < n1 || c2 < n2),
      "fixture must be non-degenerate for a finite z")
    val p1 = c1.toDouble / n1; val p2 = c2.toDouble / n2
    val pp = (c1 + c2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-5)
  }

  test("survival_km: S is a monotone step function with the KM first step") {
    val rows = Stats.queries("q_survival_km")(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("dur_hours"))
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Double]("s_km"))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-9 },
      "survival must be non-increasing")
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => b <= a },
      "at-risk count must shrink with duration")
    val h = rows.head
    val expected = 1.0 - h.getAs[Long]("n_events").toDouble / h.getAs[Long]("n_risk")
    assert(math.abs(s.head - expected) < 1e-6,
      s"first step ${s.head} != 1 - d/n = $expected")
  }

  test("changepoint: CUSUM telescopes to ~0 and flags exactly one day") {
    val rows = Stats.queries("q_changepoint")(spark, sf0001).collect()
      .sortBy(_.getAs[String]("day"))
    assert(rows.nonEmpty)
    // Σ(x_t - mean) over the whole series is 0 by construction, so the
    // final cusum is 0 up to the round(,6) and the mean's last-ulp
    assert(math.abs(rows.last.getAs[Double]("cusum")) < 1e-4,
      s"final cusum ${rows.last.getAs[Double]("cusum")} should telescope to 0")
    val flagged = rows.filter(_.getAs[Long]("is_changepoint") == 1L)
    assert(flagged.length === 1, s"expected one changepoint, got ${flagged.length}")
    // the flagged day attains the max |cusum|
    val maxAbs = rows.map(r => math.abs(r.getAs[Double]("cusum"))).max
    assert(math.abs(flagged.head.getAs[Double]("cusum")).abs === maxAbs)
  }
}
