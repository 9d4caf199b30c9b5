package graft

import graft.operators.Mining

/** Domain laws for the behavioral-mining queries (DuckDB parity is the
  * primary gate; these pin internal invariants + brute-force equality
  * where the distributed plan takes a shortcut the law can check).
  */
class MiningSpec extends SparkSpec {

  test("assoc_rules: support/confidence/lift laws + brute-force pair parity") {
    val rules = Mining.queries("q_assoc_rules")(spark, sf0001).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val sup = r.getAs[Long]("support_cnt")
      val conf = r.getAs[Double]("confidence")
      val lift = r.getAs[Double]("lift")
      assert(sup >= 3L)
      assert(conf > 0.0 && conf <= 1.0, s"confidence $conf out of (0,1]")
      assert(lift > 0.0)
    }
    // rules come in mirrored pairs with the same support
    val bySup = rules.groupBy(r => {
      val a = r.getAs[Long]("antecedent"); val c = r.getAs[Long]("consequent")
      (math.min(a, c), math.max(a, c))
    })
    assert(bySup.values.forall(_.length == 2))
    // brute-force pair count on the collected fixture equals the plan's
    val baskets = Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val brute = baskets.flatMap(items =>
      for (i <- items.indices; j <- i + 1 until items.length)
        yield (items(i), items(j)))
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3).toMap
    assert(bySup.keySet === brute.keySet)
    bySup.foreach { case (k, rs) =>
      assert(rs.head.getAs[Long]("support_cnt") === brute(k).toLong) }
  }

  test("funnel: step counts are monotone non-increasing") {
    val r = Mining.queries("q_funnel_steps")(spark, sf0001).collect().head
    val nU = r.getAs[Long]("n_users")
    val nV = r.getAs[Long]("n_viewed")
    val nC = r.getAs[Long]("n_clicked")
    val nP = r.getAs[Long]("n_purchased")
    assert(nV <= nU && nC <= nV && nP <= nC,
      s"funnel not monotone: $nU >= $nV >= $nC >= $nP")
    assert(nV > 0 && nP > 0, "fixture funnel should have converters")
  }

  test("attribution: purchase conservation and value totals") {
    import org.apache.spark.sql.functions._
    val rows = Mining.queries("q_attribution")(spark, sf0001).collect()
    val ev = Tables(spark, sf0001, "events")
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch,
      "every purchase must be attributed exactly once (incl. 'none')")
    val total = ev.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double")).collect()(0).getDouble(0)
    val attributed = rows.map(_.getAs[Double]("attributed_value")).sum
    assert(math.abs(attributed - total) < 1e-6,
      s"value not conserved: $attributed vs $total")
    assert(!rows.map(_.getAs[String]("touch_type")).contains("purchase"),
      "a purchase can never be its own touch")
  }

  test("acf: lag-0 normalization means every |acf| is bounded by ~1") {
    val rows = Mining.queries("q_acf")(spark, sf0001).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      // Cauchy-Schwarz on the truncated sums keeps |r_k| near <=1; the
      // truncation can push it epsilon over, never materially
      assert(math.abs(acf) <= 1.05, s"acf ${r.getAs[Int]("lag")} = $acf")
    }
    // 30-day fixture: lag k pairs = 30 - k days
    val byLag = rows.map(r => r.getAs[Int]("lag") -> r.getAs[Long]("n_pairs")).toMap
    assert(byLag(1) === byLag(7) + 6)
  }

  test("rfm: segment counts partition the customer base; scores in 1..4") {
    val rows = Mining.queries("q_rfm")(spark, sf0001).collect()
    val nCust = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCust)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 4L, s"$c = $v out of 1..4")
      }
    }
    // quartile scoring: each score class of each metric holds <= ~n/4 + ties
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val per = rows.groupBy(_.getAs[Long](c)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum)
      per.foreach { case (s, n) =>
        assert(n <= nCust * 0.55, s"$c=$s holds $n of $nCust — not a quartile") }
    }
  }

  test("lorenz: cumulative share is monotone to 1.0; deciles partition suppliers") {
    val rows = Mining.queries("q_lorenz")(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")) === (1L to rows.length))
    val cum = rows.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cum.last - 1.0) < 1e-6)
    val shares = rows.map(_.getAs[Double]("rev_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    // ascending-revenue deciles: shares must be non-decreasing too
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("markov_stationary: pi is a probability vector over the event states") {
    val rows = Mining.queries("q_markov_stationary")(spark, sf0001).collect()
    val pis = rows.map(_.getAs[Double]("pi"))
    assert(pis.forall(_ > 0.0))
    // each power iteration preserves mass (rows of P sum to 1), so pi
    // sums to 1 up to the per-iteration round(,12) and final round(,6)
    assert(math.abs(pis.sum - 1.0) < 1e-4, s"pi mass ${pis.sum}")
    assert(rows.map(_.getAs[String]("state")).distinct.length === rows.length)
  }

  test("gini: bounds and brute-force equality") {
    val r = Mining.queries("q_gini")(spark, sf0001).collect().head
    val n = r.getAs[Long]("n_suppliers")
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g <= 1.0 - 1.0 / n)
    // brute force from the collected per-supplier revenue
    val revs = Tables(spark, sf0001, "lineitem")
      .selectExpr("l_suppkey",
        "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)) AS r")
      .groupBy("l_suppkey").agg(org.apache.spark.sql.functions.sum("r").as("rev"))
      .collect().map(x => (x.getLong(0), x.getDecimal(1)))
      .sortBy(x => (x._2, x._1)).map(_._2.doubleValue())
    val tot = revs.sum
    val s1 = revs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val brute = (2 * s1 - (n + 1) * tot) / (n * tot)
    assert(math.abs(g - brute) < 1e-6, s"gini $g vs brute $brute")
  }

  test("benford: digits 1..9 present, fractions sum to 1") {
    val rows = Mining.queries("q_benford")(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("digit")).sorted === (1L to 9L))
    val obs = rows.map(_.getAs[Double]("obs_frac")).sum
    val exp = rows.map(_.getAs[Double]("benford_frac")).sum
    assert(math.abs(obs - 1.0) < 1e-4)
    assert(math.abs(exp - 1.0) < 1e-4) // log10 telescope: sums to exactly 1
    val n = rows.map(_.getAs[Long]("cnt")).sum
    assert(n === Tables(spark, sf0001, "lineitem").count())
  }
}
