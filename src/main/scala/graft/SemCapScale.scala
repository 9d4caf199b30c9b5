package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The occupancy cap's worst-case bound, exercised on ADVERSARIAL dup
  * skew (one-time tool; round-12 verdict stretch): SemFlipScale's 128×
  * corpus spreads replicas near-uniformly, so the cap's value there was
  * mostly the cluster-partitioned layout; this driver builds the regime
  * the cap EXISTS for — 500 distinct sf0.1 vectors × 512 near-identical
  * copies (perturbation 1e-6 per replica) = 256k vectors, k = n/128 =
  * 2000 > ExactAssignMaxSeeds, where whole 512-cliques land in single
  * clusters and the uncapped prune's sum(occ²) is clique-quadratic.
  * Reports, for the uncapped IVF 2-probe vs the WIRED capped path
  * (`Dedup.assignToSeedsIvfCapped`, cap = 512):
  *   - occupancy stats (max / mean / sum(occ²)) before and after the
  *     cap, including post-spill max (the honest number: spill-ins are
  *     single-hop to the runner-up, so the bound is cap + spill-ins,
  *     not a hard cap — measured, not assumed). Round 14 made this the
  *     stated LAW (DedupSpec "occupancy cap's spill bound"): post-spill
  *     occupancy(c) == min(occ1(c), cap) + spillIns(c) EXACTLY, with a
  *     constructed counterexample showing no constant-factor hard bound
  *     exists under single-hop spill — every over-cap member can share
  *     one runner-up, so that cluster's occupancy grows with the spill
  *     volume (cap=1 hub absorbing 5 spill-ins = 6 > 2·cap). A hard
  *     bound would need iterated spill (a 3rd probe per displaced
  *     member), paying another broadcast pass for a regime the
  *     adversarial measurement below showed costs ~1% spill in
  *     practice — documented trade, not taken;
  *   - spill volume (vectors moved to their runner-up seed);
  *   - within-cluster prune wall-time on both assignments;
  *   - keep-set agreement between the two arms (the cap must not
  *     change semantics materially — r12 measured 0.993 vs exact).
  * Run: `sbt "runMain graft.SemCapScale [sfDir]"`.
  */
object SemCapScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-semcap-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    val distinctN = 500
    val factor = 512
    val e0 = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
      .filter(col("vec_id") % 4 === 0) // 500 of sf0.1's 2000 vectors
    val e = e0.crossJoin(spark.range(factor).toDF("rep"))
      .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x + (col("rep") * lit(1e-6)).cast("float")).cast("float"))
          .as("embedding"))
      .repartition(32).persist()
    val n = e.count()
    val k = Dedup.semanticK(n)
    println(s"[semcap] n=$n ($distinctN distinct x $factor copies) k=$k " +
      s"flip=${k > Dedup.ExactAssignMaxSeeds}")
    require(k > Dedup.ExactAssignMaxSeeds, "flip did not engage")
    val seeds = Dedup.semanticSeedsK(e, k).persist()
    seeds.count()
    val idx = Dedup.buildIvfSeedIndex(seeds, k)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semcap] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def occStats(a: DataFrame, label: String): Unit = {
      val o = a.groupBy("cluster_id").agg(count(lit(1)).as("occ"))
        .agg(max("occ"), avg("occ"), count(lit(1)),
          sum(col("occ") * col("occ")))
        .head()
      println(f"[semcap] occupancy $label: max=${o.getLong(0)} " +
        f"mean=${o.getDouble(1)}%.1f clusters=${o.getLong(2)} " +
        f"sum(occ^2)=${o.getLong(3)}")
    }

    val uncapped = timed("uncapped IVF 2-probe assignment") {
      val a = Dedup.assignToSeedsIvf(e, seeds, index = Some(idx)).persist()
      a.count(); a
    }
    occStats(uncapped, "uncapped")
    val keptU = timed("within-cluster prune (uncapped)") {
      val kdf = Dedup.semanticPruned(uncapped).filter(col("is_kept") === 1)
        .select("vec_id").persist()
      kdf.count(); kdf
    }

    val capped = timed("capped IVF assignment (wired path, cap=512)") {
      val a = Dedup.assignToSeedsIvfCapped(e, seeds, index = Some(idx))
        .persist()
      a.count(); a
    }
    occStats(capped, "capped(512)")
    val spilled = uncapped.select(col("vec_id"), col("cluster_id").as("cu"))
      .join(capped.select(col("vec_id"), col("cluster_id").as("cc")), "vec_id")
      .filter(col("cu") =!= col("cc")).count()
    println(s"[semcap] spilled to runner-up: $spilled / $n vectors")
    val keptC = timed("within-cluster prune (capped)") {
      val kdf = Dedup.semanticPruned(capped).filter(col("is_kept") === 1)
        .select("vec_id").persist()
      kdf.count(); kdf
    }

    val nU = keptU.count(); val nC = keptC.count()
    val both = keptU.join(keptC, "vec_id").count()
    val removedBoth = n - nU - nC + both
    println(f"[semcap] keeps: uncapped $nU, capped $nC, " +
      f"keep-decision agreement ${(both + removedBoth).toDouble / n}%.3f")
    spark.stop()
  }
}
