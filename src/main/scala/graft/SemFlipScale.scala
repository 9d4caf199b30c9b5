package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Live exercise of the adaptive assignment FLIP (one-time tool, not
  * part of the driver contract; round-11 verdict task 2): every harness
  * corpus tops out at k = 500 (64× door), so the k > ExactAssignMaxSeeds
  * = 1024 branch of `assignToSeedsAdaptive` had never executed
  * end-to-end. This builds a synthetic 128× embedding table from sf0.1
  * (2000 × 128 perturbed replicas = 256k vectors ⇒ k = n/128 = 2000 >
  * 1024 — the flip ENGAGES), then drives q_dedup_semantic's full path —
  * adaptive assignment, orphan/fallback accounting, within-cluster
  * prune — on BOTH arms (exact broadcast vs the flipped IVF 2-probe),
  * reporting wall-times, assignment agreement, keep-decision agreement,
  * removal recall (of the exact run's removed set, how much the IVF run
  * also removes), and the Top2 door-arm wall. Fallback volume is
  * re-derived independently from the PUBLIC IvfSeedIndex (every coarse
  * cell contains at least its own defining seed, so zero-candidate
  * orphans are structurally impossible; <2-candidate Top2 fallbacks are
  * possible and counted). Results recorded in SCALE.md round-12.
  * Run: `sbt "runMain graft.SemFlipScale [sfDir]"`.
  */
object SemFlipScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-semflip-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    val e0 = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val factor = 128
    val e = (0 until factor).map { i =>
      e0.select((col("vec_id") + lit(10000000L * i)).as("vec_id"),
        transform(col("embedding"), x => (x + lit(i * 1e-4f)).cast("float"))
          .as("embedding"))
    }.reduce(_ unionByName _).repartition(32).persist()
    val n = e.count()
    val k = Dedup.semanticK(n)
    println(s"[semflip] n=$n k=$k flip=${k > Dedup.ExactAssignMaxSeeds} " +
      s"(threshold ${Dedup.ExactAssignMaxSeeds})")
    require(k > Dedup.ExactAssignMaxSeeds, "flip did not engage — raise factor")
    val seeds = Dedup.semanticSeedsK(e, k).persist()
    seeds.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semflip] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // arm 1: exact broadcast (the k <= 1024 plan, forced)
    val exact = timed("exact assignment (n x k cosines)") {
      val a = Dedup.assignToSeeds(e, seeds).persist(); a.count(); a
    }
    // arm 2: the raw (uncapped) IVF 2-probe — kept DIRECT so the tool
    // still measures the uncapped baseline after assignToSeedsAdaptive
    // was rewired to the occupancy-capped path (round 12)
    val ivf = timed("uncapped IVF 2-probe (assignToSeedsIvf direct)") {
      val a = Dedup.assignToSeedsIvf(e, seeds).persist()
      a.count(); a
    }
    // arm 2b: what q_dedup_semantic actually runs at this k — the WIRED
    // adaptive path (occupancy-capped IVF beyond the threshold)
    timed("ADAPTIVE assignment (wired: capped IVF)") {
      Dedup.assignToSeedsAdaptive(e, seeds, k).count()
    }
    val agree = exact.select(col("vec_id"), col("cluster_id").as("ce"))
      .join(ivf.select(col("vec_id"), col("cluster_id").as("ci")), "vec_id")
      .agg(avg((col("ce") === col("ci")).cast("double")), count(lit(1)))
      .head()
    println(f"[semflip] assignment agreement: ${agree.getDouble(0)}%.3f " +
      s"over ${agree.getLong(1)} vectors (totality: ${agree.getLong(1) == n})")

    // fallback-volume accounting from the public index: per-vector
    // distinct candidate seeds across the 2 probed cells
    val idx = Dedup.buildIvfSeedIndex(seeds, k)
    val vcells = e.crossJoin(broadcast(idx.coarse))
      .select(col("vec_id"), col("c_id"),
        call_function("cosine_sim", col("embedding"), col("c_emb")).as("vc"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("vc").desc, col("c_id"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id"), col("c_id").as("cell"))
    val candPerVec = vcells.join(idx.seedCell.select("seed_id", "cell"), "cell")
      .groupBy("vec_id").agg(countDistinct(col("seed_id")).as("nc"))
      .persist()
    val covered = candPerVec.count()
    val under2 = candPerVec.filter(col("nc") < 2).count()
    println(s"[semflip] candidate coverage: $covered/$n vectors with >= 1 " +
      s"candidate seed (zero-candidate orphans: ${n - covered}); " +
      s"Top2 fallback volume (< 2 candidates): $under2")

    // full q_dedup_semantic second stage on both arms
    val keptEx = timed("within-cluster prune (exact arm)") {
      val kdf = Dedup.semanticPruned(exact).filter(col("is_kept") === 1)
        .select("vec_id").persist()
      kdf.count(); kdf
    }
    val keptIvf = timed("within-cluster prune (IVF arm)") {
      val kdf = Dedup.semanticPruned(ivf).filter(col("is_kept") === 1)
        .select("vec_id").persist()
      kdf.count(); kdf
    }
    val nKeptEx = keptEx.count(); val nKeptIvf = keptIvf.count()
    val keptBoth = keptEx.join(keptIvf, "vec_id").count()
    val removedEx = n - nKeptEx
    val removedIvf = n - nKeptIvf
    val removedBoth = n - nKeptEx - nKeptIvf + keptBoth
    println(f"[semflip] keep decisions: exact keeps $nKeptEx, IVF keeps " +
      f"$nKeptIvf, agreement ${(keptBoth + removedBoth).toDouble / n}%.3f; " +
      f"removal recall (IVF removes ${removedBoth}/${removedEx} of exact's " +
      f"removed set) = ${removedBoth.toDouble / removedEx}%.3f " +
      f"(IVF extra removals: ${removedIvf - removedBoth})")

    // door arm: the per-batch Top2 assignment at this k (index prebuilt
    // once, as the door does)
    timed("Top2Adaptive (door arm, prebuilt index)") {
      Dedup.assignToSeedsTop2Adaptive(e, seeds, k, Some(idx)).count()
    }

    // CANDIDATE MITIGATION for the prune-skew surprise (coarse-cell
    // geometry concentrates IVF assignments into fewer, larger clusters
    // and the within-cluster prune's sum(cluster²) grows): cap cluster
    // occupancy at 4× the design width (512) by spilling each over-full
    // cluster's FARTHEST members (lowest centroid cos — the likeliest
    // misassignments) to their runner-up seed, then prune on the capped
    // assignment. Measured before any wiring.
    {
      def occStats(a: org.apache.spark.sql.DataFrame, label: String): Unit = {
        val o = a.groupBy("cluster_id").agg(count(lit(1)).as("occ"))
          .agg(max("occ"), avg("occ"), count(lit(1)),
            sum(col("occ") * col("occ")))
          .head()
        println(f"[semflip] occupancy $label: max=${o.getLong(0)} " +
          f"mean=${o.getDouble(1)}%.1f clusters=${o.getLong(2)} " +
          f"sum(occ^2)=${o.getLong(3)}")
      }
      occStats(exact, "exact")
      occStats(ivf, "ivf-2probe-uncapped")
      val cap = 512
      val top2 = Dedup.assignToSeedsIvfTop2(e, seeds, index = Some(idx))
        .persist()
      top2.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(col("centroid_cos").desc, col("vec_id"))
      val spilled = top2.withColumn("rk", row_number().over(w))
        .withColumn("fin",
          when(col("rk") <= cap, col("cluster_id"))
            .otherwise(col("cluster2_id")))
      // spilled members need their cos vs the NEW seed for the keep rule
      val capped = spilled
        .join(broadcast(seeds), col("fin") === col("seed_id"))
        .select(col("vec_id"), col("embedding"),
          col("fin").as("cluster_id"),
          when(col("rk") <= cap, col("centroid_cos"))
            .otherwise(call_function("cosine_sim",
              col("embedding"), col("s_emb"))).as("centroid_cos"))
        .persist()
      val nSpilled = spilled.filter(col("rk") > cap).count()
      println(s"[semflip] cap=$cap: spilled $nSpilled vectors to runner-up")
      occStats(capped, s"ivf-capped($cap)")
      val keptCap = timed("within-cluster prune (capped IVF arm)") {
        val kdf = Dedup.semanticPruned(capped).filter(col("is_kept") === 1)
          .select("vec_id").persist()
        kdf.count(); kdf
      }
      val nKeptCap = keptCap.count()
      val keptBothC = keptEx.join(keptCap, "vec_id").count()
      val removedBothC = n - nKeptEx - nKeptCap + keptBothC
      println(f"[semflip] capped keep decisions: keeps $nKeptCap, " +
        f"agreement vs exact ${(keptBothC + removedBothC).toDouble / n}%.3f; " +
        f"removal recall ${removedBothC.toDouble / removedEx}%.3f")
    }
    spark.stop()
  }
}
