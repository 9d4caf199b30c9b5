package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup recall-vs-k diagnostic (one-time tool, not part of the
  * driver contract): the probe ladder (SCALE.md round-10) fixed k at
  * n/128 and varied probe count; this varies the OTHER production
  * lever — the cluster count itself — and measures 1-/2-probe recall
  * against the brute-force pair ground truth (tau = 0.4, the
  * q_dedup_semantic_recall definition) at k = n/128, n/64, n/32.
  * Smaller clusters = more clusters = fewer boundary-straddling pairs
  * caught? More: a pair is caught iff both members land in (or probe
  * into) the same cluster, so recall falls as k RISES — the measured
  * trade is recall vs the within-cluster pairwise cost n·(n/k)/2.
  * Run: `sbt "runMain graft.SemKScale [sfDir]"`; table in SCALE.md.
  */
object SemKScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-semk-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val n = e.count()
    for (div <- Seq(128L, 64L, 32L)) {
      val k = math.max(8L, n / div).toInt
      val t0 = System.nanoTime()
      val a = Dedup.assignToSeedsTop2(e, Dedup.semanticSeedsK(e, k))
        .persist()
      val l = a.select(col("vec_id").as("vid_a"), col("embedding").as("emb_a"),
        col("cluster_id").as("cl_a"), col("cluster2_id").as("cl2_a"))
      val r = a.select(col("vec_id").as("vid_b"), col("embedding").as("emb_b"),
        col("cluster_id").as("cl_b"), col("cluster2_id").as("cl2_b"))
      val row = l.join(r, col("vid_a") < col("vid_b"))
        .filter(call_function("cosine_sim", col("emb_a"), col("emb_b")) >= 0.4)
        .select((col("cl_a") === col("cl_b")).cast("long").as("d1"),
          (col("cl_a") === col("cl_b") || col("cl2_a") === col("cl_b") ||
            col("cl_a") === col("cl2_b")).cast("long").as("d2"))
        .agg(count(lit(1)), sum(col("d1")), sum(col("d2")))
        .head()
      val (np, d1, d2) = (row.getLong(0), row.getLong(1), row.getLong(2))
      a.unpersist()
      println(f"[semk] n=$n k=$k (n/$div): true_pairs=$np " +
        f"recall_1p=${d1.toDouble / np}%.3f recall_2p=${d2.toDouble / np}%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
