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

    // UNION lever (round-10 verdict suggestion): OR the 2-probe cluster
    // candidates with hyperplane band collisions (the q_dedup_embedding
    // candidate machinery) — does the banded family rescue pairs the
    // cluster partition splits?
    {
      val t0 = System.nanoTime()
      val k = math.max(8L, n / 128L).toInt
      val a = Dedup.assignToSeedsTop2(e, Dedup.semanticSeedsK(e, k))
        .withColumn("code", call_function("hyperplane_bits", col("embedding")))
        .persist()
      val bits = graft.operators.Lsh.bandBits(n)
      val bands = graft.operators.Lsh.explodeBands(
        a.select(col("vec_id"), col("code")), "code", bits)
      val coll = bands.select(col("vec_id").as("vid_a"), col("band"), col("bv"))
        .join(bands.select(col("vec_id").as("vid_b"), col("band"), col("bv")),
          Seq("band", "bv"))
        .filter(col("vid_a") < col("vid_b"))
        .select("vid_a", "vid_b").distinct()
        .withColumn("band_hit", lit(1L))
      val l = a.select(col("vec_id").as("vid_a"), col("embedding").as("emb_a"),
        col("cluster_id").as("cl_a"), col("cluster2_id").as("cl2_a"))
      val r = a.select(col("vec_id").as("vid_b"), col("embedding").as("emb_b"),
        col("cluster_id").as("cl_b"), col("cluster2_id").as("cl2_b"))
      val row = l.join(r, col("vid_a") < col("vid_b"))
        .filter(call_function("cosine_sim", col("emb_a"), col("emb_b")) >= 0.4)
        .join(coll, Seq("vid_a", "vid_b"), "left")
        .select(
          (col("cl_a") === col("cl_b") || col("cl2_a") === col("cl_b") ||
            col("cl_a") === col("cl2_b")).cast("long").as("d2"),
          coalesce(col("band_hit"), lit(0L)).as("bh"))
        .agg(count(lit(1)), sum(col("d2")),
          sum(greatest(col("d2"), col("bh"))), sum(col("bh")))
        .head()
      println(f"[semk] UNION n=$n k=$k bits=$bits: true_pairs=${row.getLong(0)} " +
        f"recall_2p=${row.getLong(1).toDouble / row.getLong(0)}%.3f " +
        f"recall_2p_or_band=${row.getLong(2).toDouble / row.getLong(0)}%.3f " +
        f"(band alone ${row.getLong(3).toDouble / row.getLong(0)}%.3f) " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      a.unpersist()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
