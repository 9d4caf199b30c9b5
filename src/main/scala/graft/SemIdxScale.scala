package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Indexed-vs-exact SemDeDup seed-assignment diagnostic (one-time tool):
  * the 64× table (SCALE.md round-11) showed exact assignment is the
  * family's one superlinear edge (batch × k with k = n/128). This
  * measures the banded-index mitigation (Dedup.assignToSeedsIndexed) on
  * the same data: wall-time, assignment agreement with exact, and
  * 1-probe pair recall under both assignments (recall only at bench
  * scale — the ground truth is quadratic by definition).
  * Run: `sbt "runMain graft.SemIdxScale [sfDir] [recall]"`.
  */
object SemIdxScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val doRecall = args.length > 1 && args(1) == "recall"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-semidx-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
      .persist()
    val n = e.count()
    val k = Dedup.semanticK(n)
    val seeds = Dedup.semanticSeedsK(e, k).persist()
    seeds.count()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semidx] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val exact = Dedup.assignToSeeds(e, seeds).persist()
    timed(s"exact assignment (n=$n, k=$k)")(exact.count())
    val idx = Dedup.assignToSeedsIndexed(e, seeds).persist()
    timed("banded-indexed assignment")(idx.count())
    val ivf = Dedup.assignToSeedsIvf(e, seeds).persist()
    timed("ivf 2-probe assignment")(ivf.count())
    def agreement(label: String, a: org.apache.spark.sql.DataFrame): Unit = {
      val r = exact.select(col("vec_id"), col("cluster_id").as("c_ex"))
        .join(a.select(col("vec_id"), col("cluster_id").as("c_ap")), "vec_id")
        .agg(count(lit(1)), sum(when(col("c_ex") === col("c_ap"), 1L).otherwise(0L)))
        .head()
      println(f"[semidx] $label agreement: ${r.getLong(1)}/${r.getLong(0)} = " +
        f"${r.getLong(1).toDouble / r.getLong(0)}%.4f")
    }
    agreement("banded", idx)
    agreement("ivf", ivf)

    if (doRecall) {
      def recall1p(a: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val l = a.select(col("vec_id").as("vid_a"),
          col("embedding").as("emb_a"), col("cluster_id").as("cl_a"))
        val r = a.select(col("vec_id").as("vid_b"),
          col("embedding").as("emb_b"), col("cluster_id").as("cl_b"))
        val row = l.join(r, col("vid_a") < col("vid_b"))
          .filter(call_function("cosine_sim", col("emb_a"), col("emb_b")) >= 0.4)
          .agg(count(lit(1)),
            sum((col("cl_a") === col("cl_b")).cast("long")))
          .head()
        (row.getLong(0), row.getLong(1))
      }
      val (tp1, d1) = recall1p(exact)
      val (tp2, d2) = recall1p(idx)
      val (tp3, d3) = recall1p(ivf)
      println(f"[semidx] 1p recall exact: $d1/$tp1 = ${d1.toDouble / tp1}%.3f; " +
        f"banded: $d2/$tp2 = ${d2.toDouble / tp2}%.3f; " +
        f"ivf: $d3/$tp3 = ${d3.toDouble / tp3}%.3f")
    }
    spark.catalog.clearCache() // both assigners persist coded frames
    spark.stop()
  }
}
