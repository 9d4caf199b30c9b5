package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-first mitigation for the containment boundary, measured
  * (one-time tool): the 64× table (SCALE.md round-11) showed the
  * containment join DIES on the all-dup corpus (64-cliques make its
  * candidate/output volume quadratic in clique size; the spill filled
  * the box). The production pipeline never feeds it that input —
  * near-dup dedup runs FIRST. This composes exactly that: near-dup
  * cluster canonicals (q_cluster_canonical's keep set) → the SAME
  * containment join over the canonical-only gram store, and reports
  * both stage wall-times. Run: `sbt "runMain graft.ContainScale [dir]"`.
  */
object ContainScale {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale64_v1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-contain-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup
    Dedup.ensureGramStore(spark, dir) // ingest, not measured
    // stage 1: the factored dedup-first front half (now ALSO the
    // registered q_containment_canonical's): FULL self-join near-dup
    // graph (q_dedup_minhash's banded pair set over the whole corpus —
    // NOT crossPairs, whose base/delta parity split never links the
    // ScaleSmoke replica cliques: replica ids stride by an even 1e7, so
    // a doc's 63 replicas all share its parity) -> CC -> min-id canonicals
    var t0 = System.nanoTime()
    val canon = Dedup.nearDupCanonicals(spark, dir).persist()
    val nCanon = canon.count()
    println(f"[contain] near-dup canonicals: $nCanon docs " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    t0 = System.nanoTime()
    val out = Dedup.containmentJoinOnGrams(
      Dedup.ensureGramStore(spark, dir).join(canon, "doc_id"))
    out.write.mode("overwrite").format("noop").save()
    println(f"[contain] containment over canonicals: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(raw-corpus run at this scale: FAILED, 77 GB spill — SCALE.md)")
    spark.stop()
  }
}
