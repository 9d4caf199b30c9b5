package graft

import org.apache.spark.sql.SparkSession

/** Four-digit-merge BPE training demonstration (one-time tool, not part
  * of the driver contract): trains >= 1000 merges at mergesPerRound = 64
  * on the customer-name word table, printing the per-round
  * (merges, seconds) table recorded in SCALE.md, and persists the
  * artifact under the versioned bpe_k64_v2 store tag (the 5-merge
  * oracled bpe_v1 store is untouched).
  * Run: `sbt "runMain graft.BpeScale [sfDir]"`.
  *
  * Scale notes this measures: every round is one vocabulary-grain pair
  * agg + ONE fold pass applying up to 64 pairwise symbol-disjoint
  * merges; the driver sees only the <= 256-row candidate collect per
  * round, so a ~30k-merge production vocabulary is ~470 such rounds —
  * driver traffic and round count both independent of corpus size.
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bpe-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var total = 0
    val t0 = System.nanoTime()
    val path = graft.operators.Text.ensureBpeK64Store(spark, sfDir,
      (rnd, n, sec, _, _) => {
        total += n
        println(f"[bpe] round $rnd%2d: $n%2d merges ($total%4d total) in $sec%6.2f s")
      })
    val note = if (total == 0) s" (0 rounds printed => store already built at $path)"
      else ""
    println(f"[bpe] done: $total merges in ${(System.nanoTime() - t0) / 1e9}%.1f s$note")
    val m = spark.read.parquet(s"$path/merges")
    println(s"[bpe] store rows: merges=${m.count()}, " +
      s"rounds=${m.selectExpr("max(rnd)").head().getInt(0)}")
    spark.stop()
  }
}
