package graft

import org.apache.spark.sql.SparkSession

/** Pool-width sensitivity sweep for batched BPE (one-time tool, not part
  * of the driver contract; SURVEY §7.6 item 3 / round-11 verdict task 5):
  * trains the same k=64 schedule over the [[graft.operators.Text.bpeK64WordFreq]]
  * word table with candidate pools of 4×k / 16×k / 64×k rows, printing a
  * per-arm table of merges-per-round, driver collect bytes, and
  * wall-per-round — quantifying the round-11 pool widening (4×k → 16×k)
  * and bounding the driver-side cost curve. Results recorded in SCALE.md;
  * the chosen 16×k default is justified in bpeTrainVocab's scaladoc.
  * Run: `sbt "runMain graft.BpePoolScale [sfDir] [rounds]"`.
  */
object BpePoolScale {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bpe-pool-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = graft.operators.Text.bpeK64WordFreq(spark, sfDir)
      .persist()
    println(s"[bpepool] word table: ${words.count()} types, k=64, " +
      s"$rounds rounds per arm")
    Seq(4, 16, 64).foreach { pf =>
      var merged = 0L; var poolRows = 0L; var bytes = 0L; var wall = 0.0
      var perRound = List.empty[Int]
      val t0 = System.nanoTime()
      val (m, vocab) = graft.operators.Text.bpeTrainVocab(
        words, rounds, mergesPerRound = 64,
        roundHook = (_, n, sec, rows, b) => {
          merged += n; poolRows += rows; bytes += b; wall += sec
          perRound = n :: perRound
        },
        poolFactor = pf)
      // superseded rounds' checkpoint blocks are reclaimed by the
      // ContextCleaner once the arm's vocab frame drops (the
      // bpeTrainVocab contract); the shared word table stays persisted
      vocab.unpersist()
      println(f"[bpepool] pool=${pf}%2dxk: merges=${m.size}%4d " +
        f"(${merged / rounds.toDouble}%5.1f/round, per-round ${perRound.reverse.mkString(",")}) " +
        f"collect=${poolRows}%6d rows / ${bytes / 1024.0}%7.1f KiB total " +
        f"wall=${wall}%6.2f s (${wall / rounds}%5.3f s/round, " +
        f"total ${(System.nanoTime() - t0) / 1e9}%5.1f s)")
    }

    // reliable-checkpoint overhead arm (SURVEY §7.7): same 16×k schedule
    // with per-round reliable checkpoint() to a configured dir instead
    // of localCheckpoint — the real-cluster executor-loss-safe mode
    {
      spark.sparkContext.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft_bpe_ckpt")
      var wall = 0.0; var merged = 0L
      val (m, vocab) = graft.operators.Text.bpeTrainVocab(
        words, rounds, mergesPerRound = 64,
        roundHook = (_, nm, sec, _, _) => { merged += nm; wall += sec },
        poolFactor = 16, reliableCheckpoint = true)
      vocab.unpersist()
      println(f"[bpepool] RELIABLE ckpt 16xk: merges=${m.size}%4d " +
        f"wall=${wall}%6.2f s (${wall / rounds}%5.3f s/round)")
    }
    spark.stop()
  }
}
