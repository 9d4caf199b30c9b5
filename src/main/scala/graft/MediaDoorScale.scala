package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-door index amortization curve, measured (one-time tool — the
  * round-12 review hoisted the base band explode out of foreachBatch
  * into the once-built [[graft.operators.Multimodal.MediaIndex]], and
  * the post-hoist 16× smoke showed the index's one-time cache
  * materialization slightly OUTWEIGHS four per-batch re-explodes at an
  * 80k catalog; this driver varies the BATCH COUNT to locate the
  * crossover). Both modes run the identical survivor computation over
  * the identical arrival chunks against the 16× media catalog; only the
  * base side differs:
  *   - `index`: bands + verify structs built and persisted ONCE (build
  *     time reported separately), reused by every batch;
  *   - `reexplode`: the pre-hoist shape — every batch re-derives base
  *     bands and structs from the persisted raw signature store.
  * The streaming engine is deliberately absent: its fixed per-batch
  * overhead is identical in both modes and would only blur the quantity
  * in question. Run: `sbt "runMain graft.MediaDoorScale [dir]"`.
  */
object MediaDoorScale {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale_v2"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-media-door-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val M = graft.operators.Multimodal
    val Lsh = graft.operators.Lsh

    // ingest, not measured
    val base = M.ensureMediaSigStore(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBase = base.count()
    val bBits = Lsh.bandBits(nBase)
    val arrivals = M.mediaArrivals(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nArr = arrivals.count()
    println(s"[mediadoor] catalog=$nBase arrivals=$nArr bandBits=$bBits dir=$dir")

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // the pre-hoist per-batch shape: base bands + structs re-derived
    // from the persisted raw store on EVERY call (what foreachBatch did
    // before the review fix) — reconstructed here since the library now
    // only exposes the index form
    def reexplodeSurvivors(batch: DataFrame): Long = {
      val bsig = M.decodedSig(batch).persist()
      try {
        val keys = M.mediaBlockKeys
        def bandsOf(sig: DataFrame, side: String) =
          Lsh.explodeBands(
            sig.select("doc_id", "code", "nbytes", "width", "height"),
            "code", bBits)
            .select((col("doc_id").as(s"doc_id_$side") +: keys.map(col)): _*)
        val cand = bandsOf(base, "a").join(bandsOf(bsig, "b"), keys)
          .select("doc_id_a", "doc_id_b").distinct()
        val dupIds = cand
          .join(base.select(col("doc_id").as("doc_id_a"),
            M.mediaSigStruct.as("sig_a")), "doc_id_a")
          .join(bsig.select(col("doc_id").as("doc_id_b"),
            M.mediaSigStruct.as("sig_b")), "doc_id_b")
          .filter(col("sig_a") === col("sig_b"))
          .select(col("doc_id_b").as("doc_id")).distinct()
        bsig.join(dupIds, Seq("doc_id"), "left_anti").count()
      } finally { bsig.unpersist(); () }
    }

    // untimed warm-up: one batch through EACH mode first, so JIT and
    // shuffle-path warmth don't bias the first timed mode (round-12
    // ADVICE: re-explode always ran first and paid the cold costs the
    // index mode then skipped)
    {
      val w = arrivals.filter(pmod(col("doc_id"), lit(4)) === 0)
      reexplodeSurvivors(w)
      val wIdx = M.buildMediaIndex(base, bBits)
      wIdx.bands.count(); wIdx.sigs.count()
      M.withMediaSurvivors(w, wIdx)(_.count())
      wIdx.unpersist()
      ()
    }

    for (nBatches <- Seq(4, 16, 64)) {
      // deterministic chunking on the arrival id — same chunks per mode
      val chunks = (0 until nBatches).map(i =>
        arrivals.filter(pmod(col("doc_id"), lit(nBatches)) === i))

      var t0 = System.nanoTime()
      var kept = 0L
      chunks.foreach(c => kept += reexplodeSurvivors(c))
      val reexp = secs(t0)

      t0 = System.nanoTime()
      val index = M.buildMediaIndex(base, bBits)
      index.bands.count(); index.sigs.count() // force the one-time build
      val build = secs(t0)
      t0 = System.nanoTime()
      var keptIdx = 0L
      chunks.foreach(c => keptIdx += M.withMediaSurvivors(c, index)(_.count()))
      val probe = secs(t0)
      index.unpersist()

      require(kept == keptIdx, s"mode outputs diverged: $kept vs $keptIdx")
      println(f"[mediadoor] batches=$nBatches%-3d reexplode=$reexp%7.2f s   " +
        f"index: build=$build%5.2f s + probe=$probe%7.2f s = ${build + probe}%7.2f s   " +
        f"(kept=$kept)")
    }
    spark.stop()
  }
}
