package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 measurement driver for two round-13 verdict tasks:
  *
  *  1. task 4 — the span-grow door's growth premium vs the frozen
  *     profiling door, re-measured at 16× and 64× after the store side
  *     of the per-batch joins was BLOOM-pruned by the batch's span set
  *     (Text.bloomPruneSpans): round-13 measured the premium RISING
  *     with scale (1.19× at 16× → 1.55× at 64×) because base ∪ grow
  *     shuffled unpruned into every profile join; the done-criterion is
  *     the 64× premium back near the neardup door's amortizing trend.
  *     Method identical to round-13's: both doors run twice in one
  *     session per scale dir (cold, then the warm figure), frozen
  *     first, grow second.
  *
  *  2. task 3 — door probe cost vs grow-store FRAGMENT count, and the
  *     compaction payoff: the same probe (one batch's profile against
  *     base ∪ store) timed with the store's rows split across
  *     F ∈ {4, 16, 64, 256} batch dirs, then after compactGrowStore
  *     folds them to one. The fragments hold IDENTICAL rows throughout,
  *     so any cost delta is pure small-files overhead (listing + footer
  *     reads + per-file tasks).
  *
  * Run after ScaleSmoke has built the scale dirs:
  *   SPARK_GRAFT_SCALE=16 sbt "runMain graft.SpanGrowScale"
  *   SPARK_GRAFT_SCALE=64 sbt "runMain graft.SpanGrowScale"
  * Results recorded in SCALE.md round-14.
  */
object SpanGrowScale {

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val root =
      if (factor == 16) s"${System.getProperty("java.io.tmpdir")}/graft_scale_v2"
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale${factor}_v1"
    require(new java.io.File(s"$root/_built").exists(),
      s"$root missing — run ScaleSmoke at SPARK_GRAFT_SCALE=$factor first")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-span-grow-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val S = graft.streaming.Streaming
    def secs[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // ---- task 4: frozen vs grow door, warm second pass ----
    val (f1, nF1) = secs(S.queries("q_stream_span_dedup")(spark, root).count())
    val (f2, nF2) = secs(S.queries("q_stream_span_dedup")(spark, root).count())
    require(nF1 == nF2, s"frozen door output diverged: $nF1 / $nF2")
    val (g1, nG1) = secs(S.queries("q_stream_span_grow")(spark, root).count())
    val (g2, nG2) = secs(S.queries("q_stream_span_grow")(spark, root).count())
    require(nG1 == nG2, s"grow door output diverged: $nG1 / $nG2")
    println(f"[spangrow] ${factor}x frozen: $f1%6.2f / $f2%6.2f s " +
      f"($nF1 rows)   grow: $g1%6.2f / $g2%6.2f s ($nG1 rows)   " +
      f"warm premium: ${g2 / f2}%5.2fx")
    spark.catalog.clearCache()

    // ---- task 4b: the prune's own receipt, in the regime it exists
    // for — STORE-DOMINANT (the 100 TB ingest shape: persisted base
    // spans >> one batch's). The smoke corpora invert the ratio (their
    // replica cliques collapse the DISTINCT store while raw batch spans
    // scale with the corpus), so the door engages the prune adaptively;
    // here the store is expanded content-disjointly (suffix-shifted
    // copies — a suffixed string can never equal a 32-hex md5, the
    // ContainDoorScale vocabulary trick) to 64× its size against a
    // FIXED small batch (sf0.1's %8==7 slice), and the profile runs
    // unpruned vs pruned on identical inputs.
    {
      val smallBatch = Tables(spark, "/root/testdata/sf0.1", "documents")
        .filter(col("doc_id") % 8 === 7).select("doc_id", "text")
      val smallArrival = graft.operators.Text.spanHashes(smallBatch).persist()
      val nSmall = smallArrival.count()
      val store0 = graft.operators.Text.ensureSpanStore(spark, root)
      val bigStore = spark.range(64).toDF("tier")
        .crossJoin(store0)
        .select(when(col("tier") === 0, col("gh"))
          .otherwise(concat(col("gh"), lit("_t"), col("tier"))).as("gh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nBig = bigStore.count()
      println(s"[spangrow] store-dominant receipt: store=$nBig spans, batch=$nSmall")
      def prof(b: DataFrame): Long = graft.operators.Text
        .spanProfileOfSpans(smallArrival, b)
        .agg(sum(col("n_base_dup_spans"))).head().getLong(0)
      val (u1, rU1) = secs(prof(bigStore))
      val (u2, rU2) = secs(prof(bigStore))
      val (p1, rP1) = secs(prof(
        graft.operators.Text.bloomPruneSpans(smallArrival, bigStore)))
      val (p2, rP2) = secs(prof(
        graft.operators.Text.bloomPruneSpans(smallArrival, bigStore)))
      require(rU1 == rU2 && rP1 == rP2 && rU1 == rP1,
        s"store-dominant arms diverged: $rU1/$rU2 vs $rP1/$rP2")
      println(f"[spangrow] store-dominant: unpruned $u1%6.2f / $u2%6.2f s" +
        f"   pruned $p1%6.2f / $p2%6.2f s   (dup_spans=$rU1)")
      bigStore.unpersist(); smallArrival.unpersist()
    }

    // ---- task 3: probe cost vs fragment count, then compaction ----
    val store = graft.operators.Text.ensureSpanStore(spark, root)
    val nStore = store.count()
    val probe = Tables(spark, root, "documents")
      .filter(col("doc_id") % 8 === 7).select("doc_id", "text")
    val arrival = graft.operators.Text
      .spanHashes(probe).persist()
    val nArr = arrival.count()
    println(s"[spangrow] fragment probe: store=$nStore spans, arrival=$nArr")
    for (frags <- Seq(4, 16, 64, 256)) {
      val froot = s"${System.getProperty("java.io.tmpdir")}/graft_fragprobe_$factor/f$frags"
      // the LAST fragment dir is the build marker: a prior run's
      // compaction folds everything into batch_b0, so checking b0 would
      // skip the rebuild and time an already-compacted layout
      val marker = new java.io.File(s"$froot/grow/batch_b${frags - 1}/_SUCCESS")
      if (!marker.exists()) {
        val g = new java.io.File(s"$froot/grow")
        def deleteRec(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(); ()
        }
        deleteRec(g)
        (0 until frags).foreach { i =>
          store.filter(pmod(xxhash64(col("gh")), lit(frags)) === i)
            .write.mode("overwrite").parquet(s"$froot/grow/batch_b$i")
        }
      }
      def probeOnce(): (Double, Long) = {
        val dirs = (0 until 256).map(i => s"$froot/grow/batch_b$i")
          .filter(p => new java.io.File(s"$p/_SUCCESS").exists())
        val grow = spark.read.parquet(dirs: _*)
        secs(graft.operators.Text
          .spanProfileOfSpans(arrival,
            graft.operators.Text.bloomPruneSpans(arrival, grow))
          .agg(sum(col("n_base_dup_spans"))).head().getLong(0))
      }
      val (c1, r1) = probeOnce(); val (c2, r2) = probeOnce()
      require(r1 == r2, "fragment probe diverged")
      val folded = S.compactGrowStore(spark, froot)
      val (c3, r3) = probeOnce()
      require(r3 == r1, s"compaction changed the probe result: $r1 -> $r3")
      println(f"[spangrow] frags=$frags%4d  probe: $c1%6.2f / $c2%6.2f s" +
        f"   compacted($folded dirs): $c3%6.2f s   (dup_spans=$r1)")
      spark.catalog.clearCache(); arrival.persist(); arrival.count()
    }
    spark.stop()
  }
}
