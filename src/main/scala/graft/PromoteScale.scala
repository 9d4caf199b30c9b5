package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 measurement driver for grow-store PROMOTION (round-14
  * verdict task 1's receipt): after promoteGrowStore folds the grow
  * dirs into the base artifact, the door's per-batch probe must cost
  * what a FRESH single-store base of the same content costs — the
  * "fresh-base floor". Three arms over IDENTICAL store content
  * (base ∪ grow rows, suffix-shifted content-disjoint expansion — the
  * SpanGrowScale vocabulary trick):
  *
  *   floor       — the content as ONE flat store dir (what
  *                 ensureSpanStore would have produced had the grow
  *                 rows been in the corpus from the start)
  *   unpromoted  — base dir + F batchId-keyed grow dirs (the shape a
  *                 continuing door reads every batch)
  *   promoted    — base dir + the promotion's renamed-in file after
  *                 promoteGrowStore consumed the F dirs
  *
  * All arms run the real door probe path (bloomPruneSpans → span
  * profile) on the same fixed arrival batch, twice (cold, then the
  * warm figure); results are required identical across arms, so any
  * delta is pure layout (listing + footers + per-file tasks + the
  * per-batch union of a second store).
  *
  * Run after ScaleSmoke has built the scale dirs:
  *   SPARK_GRAFT_SCALE=16 sbt "runMain graft.PromoteScale"
  *   SPARK_GRAFT_SCALE=64 sbt "runMain graft.PromoteScale"
  * Results recorded in SCALE.md round-15.
  */
object PromoteScale {

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val root =
      if (factor == 16) s"${System.getProperty("java.io.tmpdir")}/graft_scale_v2"
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale${factor}_v1"
    require(new java.io.File(s"$root/_built").exists(),
      s"$root missing — run ScaleSmoke at SPARK_GRAFT_SCALE=$factor first")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-promote-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val T = graft.operators.Text
    val S = graft.streaming.Streaming
    def secs[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(); ()
    }

    val work = s"${System.getProperty("java.io.tmpdir")}/graft_promoscale_$factor"
    deleteRec(new java.io.File(work))

    val store0 = T.ensureSpanStore(spark, root)
    // grow content: 3 content-disjoint tiers of the base (a suffixed
    // string can never equal a 32-hex md5), so the folded store is 4×
    // the base and the probe's store side is grow-dominated — the
    // regime promotion exists for
    val growRows = spark.range(1, 4).toDF("tier").crossJoin(store0)
      .select(concat(col("gh"), lit("_g"), col("tier")).as("gh"))
    val arrival = T.spanHashes(
      Tables(spark, "/root/testdata/sf0.1", "documents")
        .filter(col("doc_id") % 8 === 7).select("doc_id", "text")).persist()
    val nArr = arrival.count()

    // base as a plain store dir + the floor layout (one flat dir)
    val baseDir = s"$work/base"
    store0.write.parquet(baseDir)
    val floorDir = s"$work/floor"
    spark.read.parquet(baseDir).unionByName(growRows).write.parquet(floorDir)

    def probeOn(paths: Seq[String]): (Double, Long) = {
      val st = spark.read.parquet(paths: _*)
      secs(T.spanProfileOfSpans(arrival, T.bloomPruneSpans(arrival, st))
        .agg(sum(col("n_base_dup_spans"))).head().getLong(0))
    }
    def files(p: String): Int =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))

    val (fl1, rFl1) = probeOn(Seq(floorDir))
    val (fl2, rFl2) = probeOn(Seq(floorDir))
    require(rFl1 == rFl2, "floor probe diverged")
    println(f"[promote] ${factor}x floor (1 flat store, ${files(floorDir)} files): " +
      f"$fl1%6.2f / $fl2%6.2f s   (dup_spans=$rFl1)")

    for (frags <- Seq(16, 256)) {
      val groot = s"$work/f$frags"
      (0 until frags).foreach { i =>
        growRows.filter(pmod(xxhash64(col("gh")), lit(frags)) === i)
          .write.parquet(s"$groot/grow/batch_b$i")
      }
      val dirs = (0 until frags).map(i => s"$groot/grow/batch_b$i")
      val (u1, rU1) = probeOn(baseDir +: dirs)
      val (u2, rU2) = probeOn(baseDir +: dirs)
      require(rU1 == rU2 && rU1 == rFl1, "unpromoted probe diverged")
      // the promotion itself, timed (O(grow): one union rewrite + one
      // rename — never touches the base files), then the promoted probe
      val promoBase = s"$groot/pbase"
      val (cp, _) = secs {
        new java.io.File(promoBase).mkdirs()
        new java.io.File(baseDir).listFiles().foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(promoBase, f.getName).toPath)
        }
      }
      val (tp, folded) = secs(S.promoteGrowStore(spark, groot, promoBase))
      require(folded == frags, s"expected $frags dirs folded, got $folded")
      val (p1, rP1) = probeOn(Seq(promoBase))
      val (p2, rP2) = probeOn(Seq(promoBase))
      require(rP1 == rP2 && rP1 == rFl1, "promoted probe diverged")
      println(f"[promote] ${factor}x frags=$frags%4d  " +
        f"unpromoted (base+$frags dirs): $u1%6.2f / $u2%6.2f s   " +
        f"promoted (${files(promoBase)} files): $p1%6.2f / $p2%6.2f s   " +
        f"promote cost: $tp%6.2f s (+ $cp%4.2f s base copy, test-only)")
    }
    arrival.unpersist()
    spark.stop()
  }
}
