package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 decomposition driver for the lang door's scale cost
  * (round-14 verdict task 5): q_stream_lang_filter is the slowest
  * SCALE.md row (31.2 s at 16×, 105.5 s at 64× — ~4-5× the batch
  * classify at the same scale), and the premium GROWS with data, so it
  * cannot be the fixed per-micro-batch engine overhead alone. Arms:
  *
  *   batch    — the one-shot classify+accept-filter over the corpus
  *              (the floor: the door's total classify work)
  *   srcwrite — the door fixture's arrival write alone (corpus
  *              (doc_id, text) → doorSplit parquet files): pure
  *              FIXTURE cost a production door (files arrive from the
  *              crawler) never pays, but part of every measured door
  *              number — quantified so the door row can be read
  *              honestly
  *   door@B   — the full door at 1 / 2 / 4 micro-batches (the
  *              graft.door.batches knob): the slope over B is the
  *              per-batch fixed cost; the B=1 arm minus batch minus
  *              srcwrite is the streaming-engine residual
  *
  * Run after ScaleSmoke built the scale dirs:
  *   SPARK_GRAFT_SCALE=16 sbt "runMain graft.LangDoorScale"
  *   SPARK_GRAFT_SCALE=64 sbt "runMain graft.LangDoorScale"
  * Results recorded in SCALE.md round-15.
  */
object LangDoorScale {

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "16").toInt
    val root =
      if (factor == 16) s"${System.getProperty("java.io.tmpdir")}/graft_scale_v2"
      else s"${System.getProperty("java.io.tmpdir")}/graft_scale${factor}_v1"
    require(new java.io.File(s"$root/_built").exists(),
      s"$root missing — run ScaleSmoke at SPARK_GRAFT_SCALE=$factor first")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-lang-door-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val L = graft.operators.LangId
    val S = graft.streaming.Streaming
    def secs[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val docs = Tables(spark, root, "documents")

    // batch floor, warm pair (ensureProfileStore is a one-time build,
    // triggered before timing so no arm pays it)
    val prof = L.ensureProfileStore(spark, root)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prof.count()
    def batchRun(): Long = L.predictionsOf(L.classify(docs, prof))
      .filter(col("predicted").isin("en", "fr")).count()
    val (b1, nB1) = secs(batchRun())
    val (b2, nB2) = secs(batchRun())
    require(nB1 == nB2, "batch arm diverged")
    println(f"[langdoor] ${factor}x batch classify+filter: " +
      f"$b1%6.2f / $b2%6.2f s   ($nB1 kept)")

    // the fixture's arrival write alone
    val srcTmp = java.nio.file.Files
      .createTempDirectory("graft_langsrc").toString
    val (w1, _) = secs(docs.select("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(s"$srcTmp/a"))
    val (w2, _) = secs(docs.select("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(s"$srcTmp/b"))
    println(f"[langdoor] ${factor}x src write (4 files): $w1%6.2f / $w2%6.2f s")

    // body-on-static: the EXACT foreachBatch body (classify → accept
    // filter → parquet write) over the same files as a plain batch read
    // — isolates "the body is slower in a micro-batch" from "the body
    // is slower, period"
    val (s1, _) = secs {
      L.predictionsOf(L.classify(spark.read.parquet(s"$srcTmp/a"), prof))
        .filter(col("predicted").isin("en", "fr"))
        .write.mode("overwrite").parquet(s"$srcTmp/out1")
    }
    val (s2, _) = secs {
      L.predictionsOf(L.classify(spark.read.parquet(s"$srcTmp/a"), prof))
        .filter(col("predicted").isin("en", "fr"))
        .write.mode("overwrite").parquet(s"$srcTmp/out2")
    }
    println(f"[langdoor] ${factor}x body-on-static: $s1%6.2f / $s2%6.2f s")

    // stream-null: same stream, body = count only — the engine + source
    // scan floor with zero classify work
    def streamNull(): Long = {
      val root2 = java.nio.file.Files
        .createTempDirectory("graft_langnull").toString
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$srcTmp/a").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcTmp/a")
      var n = 0L
      val q = stream.writeStream
        .option("checkpointLocation", s"$root2/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          n += batch.count(); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      n
    }
    val (n1t, _) = secs(streamNull())
    val (n2t, _) = secs(streamNull())
    println(f"[langdoor] ${factor}x stream-null (count body): $n1t%6.2f / $n2t%6.2f s")

    // decomposition arms: the classify pipeline cut at successive
    // stages, each run as a 4-micro-batch stream body AND statically on
    // the same files — the first stage whose stream/static ratio blows
    // up carries the premium
    import org.apache.spark.sql.DataFrame
    def natProfile(in: DataFrame): DataFrame =
      in.select(col("doc_id"), explode(
        org.apache.spark.sql.functions.call_function(
          "trigram_rank_profile",
          graft.operators.LangId.normTextCol(col("text")),
          lit(graft.operators.LangId.K))).as("p"))
    val stages: Seq[(String, DataFrame => Long)] = Seq(
      ("scan", in => in.count()),
      ("profile", in => natProfile(in).count()),
      ("classify", in => L.classify(in, prof).count()),
      ("predict", in => L.predictionsOf(L.classify(in, prof)).count()))
    def streamStage(body: DataFrame => Long): Double = {
      val root2 = java.nio.file.Files
        .createTempDirectory("graft_langstage").toString
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$srcTmp/a").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcTmp/a")
      val q = stream.writeStream
        .option("checkpointLocation", s"$root2/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) => body(batch); () }
        .start()
      val (t, _) = secs { try q.processAllAvailable() finally q.stop() }
      t
    }
    for ((name, body) <- stages) {
      val st = spark.read.parquet(s"$srcTmp/a")
      val (t1, _) = secs(body(st)); val (t2, _) = secs(body(st))
      val s1t = streamStage(body); val s2t = streamStage(body)
      println(f"[langdoor] ${factor}x stage[$name%8s] static: $t1%6.2f / $t2%6.2f s" +
        f"   stream: $s1t%6.2f / $s2t%6.2f s")
    }

    // the full door at 1 / 2 / 4 micro-batches
    for (batches <- Seq(1, 2, 4)) {
      System.setProperty("graft.door.batches", batches.toString)
      try {
        val (d1, n1) = secs(
          S.queries("q_stream_lang_filter")(spark, root).count())
        val (d2, n2) = secs(
          S.queries("q_stream_lang_filter")(spark, root).count())
        require(n1 == n2 && n1 == nB1,
          s"door arm diverged from batch: $n1/$n2 vs $nB1")
        println(f"[langdoor] ${factor}x door@$batches: $d1%6.2f / $d2%6.2f s")
      } finally System.clearProperty("graft.door.batches")
    }
    prof.unpersist()
    spark.stop()
  }
}
