package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Local measurement probe for the optimization rounds — NOT part of the
  * driver contract. Runs ONE query like [[OptProbe]] but with a
  * SparkListener that prints every job's (start-offset, duration,
  * description) relative to the query's t0, so the per-door fixed costs
  * (engine WAL/commit gaps, per-batch planning, src-write jobs) are
  * attributable: the GAPS between jobs are driver-side work (planning,
  * codegen, streaming-engine bookkeeping, commit protocol), the jobs
  * themselves are cluster work.
  *
  * Usage: runMain graft.JobTrace <query> [reps]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobtrace")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    System.setProperty("graft.door.batches", "2")
    try {
      Bench.runSetup(spark, sfDir)
      @volatile var t0 = System.nanoTime()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      var traceOn = false
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = if (traceOn) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(js.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = if (traceOn) {
          Option(starts.get(je.jobId)).foreach { case (ts, desc) =>
            val off = (ts - t0) / 1e9
            val dur = (System.nanoTime() - ts) / 1e9
            println(f"[trace] job ${je.jobId}%4d at $off%7.3f dur $dur%6.3f  $desc")
          }
        }
      })
      names.foreach { name =>
      (1 to reps).foreach { r =>
        println(s"=== $name rep $r ===")
        starts.clear()
        t0 = System.nanoTime()
        traceOn = true
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        traceOn = false
        // listener delivery is async: give the bus a beat before the
        // next rep clears the start map
        Thread.sleep(300)
        spark.catalog.clearCache()
        println(f"[trace] $name rep$r TOTAL $dt%.2f s")
      }
      }
      spark.stop()
    } finally System.clearProperty("graft.door.batches")
  }
}
