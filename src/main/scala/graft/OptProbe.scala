package graft

import org.apache.spark.sql.SparkSession

/** Local measurement probe for the optimization rounds — NOT part of the
  * driver contract. Same session config and methodology as [[Bench]]
  * (noop sink, per-query clearCache, door timing knob), but runs each
  * named query `reps` times and prints every rep plus min/median, so a
  * change can be adjudicated under the sandbox's bursty ambient load
  * (BASELINE.md method: the minimum of several reps is the load-robust
  * statistic; a single "warm second run" is not).
  *
  * Usage: runMain graft.OptProbe <q1,q2,...> [reps]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optprobe")
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
    // optional runtime conf overrides for A/B probes, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=134217728"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    System.setProperty("graft.door.batches", "2")
    try {
      Bench.runSetup(spark, sfDir)
      names.foreach { name =>
        val ts = (1 to reps).map { r =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          println(f"[probe] $name rep$r $dt%.2f s")
          dt
        }.sorted
        println(f"[probe] $name MIN ${ts.head}%.2f MED ${ts(ts.size / 2)}%.2f")
      }
    } finally {
      // in the finally (round-15 ADVICE): a failing query must not leave
      // the session running with only the door-batches property cleared
      try spark.stop()
      finally System.clearProperty("graft.door.batches")
    }
  }
}
