package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 measurement driver for the grow doors' AUTO-compaction
  * cadence (`compactEvery`, Streaming.maybeCompactGrow): a LONG
  * span-grow ingest — 16 micro-batches at sf0.1, 4× the fixture door's
  * batch count, the regime where the append-one-dir-per-batch layout
  * starts to cost (the SCALE.md round-14 fragment table measured the
  * probe rising 0.88 → 3.52 s as fragments grow 4 → 256) — run with
  * the cadence off and at compactEvery = 4, outputs asserted
  * bit-identical (the StreamingSpec law at driver scale), wall time
  * and final grow-dir layout reported. The cadence trades one
  * batch-START union rewrite per 4th batch for every later batch
  * reading a bounded dir count; at 16 batches the uncadenced door's
  * LAST batch already unions 15 dirs.
  *
  * Run: sbt "runMain graft.CadenceScale"
  * Results recorded in SCALE.md round-14.
  */
object CadenceScale {

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-cadence-scale")
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
    def secs[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val base = T.ensureSpanStore(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val delta = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    // 16 deterministic arrival groups (odd residues mod 32)
    val groups = (0 until 16).map(k =>
      delta.filter(col("doc_id") % 32 === (2 * k + 1).toLong))
    def dirCount(root: String): Int =
      Option(new java.io.File(s"$root/grow").listFiles())
        .getOrElse(Array.empty)
        .count(f => f.isDirectory && f.getName.startsWith("batch_b"))
    def run(compactEvery: Int): (Double, Set[Seq[Any]], Int) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_cadence_e$compactEvery").toString
      val (t, out) = secs(
        S.spanGrowDoor(spark, groups, base, rootDir = root,
            compactEvery = compactEvery)
          .collect().map(_.toSeq).toSet)
      spark.catalog.clearCache()
      // clearCache drops the deliberately persisted base too — re-pin
      // (and re-materialize) so every arm runs under the door's
      // caller-persisted-store contract, the ContainDoorScale convention
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      (t, out, dirCount(root))
    }
    // cold JVM warm-up on the plain arm, then the measured passes
    val (w, _, _) = run(0)
    println(f"[cadence] warm-up (plain): $w%6.2f s")
    val (tPlain, outPlain, dPlain) = run(0)
    val (tCad, outCad, dCad) = run(4)
    require(outCad == outPlain,
      s"cadence changed the fold: ${outCad.size} vs ${outPlain.size} rows")
    println(f"[cadence] 16-batch span-grow door at sf0.1: " +
      f"plain $tPlain%6.2f s ($dPlain dirs)   " +
      f"compactEvery=4 $tCad%6.2f s ($dCad dirs)   " +
      f"outputs identical (${outPlain.size} rows)")
    base.unpersist()
    spark.stop()
  }
}
