package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.FakeDecoder

/** Multimodal plumbing: the stub decoder is pinned on literal bytes and the
  * partition-batched pipeline is checked for schema + determinism.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("FakeDecoder is deterministic and pure") {
    val b = "hello world".getBytes("UTF-8")
    val d1 = FakeDecoder.decode(b)
    val d2 = FakeDecoder.decode(b)
    assert(d1.width === d2.width && d1.height === d2.height)
    assert(d1.features.toSeq === d2.features.toSeq)
    assert(d1.features.length === 4)
    assert(FakeDecoder.decode(Array.emptyByteArray).features.toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("feature pipeline: schema, one row per doc, features match direct decode") {
    val out = Multimodal.queries("q_multimodal_features")(spark, sf0001)
    assert(out.columns.toSeq === Seq("doc_id", "width", "height", "features"))
    val docs = Tables(spark, sf0001, "documents")
    assert(out.count() === docs.count())

    val sample = docs.select("doc_id", "text").as[(Long, String)].head(5)
    val got = out.filter(col("doc_id") < 5)
      .select("doc_id", "width", "height", "features")
      .as[(Long, Int, Int, Array[Double])].collect().map(r => r._1 -> r).toMap
    sample.foreach { case (id, text) =>
      val d = FakeDecoder.decode(text.getBytes("UTF-8"))
      val (_, w, h, f) = got(id)
      assert(w === d.width && h === d.height)
      assert(f.toSeq === d.features.toSeq)
    }
  }

  test("metadata pass never decodes: plan reads only pruned columns") {
    val out = Multimodal.queries("q_multimodal_meta")(spark, sf0001)
    val scan = out.queryExecution.executedPlan.toString
    assert(out.count() > 0)
    // column pruning: the scan must not read lang/source (unused)
    assert(!scan.contains("lang") && !scan.contains("source"), scan)
  }
}
