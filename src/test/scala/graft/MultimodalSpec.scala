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

  test("FakeDecoder operates on raw bytes (incl. non-ASCII) — pinned values") {
    // bytes [0, 255, 16]: byteSum = 271, n = 3
    val d = FakeDecoder.decode(Array[Byte](0, 255.toByte, 16))
    assert(d.width === 16 + (271 % 16))
    assert(d.height === 16 + 3)
    assert(d.features.toSeq === Seq(0.0, 255.0 / 3, 16.0 / 3, 0.0))
  }

  test("media store round-trips a genuine BinaryType column with non-UTF8 bytes") {
    val m = Multimodal.ensureMediaStore(spark, sf0001)
    assert(m.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val rows = m.select("doc_id", "payload")
      .orderBy("doc_id").as[(Long, Array[Byte])].head(50)
    // md5-block construction: 16 * (1 + doc_id % 8) bytes per payload
    rows.foreach { case (id, p) =>
      assert(p.length === 16 * (1 + id % 8), s"doc $id wrong payload length")
    }
    // genuinely binary: high-bit bytes must appear (md5 bytes are uniform,
    // so over 50 payloads their absence would mean a stringified round-trip)
    assert(rows.exists(_._2.exists(b => (b & 0x80) != 0)),
      "no >=0x80 bytes anywhere — payload column was text-laundered")
    // the decoder consumes the real blobs end-to-end
    val d = FakeDecoder.decode(rows.head._2)
    assert(d.features.length === 4 && d.width >= 16 && d.height >= 16)
  }

  test("feature pipeline: schema, one row per doc, features match direct decode") {
    val out = Multimodal.queries("q_multimodal_features")(spark, sf0001)
    assert(out.columns.toSeq ===
      Seq("doc_id", "width", "height", "f0", "f1", "f2", "f3"))
    val docs = Tables(spark, sf0001, "documents")
    assert(out.count() === docs.count())

    val sample = docs.select("doc_id", "text").as[(Long, String)].head(5)
    val got = out.filter(col("doc_id") < 5)
      .select("doc_id", "width", "height", "f0", "f1", "f2", "f3")
      .as[(Long, Int, Int, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    sample.foreach { case (id, text) =>
      val d = FakeDecoder.decode(text.getBytes("UTF-8"))
      val (_, w, h, f0, f1, f2, f3) = got(id)
      assert(w === d.width && h === d.height)
      assert(Seq(f0, f1, f2, f3) === d.features.toSeq)
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
