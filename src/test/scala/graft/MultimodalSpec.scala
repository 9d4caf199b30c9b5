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

  /** The MediaCodec contract (Multimodal.MediaCodec scaladoc), checked
    * against ANY implementation — a real codec replacing FakeDecoder must
    * pass this same suite: determinism, totality on arbitrary bytes with
    * only MediaDecodeException allowed, output shape, and closure
    * serializability.
    */
  private def codecConformance(c: Multimodal.MediaCodec): Unit = {
    val rnd = new scala.util.Random(3)
    val inputs: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray, Array[Byte](0), Array[Byte](-1, -128, 127),
        Array.fill(4096)(0xFF.toByte)) ++
        (1 to 50).map(_ => Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte))
    def tryDecode(in: Array[Byte]): Option[Multimodal.Decoded] =
      try Some(c.decode(in))
      catch {
        case _: Multimodal.MediaDecodeException => None // documented reject
        case e: Throwable =>
          fail(s"codec threw undocumented ${e.getClass.getName}: ${e.getMessage}")
      }
    for (in <- inputs; d <- tryDecode(in)) {
      // shape: positive dims, fixed finite feature vector
      assert(d.width >= 1 && d.height >= 1, s"non-positive dims $d")
      assert(d.features.length === Multimodal.FeatureDim)
      assert(d.features.forall(java.lang.Double.isFinite),
        s"non-finite feature in ${d.features.toSeq}")
      // determinism — including against a defensive copy of the input
      val again = tryDecode(in.clone())
      assert(again.exists(a => a.width == d.width && a.height == d.height &&
        a.features.sameElements(d.features)),
        "decode is not a pure function of the bytes")
    }
    // a rejected input must be rejected deterministically too
    for (in <- inputs if tryDecode(in).isEmpty)
      assert(tryDecode(in.clone()).isEmpty, "nondeterministic reject")
    // serializability: the instance must survive a task-closure round-trip
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(c)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Multimodal.MediaCodec]
    val probe = "probe".getBytes("UTF-8")
    (tryDecode(probe), try Some(back.decode(probe)) catch { case _: Throwable => None }) match {
      case (Some(a), Some(b)) =>
        assert(a.width == b.width && a.height == b.height &&
          a.features.sameElements(b.features),
          "deserialized codec diverges from the original")
      case (None, None) => ()
      case _ => fail("serialization changed accept/reject behavior")
    }
  }

  test("FakeDecoder passes the MediaCodec conformance contract") {
    codecConformance(Multimodal.FakeDecoder)
  }

  test("PpmDecoder passes the SAME MediaCodec conformance contract") {
    // the boundary is only real if a SECOND decoder with genuinely
    // different semantics (header grammar + raster, hard rejects —
    // most conformance inputs are rejects here, where FakeDecoder
    // accepts everything) satisfies the identical contract
    codecConformance(Multimodal.PpmDecoder)
  }

  test("PpmDecoder: exact decode of a known P6 image, and documented rejects") {
    val img = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 30, 40, 110)
    val d = Multimodal.PpmDecoder.decode(img)
    assert(d.width === 2 && d.height === 1)
    // means over the 2 pixels: R (10+30)/2, G (20+40)/2, B (30+110)/2
    assert(d.features(0) === 20.0 && d.features(1) === 30.0 &&
      d.features(2) === 70.0)
    assert(d.features(3) === 0.299 * 20.0 + 0.587 * 30.0 + 0.114 * 70.0)
    def rejects(b: Array[Byte], why: String): Unit = {
      // intercept itself fails the test if the decode is ACCEPTED
      intercept[Multimodal.MediaDecodeException] {
        Multimodal.PpmDecoder.decode(b)
      }
      ()
    }
    rejects("P5\n2 1\n255\n1234567890".getBytes("US-ASCII"), "bad magic")
    rejects("P6\n2 1\n255\n12345".getBytes("US-ASCII"), "truncated raster")
    rejects("P6\n0 1\n255\n".getBytes("US-ASCII"), "zero width")
    rejects("P6\n2 1\n65535\n123456789012".getBytes("US-ASCII"),
      "16-bit maxval")
    rejects(Array.emptyByteArray, "empty input")
    // w*h*3 would overflow Long (1431655766^2 * 3 > 2^63) — the raster
    // bound must reject BEFORE the multiply, not wrap negative and
    // accept (round-13 ADVICE overflow guard)
    rejects("P6\n1431655766 1431655766 255\n123".getBytes("US-ASCII"),
      "Long-overflow dimensions")
    rejects("P6\n2147483647 2147483647 255\n123".getBytes("US-ASCII"),
      "Int.MaxValue dimensions")
  }

  test("law: the banded media-dedup path re-verified under PpmDecoder at sf0.01") {
    // the swap receipt: wrap every sf0.01 media payload as a valid P6
    // image (identical payload ⇒ identical PPM ⇒ identical decode — the
    // structural recall argument, codec-independent), decode with the
    // SECOND codec through the same decodedSig entry, plant the same
    // +10^9 verbatim copies, and run the same factored band+verify
    // body. Every planted pair must surface with its original — the
    // pipeline's correctness does not depend on FakeDecoder specifics.
    val sf001 = "/root/testdata/sf0.01"
    def ppmWrap(payload: Array[Byte]): Array[Byte] = {
      val w = 4
      val h = math.max(1, (payload.length + 11) / 12)
      s"P6\n# wrapped payload\n$w $h\n255\n".getBytes("US-ASCII") ++
        java.util.Arrays.copyOf(payload, w * h * 3)
    }
    val wrapped = Multimodal.ensureMediaStore(spark, sf001)
      .select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), ppmWrap(r.getAs[Array[Byte]]("payload"))))
      .toSeq.toDF("doc_id", "payload")
    val sig = Multimodal.decodedSig(wrapped, Multimodal.PpmDecoder)
    val withPlants = sig.unionAll(
      sig.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
    val got = Multimodal.mediaDupPairsOnSigs(withPlants)
      .as[(Long, Long)].collect().toSet
    val planted = wrapped.filter(col("doc_id") % 10 === 0)
      .select("doc_id").as[Long].collect()
      .map(id => (id, id + 1000000000L)).toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(got),
      s"planted pairs missed under PpmDecoder: ${(planted -- got).take(5)}")
  }

  test("law: media features ride the embedding NEAR-dup path — perturbed planted payloads recovered") {
    // q_dedup_media's oracle covers the exact-copy (structural) case;
    // this law covers the probabilistic near-dup case the oracle can't:
    // perturb one byte of each planted LONG payload (128 bytes,
    // doc_id % 8 == 7) by ±16 — byteSum mod 16 and length are invariant
    // so width/height hold, and f0 shifts by only 16/128 = 0.125, a
    // genuine near-dup in the CENTERED feature space q_dedup_media
    // codes (where a random pair is NOT near-parallel). The SAME
    // Dedup.embeddingNearDup pipeline the text embeddings use must flag
    // every planted vector as a dup with its original as the nearest
    // neighbor. Deterministic end-to-end (seeded hyperplanes,
    // deterministic store), so exact assertions are safe.
    val pay = Multimodal.ensureMediaStore(spark, sf0001)
      .select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    def sigRow(id: Long, b: Array[Byte]): (Long, Int, Int, Double, Double, Double, Double) = {
      val d = FakeDecoder.decode(b)
      (id, d.width, d.height, d.features(0), d.features(1), d.features(2), d.features(3))
    }
    val longPay = pay.filter(_._1 % 8 == 7)
    assert(longPay.nonEmpty)
    val planted = longPay.map { case (id, b) =>
      val p = b.clone()
      val v = p(0) & 0xFF
      p(0) = (if (v < 240) v + 16 else v - 16).toByte
      sigRow(id + 1000000000L, p)
    }
    val frame = (pay.map { case (id, b) => sigRow(id, b) } ++ planted).toSeq
      .toDF("doc_id", "width", "height", "f0", "f1", "f2", "f3")
      .select(col("doc_id").as("vec_id"),
        Multimodal.centeredFvec.as("embedding"))
    val out = graft.operators.Dedup.embeddingNearDup(frame).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(3)))
    val flagged = out.filter(_._1 >= 1000000000L)
    assert(flagged.length === planted.length)
    flagged.foreach { case (vid, nn, isDup) =>
      assert(isDup, s"planted near-dup $vid not flagged (nn=$nn)")
      assert(nn === vid - 1000000000L,
        s"planted $vid nearest neighbor is $nn, not its original")
    }
  }
}
