package graft

import org.apache.spark.sql.functions._
import graft.operators.Text

/** The Tokenizer boundary's conformance contract (round-13 verdict task
  * 5 — the MediaCodec/codecConformance convention applied to text):
  * every instance must segment EVERY input word exactly once into
  * non-empty symbols whose concatenation reconstructs the word, carry
  * frequencies through unchanged, log only merges of the form
  * merged == left+right, and train deterministically. A constructed
  * vocabulary where the count-ranked and likelihood-ranked selections
  * provably differ pins that WordPiece is a REAL second instance, and
  * the pretrain pipeline re-runs end-to-end under the swapped store
  * with every packing law intact.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val instances = Seq(Text.BpeTokenizer, Text.WordPieceTokenizer)

  private def fixtureWords = Text.bpeWordFreq(spark, sf0001)

  test("conformance: totality, reconstruction, frequency carry, log shape, determinism") {
    val synthetic = Seq(
      ("abab", 10L), ("abc", 7L), ("cab", 5L), ("zz", 3L), ("a", 2L))
      .toDF("word", "f")
    for (tok <- instances; wf <- Seq(synthetic, fixtureWords)) {
      val (merges, vocab) = tok.trainVocab(wf, rounds = 5)
      try {
        val in = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val out = vocab.select(array_join(col("syms"), "").as("word"),
            col("f"), col("syms"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
        // one segmentation per input word; nothing invented or dropped
        assert(out.map(_._1).toSet === in.keySet,
          s"${tok.name}: word set diverged")
        assert(out.length === in.size, s"${tok.name}: row count diverged")
        out.foreach { case (w, f, syms) =>
          assert(f === in(w), s"${tok.name}: frequency of '$w' changed")
          assert(syms.nonEmpty && syms.forall(_.nonEmpty),
            s"${tok.name}: empty symbol in '$w'")
          assert(syms.mkString("") === w,
            s"${tok.name}: reconstruction failed for '$w'")
        }
        // the log is well-formed and every merge really merges
        merges.foreach { case (rnd, a, b, m, cnt) =>
          assert(m === a + b, s"${tok.name}: merged != left+right at round $rnd")
          assert(cnt > 0L, s"${tok.name}: non-positive merge count")
        }
        assert(merges.map(_._1).sorted === merges.map(_._1),
          s"${tok.name}: rounds out of order")
        // deterministic: a second training selects the identical log
        val (merges2, vocab2) = tok.trainVocab(wf, rounds = 5)
        vocab2.unpersist()
        assert(merges2 === merges, s"${tok.name}: training not deterministic")
      } finally { vocab.unpersist(); () }
    }
  }

  test("the two instances provably differ: count winner != likelihood winner") {
    // (a,b) has the highest raw count (10) but saturated unigrams
    // (score 10/(10*10) = 0.1); (c,d) is rarer (9) but exclusive
    // (score 9/(9*9) ≈ 0.111) — BPE must pick ab first, WordPiece cd
    val wf = Seq(("ab", 10L), ("cd", 9L)).toDF("word", "f")
    val (bpeM, v1) = Text.BpeTokenizer.trainVocab(wf, rounds = 1)
    v1.unpersist()
    val (wpM, v2) = Text.WordPieceTokenizer.trainVocab(wf, rounds = 1)
    v2.unpersist()
    assert(bpeM.head._4 === "ab", s"BPE picked ${bpeM.head}")
    assert(wpM.head._4 === "cd", s"WordPiece picked ${wpM.head}")
  }

  test("tokenizer swap: the pretrain pipeline's packing laws hold under WordPiece at sf0.01") {
    // the verdict's done-criterion: q_pipeline_pretrain re-verified
    // under the second instance — same battery survivors, same packer,
    // only the segmentation store exchanged (wp_clean_v1); the
    // no-token-lost / consecutive-shard / gapless-tiling laws must be
    // tokenizer-independent
    val dir = "/root/testdata/sf0.01"
    val wpVocab = Text.tokenizerVocabView(
      spark.read.parquet(s"${Text.ensureCleanWordPieceStore(spark, dir)}/vocab"))
    val enc = Text.pretrainEncodedDocsWith(spark, dir, wpVocab).persist()
    val segs = Text.packedSegmentsOf(enc, shardBase = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(segs.nonEmpty)
    val truth = enc.collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Int](1).mkString("-"), r.getLong(2))).toMap
    segs.groupBy(_._2).foreach { case (doc, ss) =>
      val (fullIds, n) = truth(doc)
      val ordered = ss.sortBy(_._3)
      assert(ordered.head._3 === 0L, s"doc $doc first slice at ${ordered.head._3}")
      ordered.sliding(2).foreach {
        case Array((_, _, _, e1, _, _), (_, _, s2, _, _, _)) =>
          assert(s2 === e1 + 1, s"doc $doc gap/overlap")
        case _ =>
      }
      assert(ordered.last._4 === n - 1, s"doc $doc last slice short")
      assert(ordered.map(_._6).mkString("-") === fullIds,
        s"doc $doc: concatenated slices != WordPiece-encoded sequence")
    }
    assert(segs.map(_._2).toSet === truth.filter(_._2._2 > 0).keySet)
    val maxShard = segs.map(_._1).max
    segs.groupBy(_._1).foreach { case (shard, ss) =>
      val ordered = ss.sortBy(_._5)
      var pos = 0L
      ordered.foreach { s =>
        assert(s._5 === pos, s"shard $shard slice at ${s._5}, expected $pos")
        pos += s._4 - s._3 + 1
      }
      if (shard < maxShard) assert(pos === 2048L, s"shard $shard holds $pos")
      else assert(pos <= 2048L)
    }
    // and the swap is not vacuous: at least one word segments differently
    val bpeVocab = Text.tokenizerVocabView(
      spark.read.parquet(s"${Text.ensureCleanBpeStore(spark, dir)}/vocab"))
    val diff = wpVocab.join(bpeVocab.withColumnRenamed("syms", "bsyms"), "word")
      .filter(col("syms") =!= col("bsyms")).count()
    assert(diff > 0, "WordPiece and BPE segmented every word identically — swap vacuous")
    enc.unpersist(); ()
  }
}
