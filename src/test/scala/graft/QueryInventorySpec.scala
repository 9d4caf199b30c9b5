package graft

/** Inventory invariants the driver relies on. */
class QueryInventorySpec extends SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps are pairwise key-disjoint (Map ++ shadows silently)") {
    // a duplicate name across modules would let the later module's query
    // silently replace the earlier one in SparkEntry's ++ fold — this
    // happened once (Mining's funnel vs Windows' q_funnel) and only a
    // review caught it, so pin it
    import graft.operators._
    val modules: Seq[(String, Set[String])] = Seq(
      "Relational" -> Relational.queries.keySet,
      "Joins" -> Joins.queries.keySet,
      "Windows" -> Windows.queries.keySet,
      "Scalars" -> Scalars.queries.keySet,
      "Text" -> Text.queries.keySet,
      "Holistic" -> Holistic.queries.keySet,
      "Dedup" -> Dedup.queries.keySet,
      "Similarity" -> Similarity.queries.keySet,
      "Multimodal" -> Multimodal.queries.keySet,
      "Sources" -> Sources.queries.keySet,
      "Stats" -> Stats.queries.keySet,
      "Graph" -> Graph.queries.keySet,
      "Mining" -> Mining.queries.keySet,
      "TpchExt" -> TpchExt.queries.keySet,
      "LangId" -> LangId.queries.keySet,
      "Streaming" -> graft.streaming.Streaming.queries.keySet)
    val dups = for {
      Seq((na, a), (nb, b)) <- modules.combinations(2).toSeq
      k <- (a intersect b).toSeq
    } yield s"$k ($na vs $nb)"
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    val total = modules.map(_._2.size).sum
    assert(total === SparkEntry.queries.size,
      s"module key total $total != merged ${SparkEntry.queries.size}")
  }

  test("every query without an oracle is on the justified rows-only list") {
    // approximate/hash-specific/stubbed ops where ANSI SQL can't express
    // the semantics — each has spec coverage instead (DedupSpec,
    // SimilaritySpec, MultimodalSpec, FunctionsSpec)
    // approximate/hash-specific/stubbed ops where ANSI SQL can't express
    // the top-k/nearest output — each has BOTH spec coverage and (since
    // round 5) a driver-oracled planted-recall companion row
    // (q_ann_lsh_recall / q_ann_ivf_recall / q_ann_cross_recall /
    // q_dedup_simhash_recall); q_dedup_minhash graduated to a full exact
    // oracle (its banded result equals the brute-force pair join)
    val rowsOnlyJustified = Set(
      "q_approx_distinct",      // HLL sketch values are engine-specific
      "q_percentile_approx",    // KLL-style sketch, spec vs exact median
      "q_dedup_simhash",        // hash-specific, recall spec + recall row
      "q_dedup_embedding",      // LSH buckets, spec + q_dedup_embedding_recall row
      "q_ann_lsh",              // LSH top-k, recall spec + recall row
      "q_ann_ivf",              // kmeans index, recall spec + recall row
      "q_ann_cross",            // LSH cross-corpus, spec + recall row
      "q_sketch_union",         // HLL sketch binary, union-parity + bound spec
      // round-12: the door's band-union mode and its recall twin — band
      // collisions are hash-specific, so no ANSI SQL reproduces the
      // union arm; the oracled 2-probe door row stays the default
      // contract, StreamingSpec pins union-survivors ⊆ 2-probe-survivors
      // + split invariance, DedupSpec pins the recall-twin laws
      "q_stream_semantic_union",
      "q_dedup_semantic_recall_union")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled === rowsOnlyJustified,
      s"unjustified rows-only queries: ${unoracled -- rowsOnlyJustified}; " +
        s"stale justifications: ${rowsOnlyJustified -- unoracled}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    // legitimately empty on this data: EXCEPT of covered sets, anti join
    // when every customer has an order
    val allowEmpty = Set("q_except", "q_join_anti")
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      if (n == 0 && !allowEmpty(name)) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }
}
