package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Language identification behind a formal boundary — the third
  * swap-ready contract in the repo after `MediaCodec` (round 13) and
  * `Tokenizer` (round 14): a `LangIdModel` produces exactly one
  * `(doc_id, predicted)` row per document, totally and
  * deterministically, and LangIdSpec's conformance contract is
  * instance-agnostic. Two REAL instances prove the boundary swaps:
  *
  *  - [[LangId.StopwordLangId]] — the stopword-count heuristic behind
  *    q_lang_id / q_lang_confusion (fixed 4-language domain; zero
  *    training; pure scan-rate map).
  *  - [[LangId.TrigramLangId]] — Cavnar–Trenkle rank-order character-
  *    trigram profiles (Cavnar & Trenkle 1994): per-language top-K
  *    trigram ranks trained ONCE from the labeled corpus into the
  *    `langprof_v1` store (a one-time artifact, like every other base
  *    store), then each document's own top-K trigram ranks score
  *    against each profile by the out-of-place distance (|doc rank −
  *    profile rank|, missing → K) and the minimum wins, lang-ascending
  *    ties. Its domain is DATA-DRIVEN — it predicts any label the
  *    training corpus carries (the fixture's `zh` included, which the
  *    stopword instance structurally cannot emit).
  *
  * 100 TB shape (trigram instance): training aggregates to ≤
  * langs × K rows once; prediction computes each doc's rank profile
  * NATIVELY inside one projection (trigram_rank_profile — the explode
  * → count → rank-window chain it replaces shuffled ~one row per
  * corpus character twice), so the first shuffle classification pays
  * is the (doc, lang) distance aggregate over ≤ K × langs-bounded
  * match rows; the profile side joins as a broadcast of ≤ langs × K
  * rows. Every distance is integer arithmetic — the oracle comparison
  * has no float surface at all.
  */
sealed trait LangIdModel {
  def name: String

  /** One `(doc_id, predicted)` row per document of the fixture at
    * `dir` — the conformance surface (totality, label domain,
    * determinism are LangIdSpec laws over exactly this frame).
    */
  def predictions(s: SparkSession, dir: String): DataFrame
}

object LangId {

  /** Profile/doc rank depth K (Cavnar & Trenkle use 300; 150 keeps the
    * sf1 DuckDB oracle comfortable while the planted-separability law
    * shows the algebra is depth-independent). */
  val K = 150

  // private[graft]: LangDoorScale's stage decomposition must measure
  // the EXACT normalization the door runs, not an inline copy that
  // could drift (round-15 review)
  private[graft] def normTextCol(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** (key, tg, cnt) for every character trigram of the whitespace-
    * normalized lowercase text, keyed by `keyCol` — the TRAINING-side
    * explode+count (lang grain genuinely pools across docs; the
    * one-time store build keeps this transparent SQL chain). The
    * prediction side derives its per-doc profiles via the native
    * trigram_rank_profile expression instead — the two paths share the
    * normalization and must stay value-aligned, which LangIdSpec's
    * native-vs-SQL law pins over the fixture. */
  private def trigramCounts(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).as("k"), normTextCol(col("text")).as("_nt"))
      .select(col("k"), explode(
        when(length(col("_nt")) >= 3,
          expr("transform(sequence(1, length(_nt) - 2), i -> substring(_nt, i, 3))"))
          .otherwise(array())).as("tg"))
      .groupBy("k", "tg").agg(count(lit(1)).as("cnt"))

  /** Top-K rank profile per key: rank 1..K by (cnt desc, tg asc) — a
    * total order, so the K-cutoff is deterministic on both engines. */
  private def rankTopK(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("cnt").desc, col("tg").asc)
    counts.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= K)
      .select("k", "tg", "rank")
  }

  /** Train per-language profiles from a LABELED corpus: one rank-K
    * trigram profile per distinct `lang` value (data-driven domain). */
  def trainProfiles(docs: DataFrame): DataFrame =
    rankTopK(trigramCounts(docs.select(col("lang"), col("text")), "lang"))
      .select(col("k").as("lang"), col("tg"), col("rank"))

  /** The one-time `langprof_v1` store for the fixture at `dir`. */
  def ensureProfileStore(s: SparkSession, dir: String): DataFrame = {
    val path = Sources.ensureStore(dir, "langprof_v1") { tmp =>
      trainProfiles(Tables(s, dir, "documents"))
        .write.mode("overwrite").parquet(tmp)
    }
    s.read.parquet(path)
  }

  /** Out-of-place classification of `docs` against `profiles`: per doc,
    * distance to lang = K·n_tgs + Σ_matches (|doc_rank − prof_rank| − K)
    * — algebraically identical to "Σ |dr − rank| with missing → K" but
    * computable from the INNER join alone (missing trigrams never
    * materialize; the profile side broadcasts at ≤ langs × K rows).
    * Total: a doc with no trigrams (< 3 chars) has every distance 0 and
    * takes the lang-ascending tie-break, exactly as the oracle does.
    *
    * Output is LONG form — one (doc_id, lang, dist, predicted) row per
    * trained language per doc, the oracle's own shape. Labels stay DATA
    * end to end (never spliced into column names or SQL text, so any
    * label value works — the round-14 review caught the earlier wide
    * pivot breaking on non-identifier labels like 'pt-BR'); the argmin
    * is a doc-partitioned window over ≤ langs rows per doc, and the
    * whole path runs without a single driver collect. Integer
    * arithmetic throughout.
    */
  def classify(docs: DataFrame, profiles: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val langsDf = profiles.select("lang").distinct()
    // per-doc rank profile computed NATIVELY within the projection
    // (functions/TrigramExpressions.scala) — the SQL chain this
    // replaces (explode → (doc, tg) count → per-doc rank window)
    // shuffled ~one row per corpus character TWICE for what is a
    // per-document computation; LangIdSpec pins the two derivations
    // row-identical. Totality: a sub-3-char doc has an empty profile
    // (size 0) and a NULL-text doc a null one — coalesced to 0 so both
    // score dist = 0 everywhere, exactly the old left-join/coalesce and
    // the oracle's ntg CTE (round-14 review: the first native cut
    // dropped the null case). PRECONDITION (also review-surfaced): one
    // row per doc_id — the old (doc, tg) groupBy happened to pool
    // duplicate ids into one merged profile; the native per-row profile
    // does not, so duplicate ids now produce one profile per row. Every
    // call site feeds unique-id frames (the fixture table, door
    // micro-batches); callers with dubious inputs must dedup first.
    val docRanks = docs.select(col("doc_id"), explode(
        call_function("trigram_rank_profile",
          normTextCol(col("text")), lit(K))).as("p"))
      .select(col("doc_id"), col("p.tg").as("tg"), col("p.rank").as("dr"))
    // n_tgs = size of the profile, but the branch only needs the COUNT:
    // trigram_profile_size early-exits its distinct-set walk at K
    // instead of re-running the full count-map + sort the profile
    // branch pays (round-14 review — the two branches are separate plan
    // subtrees, so a shared _prof column would still evaluate twice);
    // null text → null → 0, the totality contract
    val nTgs = docs.select(col("doc_id"),
      coalesce(call_function("trigram_profile_size",
        normTextCol(col("text")), lit(K)), lit(0L)).as("n_tgs"))
    val adj = docRanks
      .join(broadcast(profiles.withColumnRenamed("rank", "pr")), Seq("tg"))
      .groupBy("doc_id", "lang")
      .agg(sum(abs(col("dr") - col("pr")) - lit(K.toLong)).as("adj"))
    val dist = nTgs.crossJoin(broadcast(langsDf))
      .join(adj, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        (lit(K.toLong) * col("n_tgs") + coalesce(col("adj"), lit(0L)))
          .as("dist"))
    // the argmin rides ONE full-frame window instead of the earlier
    // row_number-filter + self-join (round-14 review: the self-join
    // recomputed the whole dist subtree — documents scan, native
    // profile, distance agg — a second time for what is a per-doc
    // first_value over ≤ langs rows). Same (dist asc, lang asc) total
    // order, same output, half the doc-side work.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("dist").asc, col("lang").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    dist.withColumn("predicted", first(col("lang")).over(w))
  }

  /** The contract projection of [[classify]]'s long form: one
    * (doc_id, predicted) row per doc. Fused into the argmin window's
    * own output (round-14 verdict task 5): the long form carries
    * exactly one row per doc whose `lang` equals the winning
    * `predicted` (langs are distinct per doc and `predicted` is the
    * first of them), so selecting that row is a FILTER on the window
    * output — where the earlier `.distinct()` paid a second full
    * (doc_id, predicted) shuffle per call (per micro-batch, at the
    * door) for the same rows. LangIdSpec pins the two derivations
    * equal.
    */
  def predictionsOf(long: DataFrame): DataFrame =
    long.filter(col("lang") === col("predicted"))
      .select("doc_id", "predicted")

  /** The stopword-count heuristic behind q_lang_id, surfaced through
    * the boundary (same pipeline, projected to the contract columns).
    */
  case object StopwordLangId extends LangIdModel {
    val name = "stopword"
    def predictions(s: SparkSession, dir: String): DataFrame =
      Text.queries("q_lang_id")(s, dir).select("doc_id", "predicted")
  }

  /** Cavnar–Trenkle trigram profiles from the one-time store. */
  case object TrigramLangId extends LangIdModel {
    val name = "trigram"
    def predictions(s: SparkSession, dir: String): DataFrame =
      predictionsOf(
        classify(Tables(s, dir, "documents"), ensureProfileStore(s, dir)))
  }

  val instances: Seq[LangIdModel] = Seq(StopwordLangId, TrigramLangId)

  // ---------------------------------------------------------------- SQL

  // '\s+' reaches DuckDB's regex engine unescaped (DuckDB string
  // literals process no backslashes; Spark-side normalization uses the
  // Column API, so the two dialects never share a literal)
  private def normSql(col: String): String =
    s"trim(regexp_replace(lower($col), '\\s+', ' ', 'g'))"

  private def tgUnnestSql(key: String): String =
    s"""SELECT $key AS k, unnest(
         CASE WHEN length(${normSql("text")}) >= 3
           THEN list_transform(generate_series(1, length(${normSql("text")}) - 2),
             i -> (${normSql("text")})[i:i+2])
           ELSE []::VARCHAR[] END) AS tg
       FROM documents"""

  /** DuckDB twin of the whole trigram pipeline, generated from the same
    * K. Langs are data-driven on both sides; the argmin uses the same
    * (distance, lang) ascending order. Ends in `pred`; `dist` carries
    * one (doc, lang) row per trained language. `private[graft]` so the
    * lang-filter door's oracle (Streaming.scala) composes the same CTE
    * chain instead of duplicating it. */
  private[graft] def trigramCtes: String =
    s"""ltg AS (${tgUnnestSql("lang")}),
         lcc AS (SELECT k, tg, CAST(count(*) AS BIGINT) AS cnt
           FROM ltg GROUP BY 1, 2),
         prof AS (SELECT k AS lang, tg, rank FROM (
           SELECT k, tg, CAST(row_number() OVER
             (PARTITION BY k ORDER BY cnt DESC, tg ASC) AS BIGINT) AS rank
           FROM lcc) WHERE rank <= $K),
         dtg AS (${tgUnnestSql("doc_id")}),
         dcc AS (SELECT k, tg, CAST(count(*) AS BIGINT) AS cnt
           FROM dtg GROUP BY 1, 2),
         drk AS (SELECT k AS doc_id, tg, dr FROM (
           SELECT k, tg, CAST(row_number() OVER
             (PARTITION BY k ORDER BY cnt DESC, tg ASC) AS BIGINT) AS dr
           FROM dcc) WHERE dr <= $K),
         ntg AS (SELECT d0.doc_id, CAST(coalesce(c._n, 0) AS BIGINT) AS n_tgs
           FROM documents d0 LEFT JOIN (
             SELECT doc_id, count(*) AS _n FROM drk GROUP BY 1) c
           ON c.doc_id = d0.doc_id),
         adj AS (SELECT drk.doc_id, prof.lang,
             CAST(sum(abs(drk.dr - prof.rank) - $K) AS BIGINT) AS adj
           FROM drk JOIN prof ON prof.tg = drk.tg
           GROUP BY 1, 2),
         lgs AS (SELECT DISTINCT lang FROM prof),
         dist AS (SELECT ntg.doc_id, l.lang,
             CAST($K * ntg.n_tgs + coalesce(adj.adj, 0) AS BIGINT) AS dist
           FROM ntg CROSS JOIN lgs l
           LEFT JOIN adj ON adj.doc_id = ntg.doc_id AND adj.lang = l.lang),
         pred AS (SELECT doc_id, lang AS predicted FROM (
           SELECT doc_id, lang, row_number() OVER
             (PARTITION BY doc_id ORDER BY dist ASC, lang ASC) AS rn
           FROM dist) WHERE rn = 1)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the trigram instance's oracled surface, in langs-as-rows form so
    // neither engine hardcodes the label domain: one (doc, lang) row
    // per trained language with the integer out-of-place distance, plus
    // the argmin prediction repeated per row (comparator-friendly) —
    // classify's native long form, no pivot on either side
    "q_lang_id_trigram" -> ((s, dir) =>
      classify(Tables(s, dir, "documents"), ensureProfileStore(s, dir))
        .select("doc_id", "lang", "dist", "predicted")))

  val oracles: Map[String, String] = Map(
    "q_lang_id_trigram" ->
      s"""WITH $trigramCtes
         SELECT d.doc_id, d.lang, d.dist, p.predicted
         FROM dist d JOIN pred p ON p.doc_id = d.doc_id""")
}
