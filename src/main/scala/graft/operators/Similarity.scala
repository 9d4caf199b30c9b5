package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions, Hashing}

/** Similarity search over the `embeddings` table (SURVEY.md §2.2
  * "Similarity join"): brute-force cosine top-k as the oracle-checkable
  * baseline, and a hyperplane-LSH bucketed variant as the scale path.
  *
  * Scale design: brute-force is a broadcast of the (small) query set
  * against a full scan of the corpus — O(corpus) with no shuffle of the
  * big side, the right baseline shape even at 100 TB. The LSH variant
  * replaces the full scan with equi-joins on band values, trading recall
  * for a corpus-side shuffle bounded by bucket size.
  */
object Similarity {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-10 for query vectors vec_id < 5. The cosine
    // is a native codegen'd Catalyst expression (graft.functions
    // .CosineSimilarity); TakeOrdered-per-group via row_number.
    "q_ann_bruteforce" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      val sims = e.select(col("vec_id").as("nid"), col("embedding").as("n_emb"))
        .crossJoin(broadcast(q))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          call_function("cosine_sim", col("q_emb"), col("n_emb")).as("cos"))
      sims.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
        .filter(col("rn") <= 10)
        .select("qid", "nid", "cos", "rn")
    }),

    // LSH-bucketed ANN: candidates share at least one 4-bit hyperplane
    // band with the query; exact cosine + top-10 within candidates.
    // Approximate by construction -> rows-only check; SimilaritySpec
    // measures recall against q_ann_bruteforce.
    "q_ann_lsh" -> ((s, dir) => {
      GraftFunctions.register(s)
      val e = Tables(s, dir, "embeddings")
        .withColumn("code", Hashing.hyperplane(col("embedding")))
      val bands = e.select(
          col("vec_id"), col("embedding"),
          explode(expr(
            "transform(sequence(0, 3), b -> struct(b AS band, shiftright(code, b*4) & 15 AS bv))")).as("x"))
        .select(col("vec_id"), col("embedding"), col("x.band").as("band"), col("x.bv").as("bv"))
      val qb = bands.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"), col("band"), col("bv"))
      val cand = bands
        .select(col("vec_id").as("nid"), col("embedding").as("n_emb"), col("band"), col("bv"))
        .join(qb, Seq("band", "bv"))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          call_function("cosine_sim", col("q_emb"), col("n_emb")).as("cos"))
        .groupBy("qid", "nid").agg(first(col("cos")).as("cos"))
      cand.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))))
        .filter(col("rn") <= 10)
        .select("qid", "nid", "cos", "rn")
    })
  )

  val oracles: Map[String, String] = Map(
    // Same fold order and formula shape as CosineSimilarity -> bit-equal
    // doubles; ordering ties broken by nid.
    "q_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS q_emb FROM embeddings
                    WHERE vec_id < 5),
         sims AS (
           SELECT q.qid, e.vec_id AS nid,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(q.q_emb) + 1),
                 i -> CAST(q.q_emb[i] AS DOUBLE) * e.embedding[i])),
               (a, x) -> a + x)
             / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * x)), (a, x) -> a + x))
                * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)), (a, x) -> a + x)))
             AS cos
           FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
         ranked AS (
           SELECT qid, nid, cos,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INTEGER) AS rn
           FROM sims)
         SELECT qid, nid, cos, rn FROM ranked WHERE rn <= 10"""
  )
}
