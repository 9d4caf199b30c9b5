package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.Tables

/** Iterative graph analytics over the bounded co-purchase graph (same
  * construction as q_triangles / Joins.triangleStats: parts that share an
  * order, time-boxed so the wedge volume stays sane — SURVEY §2.4).
  * Complements the existing graph ops (triangle counting, near-dup
  * connected components) with the two classic iterative kernels: PageRank
  * and multi-source-capable BFS.
  *
  * Determinism strategy: ALL per-iteration arithmetic is 64-bit integer
  * fixed-point (scale 1e12) with floor division — contribution sums are
  * plain bigint SUMs, so the result is partition-order-independent and
  * bit-equal to a DuckDB oracle that unrolls the same iterations in SQL.
  * (A double-valued PageRank would make each node's score depend on
  * float summation order — the classic non-reproducibility trap in
  * distributed graph engines.)
  *
  * Scale shape: each iteration is ONE shuffle (contributions grouped by
  * destination) joined against the persisted edge/degree tables — the
  * Pregel step re-expressed relationally; no collect, no driver loop
  * over nodes. Edge and degree frames persist once and feed all
  * iterations.
  */
object Graph {

  /** Fixed-point scale: pr values are bigints ~ S * rank. */
  private val S = 1000000000000L // 1e12
  private val Damp = 85L // damping 0.85 as an integer percentage
  private val Iters = 3

  /** Symmetric directed edge list (both orientations of each undirected
    * co-purchase edge) + per-node out-degree — the iteration-invariant
    * state shared by q_pagerank / q_bfs / q_triangles-style kernels.
    */
  private def coPurchase(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val op = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val und = op.as("a").join(op.as("b"), Seq("o"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    val edges = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    (edges, deg)
  }

  /** One-time graph side table (same pattern as
    * Dedup.ensureBaseSignatureStore): the derived co-purchase edge list
    * and degree table are written to parquet ONCE per sf dir and read by
    * every graph query. At 100 TB deriving the edge list is two corpus
    * scans plus a self-join — amortizing it across the whole graph
    * family (and across sessions) is the difference between a bounded
    * side-table read and re-running the heaviest join in the repo per
    * query.
    */
  def ensureGraphStore(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // edges land (atomically) first; deg derives from the LANDED edges so
    // both stores agree even if the derivation ever changes mid-write
    val epath = Sources.ensureStore(dir, "graph_edges_v1") { tmp =>
      coPurchase(s, dir)._1.write.mode("overwrite").parquet(tmp)
    }
    val dpath = Sources.ensureStore(dir, "graph_deg_v1") { tmp =>
      s.read.parquet(epath).groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .write.mode("overwrite").parquet(tmp)
    }
    (s.read.parquet(epath), s.read.parquet(dpath))
  }

  /** Fixed-point PageRank over a directed edge list (src, dst) in which
    * every node has out-degree >= 1 and in-degree >= 1 (a symmetrized
    * undirected graph satisfies both). Returns (node, deg, n, pr) with pr
    * a bigint at scale [[S]]. Each iteration: one shuffle (contribution
    * sum grouped by destination) against the persisted edges/deg.
    */
  def pageRank(edges: DataFrame, deg: DataFrame, iters: Int = Iters): DataFrame = {
    // node count as a literal (one tiny distributed count over the
    // degree side table) rather than a 1-row crossJoin — keeps every
    // iteration's plan pure hash joins, no nested-loop stat join
    val nVal = deg.count()
    val nodes = deg.withColumn("n", lit(nVal))
    var pr = nodes.withColumn("pr", expr(s"$S div n"))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(pr.select(col("node"), expr("pr div deg").as("c")),
          col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("csum"))
      pr = nodes.join(contrib, nodes("node") === contrib("dst"))
        .select(nodes("node"), nodes("deg"), nodes("n"),
          expr(s"(${15L * S} div (100 * n)) + (($Damp * csum) div 100)")
            .as("pr"))
    }
    pr
  }

  /** Min-distance BFS frontier expansion: `iters` unrolled steps from the
    * given single-row (sstart) source frame. Returns (node, dist) for
    * every node reached within `iters` hops.
    */
  def bfs(edges: DataFrame, deg: DataFrame, srcRow: DataFrame,
      iters: Int = Iters): DataFrame = {
    var d = deg.crossJoin(broadcast(srcRow))
      .filter(col("node") === col("sstart"))
      .select(col("node"), lit(0).as("dist"))
    (1 to iters).foreach { _ =>
      d = d.unionAll(
          edges.join(d, col("src") === col("node"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
    }
    d
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank (3 iterations, d = 0.85) over the co-purchase graph.
    // pr is fixed-point: pr0 = S div N; each step sends pr div deg along
    // every out-edge, sums per destination (exact bigint — order-free),
    // and renormalizes as (15*S div (100*N)) + (85*sum div 100). The
    // symmetric graph guarantees deg >= 1 and at least one in-edge per
    // node, so no dangling-mass term is needed. Top-20 by (pr, node) —
    // integer ties broken by node id for a deterministic LIMIT.
    "q_pagerank" -> ((s, dir) => {
      val (edges, deg) = ensureGraphStore(s, dir)
      pageRank(edges, deg)
        .orderBy(desc("pr"), asc("node")).limit(20)
        .select(col("node").as("p_partkey"), col("pr").as("pr_fixed"),
          (col("pr").cast("double") / lit(1.0e12)).as("pagerank"))
    }),

    // Multi-hop BFS from the smallest part in the graph: 3 unrolled
    // frontier expansions, each ONE shuffle (min-dist re-group after
    // joining the frontier against the edge list). Reports the node count
    // per hop distance plus the still-unreached remainder (dist = -1) —
    // the reachability histogram shape used for graph-diameter checks.
    "q_bfs" -> ((s, dir) => {
      val (edges, deg) = ensureGraphStore(s, dir)
      // persist: the reached histogram AND the unreached anti-join both
      // consume d — without this the whole 3-iteration lineage runs twice
      val d = bfs(edges, deg, deg.agg(min(col("node")).as("sstart")))
        .persist()
      val reached = d.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      val unreached = deg.join(d, Seq("node"), "left_anti")
        .groupBy(lit(-1).as("dist")).agg(count(lit(1)).as("n_nodes"))
      reached.unionAll(unreached)
    }),

    // Degree distribution (power-of-two buckets): the shape audit run
    // before any iterative kernel — reads ONLY the persisted degree side
    // table (no corpus scan, no edge join), output bounded at ~64 rows
    // whatever the graph size. Bucket stays in exact integer domain:
    // floor(log2(deg)) via the bit-length of the binary string — no
    // float log2 whose floor could disagree at powers of two.
    "q_degree_dist" -> ((s, dir) => {
      val (_, deg) = ensureGraphStore(s, dir)
      deg.groupBy((length(bin(col("deg"))) - 1).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min("deg").cast(LongType).as("min_deg"),
          max("deg").cast(LongType).as("max_deg"))
    })
  )

  private val graphCte =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'),
       und AS (SELECT DISTINCT a.p AS u, b.p AS v
               FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
       e AS (SELECT u AS src, v AS dst FROM und
             UNION ALL SELECT v, u FROM und),
       deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src)"""

  val oracles: Map[String, String] = Map(

    "q_pagerank" ->
      s"""WITH $graphCte,
         nn AS (SELECT count(*) AS n FROM deg),
         p0 AS (SELECT node, deg, n, 1000000000000 // n AS pr
                FROM deg, nn),
         c1 AS (SELECT e.dst AS node, CAST(SUM(p0.pr // p0.deg) AS BIGINT) AS csum
                FROM e JOIN p0 ON e.src = p0.node GROUP BY e.dst),
         p1 AS (SELECT d.node, d.deg, nn.n,
                  CAST((15000000000000 // (100 * nn.n)) + ((85 * c1.csum) // 100)
                    AS BIGINT) AS pr
                FROM deg d JOIN c1 ON d.node = c1.node, nn),
         c2 AS (SELECT e.dst AS node, CAST(SUM(p1.pr // p1.deg) AS BIGINT) AS csum
                FROM e JOIN p1 ON e.src = p1.node GROUP BY e.dst),
         p2 AS (SELECT d.node, d.deg, nn.n,
                  CAST((15000000000000 // (100 * nn.n)) + ((85 * c2.csum) // 100)
                    AS BIGINT) AS pr
                FROM deg d JOIN c2 ON d.node = c2.node, nn),
         c3 AS (SELECT e.dst AS node, CAST(SUM(p2.pr // p2.deg) AS BIGINT) AS csum
                FROM e JOIN p2 ON e.src = p2.node GROUP BY e.dst),
         p3 AS (SELECT d.node, nn.n,
                  CAST((15000000000000 // (100 * nn.n)) + ((85 * c3.csum) // 100)
                    AS BIGINT) AS pr
                FROM deg d JOIN c3 ON d.node = c3.node, nn)
         SELECT node AS p_partkey, pr AS pr_fixed,
           CAST(pr AS DOUBLE) / 1000000000000.0 AS pagerank
         FROM p3 ORDER BY pr DESC, node LIMIT 20""",

    "q_bfs" ->
      s"""WITH $graphCte,
         sr AS (SELECT min(node) AS sstart FROM deg),
         d0 AS (SELECT sstart AS node, 0 AS dist FROM sr),
         d1 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d0
                  UNION ALL
                  SELECT e.dst, d0.dist + 1 FROM e JOIN d0 ON e.src = d0.node)
                GROUP BY node),
         d2 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d1
                  UNION ALL
                  SELECT e.dst, d1.dist + 1 FROM e JOIN d1 ON e.src = d1.node)
                GROUP BY node),
         d3 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d2
                  UNION ALL
                  SELECT e.dst, d2.dist + 1 FROM e JOIN d2 ON e.src = d2.node)
                GROUP BY node),
         r AS (SELECT CAST(dist AS INTEGER) AS dist, count(*) AS n_nodes
               FROM d3 GROUP BY dist
               UNION ALL
               SELECT -1, count(*) FROM deg
               WHERE node NOT IN (SELECT node FROM d3))
         SELECT dist, n_nodes FROM r WHERE n_nodes > 0""",

    "q_degree_dist" ->
      s"""WITH $graphCte
         SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
           count(*) AS n_nodes, CAST(min(deg) AS BIGINT) AS min_deg,
           CAST(max(deg) AS BIGINT) AS max_deg
         FROM deg GROUP BY 1"""
  )
}
