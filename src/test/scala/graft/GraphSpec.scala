package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Law tests for the iterative graph kernels on hand-checkable graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetrize an undirected pair list into (src,dst) + (node,deg). */
  private def graph(pairs: Seq[(Long, Long)]): (DataFrame, DataFrame) = {
    val und = pairs.toDF("u", "v")
    val edges = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    (edges, deg)
  }

  test("pagerank: symmetric complete graph is uniform and mass-conserving") {
    // K4: by symmetry every node must get exactly the same rank, and the
    // fixed-point update conserves total mass up to floor-division slack
    // (< 1 unit per node per term).
    val (edges, deg) = graph(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    val pr = Graph.pageRank(edges, deg).collect()
    assert(pr.length === 4)
    val ranks = pr.map(_.getAs[Long]("pr")).toSet
    assert(ranks.size === 1, s"complete-graph ranks must be uniform: $ranks")
    val total = pr.map(_.getAs[Long]("pr")).sum
    assert(math.abs(total - 1000000000000L) < 4 * 4 * 3,
      s"mass not conserved: $total")
  }

  test("pagerank: star center outranks leaves") {
    val (edges, deg) = graph(Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (10L, 4L), (10L, 5L)))
    val pr = Graph.pageRank(edges, deg).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    val leaves = (1L to 5L).map(pr)
    assert(leaves.toSet.size === 1, "leaves must tie by symmetry")
    assert(pr(10L) > leaves.head * 3,
      s"center ${pr(10L)} must dominate leaf ${leaves.head}")
  }

  test("bfs: path graph distances are exact and hop-bounded") {
    // 1-2-3-4-5 path, source auto-selected as min node (1).
    val (edges, deg) = graph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val d = Graph.bfs(edges, deg, deg.agg(min(col("node")).as("sstart")))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
      s"3-hop BFS from 1 on a path must reach exactly 4 nodes: $d")
  }

  test("bfs: disconnected component stays unreached") {
    val (edges, deg) = graph(Seq((1L, 2L), (5L, 6L)))
    val d = Graph.bfs(edges, deg, deg.agg(min(col("node")).as("sstart")))
      .collect().map(r => r.getAs[Long]("node")).toSet
    assert(d === Set(1L, 2L))
  }
}
