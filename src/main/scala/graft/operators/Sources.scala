package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_replace}

import graft.Tables

/** Driver-visible source-format coverage (SURVEY.md §2.2 "Scans"): the
  * reference accepts any dict-like datasource (mincemeat.py:306), so a
  * user's first act against a real lake is reading CSV/JSON. Each query
  * round-trips a fixture table through the format under test — write from
  * parquet, read back through the CSV/JSON reader with an explicit schema —
  * and is oracled against DuckDB's view of the original parquet, proving
  * the full parse path (quoting, escaping, numeric round-trip) value-exact.
  *
  * Scale note: both readers are splittable multi-file scans (one task per
  * file split), same as production ingest; the fixture write is just the
  * test harness side of the round-trip.
  */
object Sources {

  /** Shared tmp root for fixture side-files written by round-trip / bucketed
    * queries (also used by Joins.q_join_bucketed).
    */
  def fixturePath(dir: String, tag: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_fixtures/$safe/$tag"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_scan_csv" -> ((s, dir) => {
      val n = Tables(s, dir, "nation")
      val out = fixturePath(dir, "nation_csv")
      n.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(n.schema).option("header", "true").csv(out)
    }),

    "q_scan_json" -> ((s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val out = fixturePath(dir, "supplier_json")
      sup.write.mode("overwrite").json(out)
      // explicit schema: JSON inference would widen int -> bigint; doubles
      // round-trip exactly via shortest-repr serialization
      s.read.schema(sup.schema).json(out)
    }),

    // ORC: the other major columnar lake format (native Spark source, with
    // the same pushdown/pruning machinery as parquet).
    "q_scan_orc" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val out = fixturePath(dir, "customer_orc")
      c.write.mode("overwrite").orc(out)
      s.read.schema(c.schema).orc(out)
    }),

    // Line-oriented text: the reference's primary ingest shape (a dict of
    // file contents, README.md:76). Order is not preserved by the write —
    // the driver's order-insensitive compare is exactly right for it.
    // Newlines are squashed BEFORE the write (the text sink does no
    // escaping, so an embedded \n would split one document into two rows
    // while the oracle still counts one).
    "q_scan_text" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("text"))
      val out = fixturePath(dir, "documents_text")
      d.write.mode("overwrite").text(out)
      s.read.text(out).select(col("value").as("text"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_scan_json" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "q_scan_orc" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "q_scan_text" ->
      """SELECT regexp_replace(text, '[\r\n]', ' ', 'g') AS text FROM documents"""
  )
}
