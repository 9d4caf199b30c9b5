package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_scan_json" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"
  )
}
