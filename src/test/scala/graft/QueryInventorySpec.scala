package graft

/** Inventory invariants the driver relies on. */
class QueryInventorySpec extends SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
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
