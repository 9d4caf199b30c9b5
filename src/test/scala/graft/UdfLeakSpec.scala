package graft

/** Repo-wide plan hygiene gate: no registered query may carry a boxed
  * Scala UDF (or a Python eval node) in its optimized plan — every scalar
  * hot path must be a built-in or a native codegen Expression. PlanAudit
  * prints these markers for eyeballing; this spec makes the invariant a
  * failing test instead of a dashboard.
  *
  * Typed operations (mapGroups / Aggregator / the MapReduceJob RDD core)
  * are object-operators, not ScalaUDF nodes, so they pass — the gate
  * targets exactly the `udf {}`-style per-row boxing that kills codegen.
  */
class UdfLeakSpec extends SparkSpec {

  test("no registered query plans a ScalaUDF or Python eval node") {
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // streaming/engine-running queries execute on construction and are
      // plan-audited via their batch twins; skip the expensive ones here
      if (name.startsWith("q_stream_")) None
      else {
        val plan = fn(spark, sf0001).queryExecution.optimizedPlan.toString
        val bad = Seq("ScalaUDF", "BatchEvalPython", "PythonUDF").filter(plan.contains)
        if (bad.nonEmpty) Some(s"$name -> ${bad.mkString(",")}") else None
      }
    }
    assert(leaks.isEmpty, s"boxed UDFs leaked into: ${leaks.mkString("; ")}")
  }
}
