package graft

/** Round-7 verdict item 6: a failed fixture-store build must be REPORTED,
  * not swallowed — previously every ensure* call in Bench sat behind
  * `catch { case _: Throwable => () }` and a broken store surfaced only as
  * misleading downstream query timings.
  */
class BenchSetupSpec extends SparkSpec {

  test("runSetup reports each broken store by name instead of swallowing") {
    // A directory with no parquet fixtures: every store build that reads a
    // fixture table must fail, and each failure must land in the returned
    // list so the bench JSON's setup_failed field carries it.
    val bogus = java.nio.file.Files
      .createTempDirectory("graft_bench_setup_bogus").toString
    val failed = Bench.runSetup(spark, bogus)
    assert(failed.nonEmpty, "no setup failures reported for a fixture-less dir")
    assert(failed.contains("bucketed_tables"),
      s"bucketed_tables build against $bogus should fail and be named; got $failed")
    assert(failed.contains("gram_store"), s"got $failed")
  }

  test("runSetup succeeds cleanly against real fixtures") {
    val failed = Bench.runSetup(spark, sf0001)
    assert(failed.isEmpty, s"unexpected setup failures: $failed")
  }
}
