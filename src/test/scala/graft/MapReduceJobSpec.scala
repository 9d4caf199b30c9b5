package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.mr.MapReduceJob

/** Fidelity tests for the MapReduce core.
  *
  * Golden test: the reference's only test (smoke.sh:1) — word count over
  * example.py:4-8's four nursery-rhyme lines, 20 exact (word, count)
  * pairs. Order-insensitive (the reference prints an unordered Python-2
  * dict, README.md:72-74).
  *
  * Law tests (SURVEY.md §5.3): combiner soundness (with/without collectfn
  * agree for associative reducers — implied by mincemeat.py:174-176) and
  * map-output-order insensitivity.
  */
class MapReduceJobSpec extends SparkSpec {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  // example.py:4-8, verbatim
  private val lines = Seq(
    "Humpty Dumpty sat on a wall",
    "Humpty Dumpty had a great fall",
    "All the King's horses and all the King's men",
    "Couldn't put Humpty together again")

  // smoke.sh:1, verbatim (as a Map — order-insensitive comparison)
  private val golden = Map(
    "a" -> 2, "on" -> 1, "great" -> 1, "Humpty" -> 3, "again" -> 1,
    "wall" -> 1, "Dumpty" -> 2, "men" -> 1, "had" -> 1, "all" -> 1,
    "together" -> 1, "King's" -> 2, "horses" -> 1, "All" -> 1,
    "Couldn't" -> 1, "fall" -> 1, "and" -> 1, "the" -> 2, "put" -> 1,
    "sat" -> 1)

  private def wordCountJob(withCombiner: Boolean) = MapReduceJob[Int, String, String, Int](
    mapfn = (_, v) => v.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1)),
    reducefn = (_, vs) => vs.sum,
    collectfn = if (withCombiner) Some((_: String, vs: Seq[Int]) => vs.sum) else None)

  test("golden word count matches smoke.sh exactly (no combiner)") {
    val ds = lines.zipWithIndex.map { case (l, i) => (i, l) }.toMap
    assert(wordCountJob(withCombiner = false).run(spark.sparkContext, ds) === golden)
  }

  test("golden word count matches smoke.sh exactly (with collectfn combiner)") {
    val ds = lines.zipWithIndex.map { case (l, i) => (i, l) }.toMap
    assert(wordCountJob(withCombiner = true).run(spark.sparkContext, ds) === golden)
  }

  test("associative fast path agrees with holistic path") {
    val ds = lines.zipWithIndex.map { case (l, i) => (i, l) }.toMap
    val fast = MapReduceJob.associative[Int, String, String, Int](
      mapfn = (_, v) => v.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1)),
      op = _ + _)
    assert(fast.run(spark.sparkContext, ds) === golden)
  }

  test("holistic reducefn sees the whole value list (non-associative reduce)") {
    // reducefn = "count distinct parities" — not expressible as a binary fold
    val job = MapReduceJob[Int, Int, Int, Int](
      mapfn = (_, v) => Iterator((v % 3, v)),
      reducefn = (_, vs) => vs.map(_ % 2).distinct.size)
    val data = (1 to 100).map(i => (i, i)).toMap
    val got = job.run(spark.sparkContext, data)
    assert(got === Map(0 -> 2, 1 -> 2, 2 -> 2))
  }

  test("law: combiner soundness — collectfn never changes an associative result") {
    val genData = Gen.mapOf(Gen.zip(Gen.choose(0, 50), Gen.choose(-100, 100)))
    checkProp(Prop.forAll(genData) { (data: Map[Int, Int]) =>
      val mk = (withC: Boolean) => MapReduceJob[Int, Int, Int, Int](
        mapfn = (_, v) => Iterator((math.abs(v) % 7, v)),
        reducefn = (_, vs) => vs.sum,
        collectfn = if (withC) Some((_: Int, vs: Seq[Int]) => vs.sum) else None)
      val rdd = spark.sparkContext.parallelize(data.toSeq, 4)
      mk(false).run(rdd) == mk(true).run(rdd)
    })
  }

  test("law: result independent of input partitioning / map order") {
    val data = (1 to 200).map(i => (i, s"w${i % 13}")).toMap
    val job = MapReduceJob[Int, String, String, Int](
      mapfn = (_, v) => Iterator((v, 1)),
      reducefn = (_, vs) => vs.sum)
    val r1 = job.run(spark.sparkContext.parallelize(data.toSeq, 1))
    val r8 = job.run(spark.sparkContext.parallelize(data.toSeq.reverse, 8))
    assert(r1 === r8)
  }
}
