package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Banding

/** Laws for the banded-prefix-sum machinery introduced in round 7:
  * Banding.offsets must equal the naive sequential scan on ANY band
  * table (gaps, single band, multi-column partials), and q_lorenz's
  * integer decile arithmetic must reproduce SQL ntile(k) exactly for
  * every (n, rank) — these two facts are what make the banded plans
  * bit-identical to the single-window forms they replaced.
  */
class BandingSpec extends SparkSpec {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private def offsetsOf(rows: Seq[(Long, Seq[Long])], nCols: Int): Map[Long, Seq[Long]] = {
    val schema = StructType(StructField("bkt", LongType, nullable = false) +:
      (1 to nCols).map(i => StructField(s"p$i", LongType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (b, ps) => Row.fromSeq(b +: ps) }: _*),
      schema)
    Banding.offsets(df, (1 to nCols).map(i => s"o$i"))
      .collect().map(r => r.getLong(0) -> (1 to nCols).map(r.getLong).toSeq).toMap
  }

  test("law: offsets equal the sequential strictly-preceding scan (sparse bands, 2 columns)") {
    val genBands = Gen.mapOf(Gen.zip(
      Gen.choose(0L, 1023L),
      Gen.zip(Gen.choose(0L, 1000000L), Gen.choose(0L, 1000000L))))
    checkProp(Prop.forAll(genBands) { bands: Map[Long, (Long, Long)] =>
      val rows = bands.toSeq.map { case (b, (x, y)) => (b, Seq(x, y)) }
      val got = offsetsOf(rows, 2)
      // naive reference: fold the band table in ascending bkt order
      var accX = 0L; var accY = 0L
      val want = rows.sortBy(_._1).map { case (b, Seq(x, y)) =>
        val o = b -> Seq(accX, accY); accX += x; accY += y; o
      }.toMap
      got == want
    })
  }

  test("offsets on an empty and a single-band table") {
    assert(offsetsOf(Seq.empty, 1) === Map.empty)
    assert(offsetsOf(Seq((7L, Seq(42L))), 1) === Map(7L -> Seq(0L)))
  }

  test("law: the q_lorenz integer decile arithmetic reproduces ntile(k)") {
    // ntile(k) over n rows: the first n%k buckets take ceil(n/k) rows,
    // the rest floor(n/k) — the reference implementation below is the
    // SQL-standard definition (mirrors Spark/DuckDB NTile)
    def ntileRef(i: Long, n: Long, k: Long): Long = {
      val sz = n / k; val rem = n % k
      if (i <= rem * (sz + 1)) (i - 1) / (sz + 1) + 1
      else {
        require(sz > 0); rem + (i - rem * (sz + 1) - 1) / sz + 1
      }
    }
    // cross-check ntileRef against Spark's own ntile once per n
    val genN = Gen.choose(1, 200)
    checkProp(Prop.forAll(genN) { n: Int =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = (1 to n).toDF("i")
        .withColumn("nt", ntile(10).over(Window.orderBy("i")))
        .collect().map(r => r.getInt(0).toLong -> r.getInt(1).toLong).toMap
      (1 to n).forall { i =>
        df(i.toLong) == ntileRef(i.toLong, n.toLong, 10L)
      }
    })
  }
}
