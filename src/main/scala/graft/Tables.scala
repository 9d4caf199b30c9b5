package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loader. One parquet file per table under the sf dir
  * (TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst gets
  * predicate pushdown / column pruning on the vectorized reader for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as two physical parquet types across fixture
    // generations; normalize BOTH to session-UTC TimestampType so every
    // downstream consumer (watermarks, unix_micros, window()) sees one
    // type carrying identical instants to DuckDB's view:
    //  - TIMESTAMP(NANOS): only readable via legacy nanosAsLong => LongType
    //    here; truncate ns -> us exactly like DuckDB does.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) => TimestampNTZType;
    //    cast reinterprets the naive value in the session zone (UTC in
    //    every session this repo builds), keeping the rendered instant
    //    identical while restoring the event-time-capable type.
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
