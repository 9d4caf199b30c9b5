package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streaming
import graft.streaming.Streaming.Ev

/** Streaming extension: the streaming ops' results are pinned against
  * their batch twins (which are themselves DuckDB-oracled queries).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDs = Tables(spark, sf0001, "events")
    .select(col("user_id"), col("event_id"),
      unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    .as[Ev]

  test("batch sessionize (shared fold) matches the SQL-oracled window query") {
    val viaFold = Streaming.sessionizeBatch(eventsDs)
      .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaWindow = graft.operators.Windows.queries("q_sessionize")(spark, sf0001)
      .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaFold === viaWindow)
  }

  test("streaming sessionize emits exactly the closed sessions of the batch result") {
    val q = Streaming.sessionize(eventsDs)  // bounded input: batch Dataset
    // On a bounded (non-streaming) Dataset, flatMapGroupsWithState runs in
    // batch mode: every group is fully present, open tails stay unflushed.
    val emitted = q.select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Streaming.sessionizeBatch(eventsDs)
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("last"))
    val closed = batch.join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") < col("last"))
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(emitted === closed)
  }

  test("streaming session_window emits exactly the watermark-finalized batch sessions") {
    val sink = "stream_session_out"
    val q = Streaming.sessionWindowCounts(spark, sf0001)
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
      .select("user_id", "sess_start", "n_events")
      .as[(Long, Long, Long)].collect().toSet

    // batch truth with session end times (sess_start matches session_window
    // start: both are the first event second of the session)
    val batch = Streaming.sessionizeBatch(eventsDs)
      .select("user_id", "sess_start", "n_events", "sess_end")
      .as[(Long, Long, Long, Long)].collect()
    val batchSet = batch.map(r => (r._1, r._2, r._3)).toSet
    assert(streamed.subsetOf(batchSet),
      s"streamed sessions not in batch: ${streamed -- batchSet}")
    // append mode only holds back sessions the final watermark hasn't
    // passed: everything closed 2h(+gap) before the max event time MUST
    // have been emitted
    val maxSec = batch.map(_._4).max
    val mustEmit = batch.filter(r => r._4 + 1800 < maxSec - 7200)
      .map(r => (r._1, r._2, r._3)).toSet
    assert(mustEmit.subsetOf(streamed),
      s"finalized sessions never emitted: ${(mustEmit -- streamed).take(5)}")
    assert(streamed.nonEmpty)
  }

  test("streaming dedup-within-watermark restores exactly-once from duplicated delivery") {
    val sink = "stream_dedup_out"
    val q = Streaming.dedupedStream(spark, sf0001)
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(sink)
    val events = Tables(spark, sf0001, "events")
    assert(got.count() === events.count(), "each doubled event emitted exactly once")
    assert(got.select("event_id").distinct().count() === events.count())
  }

  test("streaming tumbling window matches batch q_time_bucket counts and sums") {
    val sink = "stream_tumbling_out"
    val q = Streaming.tumblingCounts(spark, sf0001)
      .writeStream.outputMode("update").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
      // update mode: last update wins; n grows monotonically, so the
      // struct-max picks the latest (n, sum_value) pair
      .groupBy("hour_ts", "event_type")
      .agg(max(struct(col("n"), col("sum_value"))).as("last"))
      .select(col("hour_ts"), col("event_type"),
        col("last.n").as("n"), col("last.sum_value").as("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map { case (t, e, n, sv) => ((t.getTime, e), (n, sv)) }.toMap
    val batch = graft.operators.Windows.queries("q_time_bucket")(spark, sf0001)
      .select(col("hour_ts").cast("timestamp").as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map { case (t, e, n, sv) => ((t.getTime, e), (n, sv)) }.toMap
    assert(streamed === batch)
  }

  test("q_stream_tumbling (memory-sink complete mode) equals the batch twin") {
    val viaStream = Streaming.queries("q_stream_tumbling")(spark, sf0001)
      .select(col("hour_ts").cast("timestamp"), col("event_type"), col("n"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val viaBatch = graft.operators.Windows.queries("q_time_bucket")(spark, sf0001)
      .select(col("hour_ts").cast("timestamp"), col("event_type"), col("n"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(viaStream === viaBatch)
  }
}
