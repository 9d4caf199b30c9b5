package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension layer (SURVEY.md §2.2 "Streaming"):
  * absent from the reference (batch-only FSM, mincemeat.py:294-297), so
  * this is free design on Structured Streaming idioms — file source ->
  * watermarked event-time aggregation -> sink, plus custom session state
  * via flatMapGroupsWithState.
  *
  * Batch-verifiable: each op has a batch twin in graft.operators.Windows
  * (q_time_bucket, q_sessionize); StreamingSpec runs the stream over the
  * fixture parquet with a memory sink and asserts agreement.
  */
object Streaming {

  /** File-source stream over the events table, handling BOTH layouts: a
    * single `events.parquet` FILE (sf fixture dirs — needs the glob
    * filter, because the stream source's basePath must be a directory)
    * and an `events.parquet/` DIRECTORY of part files (scaled datasets
    * and any production table — read directly; the old glob-filter form
    * matched ZERO part files there, an empty stream that looked like a
    * fast run until the 16x smoke checked row counts, SCALE.md).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(batchSchema)
    // Layout check through the Hadoop FileSystem so remote stores
    // (hdfs://, s3a://) resolve too — java.io.File would answer false
    // for any non-local URI and silently re-create the empty-stream bug.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val isDir = hPath.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(hPath).isDirectory
    val raw =
      if (isDir) reader.parquet(path)
      else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
    // Same ts normalization as the batch loader (graft.Tables): nanos-era
    // fixtures arrive as raw longs (legacy nanosAsLong) — truncate to us;
    // micros-era fixtures arrive TIMESTAMP_NTZ — cast to session-UTC
    // TimestampType, which watermarks require.
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour event-time window with a 2-hour watermark: the
    * streaming twin of q_time_bucket. Append mode emits only finalized
    * windows; on a bounded file source + processAllAvailable the last
    * window needs `complete`/`update` — StreamingSpec uses update.
    */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // decimal-exact sum surfaced as double: same order-independent
      // bit-exact rule as the batch twin q_time_bucket
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour/30-minute event-time windows with a 2-hour watermark:
    * the streaming twin of the batch q_sliding_window.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Native session_window in streaming mode (the stateful twin of the
    * batch q_session_window): 30-minute gap sessions per user, finalized
    * and emitted once the 2-hour watermark passes a session's end. State
    * per key is one (start, end, count) triple — bounded regardless of
    * session length, and expired by the watermark.
    */
  def sessionWindowCounts(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("sw.start")).as("sess_start"),
        col("n_events"))

  /** Streaming exactly-once dedup: at-least-once delivery is modeled by
    * unioning two independent readers of the same source (every event
    * arrives twice, possibly in different micro-batches);
    * dropDuplicatesWithinWatermark keys state on event_id and expires it
    * once the 2-hour watermark passes — bounded state at any scale,
    * unlike an unbounded dropDuplicates. Batch twin: plain distinct on
    * event_id (StreamingSpec pins stream output count == batch count).
    */
  def dedupedStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir).union(eventsStream(spark, dir))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "ts")

  final case class Ev(user_id: Long, event_id: Long, sec: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      sess_start: Long, sess_end: Long)
  final case class SessState(sessionsClosed: Long, cur: Option[(Long, Long, Long)])

  /** Shared per-user fold: sorted events -> (closed sessions, open tail).
    * Session ids are 1-based ordinals per user — identical numbering to the
    * batch q_sessionize window query.
    */
  def foldSessions(user: Long, sorted: Seq[Ev], gapSeconds: Long,
      idOffset: Long, carry: Option[(Long, Long, Long)])
      : (Vector[SessionOut], Option[(Long, Long, Long)], Long) = {
    var closed = Vector.empty[SessionOut]
    var nClosed = idOffset
    var cur = carry
    sorted.foreach { e =>
      cur match {
        case Some((start, end, n)) if e.sec - end <= gapSeconds =>
          cur = Some((start, e.sec, n + 1))
        case Some((start, end, n)) =>
          nClosed += 1
          closed :+= SessionOut(user, nClosed, n, start, end)
          cur = Some((e.sec, e.sec, 1))
        case None =>
          cur = Some((e.sec, e.sec, 1))
      }
    }
    (closed, cur, nClosed)
  }

  /** Batch twin of [[sessionize]] through the same fold — proves the
    * stateful logic against the SQL-oracled q_sessionize in specs.
    */
  def sessionizeBatch(events: Dataset[Ev], gapSeconds: Long = 1800): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (user: Long, it: Iterator[Ev]) =>
        val sorted = it.toArray.sortBy(e => (e.sec, e.event_id))
        val (closed, cur, nClosed) = foldSessions(user, sorted.toSeq, gapSeconds, 0L, None)
        val tail = cur.map { case (start, end, n) =>
          SessionOut(user, nClosed + 1, n, start, end) }
        (closed ++ tail).iterator
      }
      .toDF()
  }

  /** Gap-based sessionization (30 min) with explicit state — the streaming
    * twin of q_sessionize. State per user: (#closed sessions, current
    * session (start, end, count)). ProcessingTimeTimeout flushes the open
    * session when the group goes quiet.
    *
    * Within one invocation events are sorted by (sec, event_id) — same
    * total order as the batch window — so on a replayed bounded source the
    * emitted sessions match the batch query exactly.
    */
  /** Driver-visible queries: the streaming layer's green CORRECTNESS rows.
    * q_stream_sessionize replays the EXACT fold the stateful
    * flatMapGroupsWithState path runs (foldSessions) in batch; StreamingSpec
    * pins the streaming execution to this fold, and the DuckDB oracle (same
    * SQL as q_sessionize) pins the fold. q_stream_tumbling goes further:
    * it executes the real Structured Streaming engine (file source ->
    * watermark -> windowed agg -> memory sink, complete mode so the sink
    * holds the final aggregation regardless of micro-batching) and returns
    * the sink table — the driver's oracle checks the streaming engine
    * end-to-end.
    */
  /** Runs a streaming frame into a uniquely-named memory sink until the
    * bounded source drains, then returns the sink table. One definition
    * of the lifecycle the engine queries share (start → drain → stop →
    * read → drop): the analyzed plan holds the sink data, so only the
    * catalog name is dropped — and it is dropped on the EXCEPTION path
    * too (the per-site copies leaked the temp view when the engine run
    * threw). The memory table registers on the FRAME's own session (some
    * callers fork one to size stream-grain shuffle partitions).
    */
  private def runToMemorySink(stream: org.apache.spark.sql.Dataset[_],
      prefix: String, mode: String): DataFrame = {
    val s = stream.sparkSession
    val sink = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val q = stream.writeStream.outputMode(mode).format("memory")
        .queryName(sink).start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    } finally s.catalog.dropTempView(sink)
  }

  /** Micro-batch count for the SPLIT-INVARIANT document doors (round-13
    * verdict task 7 — sweep-cost control): each door pays a fixed
    * ~per-micro-batch engine overhead, so 16 doors × 4 batches was ~60 s
    * of the 260 s full bench sweep, growing with every new door. Bench
    * sets `graft.door.batches=2` for its TIMING sweep; Verify and the
    * specs never set it, so every correctness gate still drives the full
    * 4-micro-batch ingest. Only doors whose output is documented
    * batch-split-INVARIANT (per-row/per-doc verdicts against a frozen
    * base) read this knob — the growing doors and sequential folds keep
    * their deterministic 4-group arrival order, and the event-time doors
    * (upsert/topk/sample) keep 4 so their watermark/merge cadence stays
    * the measured configuration.
    */
  private def doorSplit: Int =
    Integer.parseInt(System.getProperty("graft.door.batches", "4"))

  /** Scale-ADAPTIVE batch-parallelism spread (round-15 optimization;
    * guide §2 — partitioning must derive from input size, not a
    * constant tuned for one scale). One micro-batch = one arrival file
    * = 1-2 scan tasks, so a CPU-bound per-row door body (regex
    * battery, gram pass, trigram profile) runs single-task unless the
    * batch is spread across the box — the LangDoorScale finding that
    * cut the 64× lang door 105.5 → 15.5 s. But the spread is a
    * round-robin shuffle of the whole batch (plus the
    * sortBeforeRepartition local sort), a fixed ~0.5-1 s per batch at
    * ingest grain: on a sub-MB sf0.1 micro-batch it costs MORE than
    * single-task compute saves (measured on the containment door:
    * warm 2-batch run 9.1 s spread vs 5.6 s unspread — per-batch
    * 2.2 s vs 1.5 s). So spread ONLY when the arrival files carry
    * enough bytes that 32-way CPU wins: threshold default 1 MiB
    * (`graft.spread.minBytes`), far below the 16×/64× SCALE batches
    * (2-40 MB — those keep the spread and their receipts) and above
    * every sf0.001-0.1 door batch. Result-invariant by construction:
    * repartition changes layout, never rows, and every door output is
    * an unordered set (StreamingSpec's split-invariance laws hold
    * under any partitioning).
    */
  /** Decision half of the adaptive spread, computed ONCE at door setup
    * from the door's OWN arrival directory (the files it just wrote and
    * is about to stream): a foreachBatch frame is an RDDScanExec — it
    * exposes NO file metadata (`inputFiles` is empty), so the per-batch
    * size must come from the source layout. One micro-batch = one
    * arrival file, and the door's repartition(doorSplit) write makes
    * the files near-uniform, so "largest data file ≥ threshold" is the
    * per-batch decision. */
  private[graft] def spreadArrivals(s: SparkSession, src: String): Boolean = {
    val minBytes =
      java.lang.Long.parseLong(System.getProperty("graft.spread.minBytes",
        (1L << 20).toString))
    val p = new org.apache.hadoop.fs.Path(src)
    // fail OPEN on a listing error (round-15 ADVICE): spreading is
    // result-invariant and costs ~1 s/batch when wrong, while silently
    // NOT spreading an at-scale door regresses it ~7× (the 105.5 s vs
    // 15.5 s LangDoorScale case) — and log the error unconditionally so
    // a transient FS failure at door setup is never invisible.
    val sizes =
      try Some(p.getFileSystem(s.sessionState.newHadoopConf()).listStatus(p)
        .filter(st => st.isFile && {
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }).map(_.getLen))
      catch {
        case e: Exception =>
          System.err.println(
            s"[spreadArrivals] listing $src FAILED (${e.getClass.getSimpleName}: " +
              s"${e.getMessage}) — failing open, spread=true")
          None
      }
    val doSpread = sizes.forall(sz => sz.nonEmpty && sz.max >= minBytes)
    if (sys.env.contains("GRAFT_SPREAD_DEBUG"))
      System.err.println(s"[spreadArrivals] src=$src " +
        s"files=${sizes.map(_.length).getOrElse(-1)} " +
        s"max=${sizes.map(sz => if (sz.isEmpty) 0L else sz.max).getOrElse(-1L)} " +
        s"spread=$doSpread")
    doSpread
  }

  /** Driver-side parquet row count from file footers — metadata work,
    * no Spark job (round-16): the grow doors' per-batch size gates were
    * paying a full count() job round per micro-batch for a number the
    * footers already hold. Bounded by the grow-dir file count (one to a
    * handful of files per batch dir).
    */
  private[graft] def parquetFooterRows(s: SparkSession,
      dirs: Seq[String]): Long = {
    val conf = s.sessionState.newHadoopConf()
    dirs.iterator.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).iterator
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }
    }.sum
  }

  private[graft] def spreadBatch(batch: DataFrame, doSpread: Boolean): DataFrame =
    if (doSpread)
      batch.repartition(batch.sparkSession.sparkContext.defaultParallelism)
    else batch

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
        .as[Ev]
      sessionizeBatch(ev)
        .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
    }),

    // complete mode is the bounded VERIFICATION shape only (sink holds the
    // final aggregation regardless of micro-batching); the production
    // path is append + watermark, spec-pinned in StreamingSpec
    "q_stream_tumbling" -> ((s, dir) =>
      runToMemorySink(tumblingCounts(s, dir), "graft_q_stream_tumbling_", "complete")
        .select(col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
          col("event_type"), col("n"), col("sum_value"))),

    "q_stream_sliding" -> ((s, dir) =>
      runToMemorySink(slidingCounts(s, dir), "graft_q_stream_sliding_", "complete")
        .select(col("win_start").cast("timestamp_ntz").as("win_start"),
          col("event_type"), col("n"))),

    // Custom state through the REAL engine: file source ->
    // flatMapGroupsWithState (the foldSessions state machine, NoTimeout)
    // -> memory sink. NoTimeout makes the output deterministic — a
    // session emits exactly when a later event closes it, open tails
    // never emit — so the run is fully DuckDB-oracle-able: the batch
    // sessionization minus each user's final (still-open) session. This
    // upgrades the custom-state operator from spec-pinned to a green
    // CORRECTNESS row. (Events arrive time-ordered here because the
    // bounded source delivers the fixture in one batch; a production
    // stream with cross-batch disorder uses the watermarked
    // session_window path instead — q_stream_sessionize's engine twin.)
    "q_stream_custom_state" -> ((s, dir) => {
      import s.implicits._
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      val ev = eventsStream(s2, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
        .as[Ev]
      runToMemorySink(sessionizeClosedOnly(ev), "graft_q_stream_cs_", "append")
        .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
    }),

    // Durable streaming through the real engine: watermarked tumbling agg
    // -> parquet file sink with a checkpoint, run to completion, then
    // RESTARTED on the same checkpoint (the restart must add nothing —
    // exactly-once across recovery, the reference's task re-issue
    // semantics made durable). Append mode writes only watermark-
    // finalized windows, so the oracle is the batch aggregation
    // restricted to windows whose end the final watermark (max ts - 2h)
    // passed — SQL-expressible, hence a full green CORRECTNESS row for
    // the durability path (StreamingSpec separately restarts MID-stream).
    "q_stream_durable" -> ((s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_durable").toString
      val out = s"$root/out"
      val ckpt = s"$root/ckpt"
      def run(): Unit = {
        val q = tumblingCounts(s, dir).writeStream
          .outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt).start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      run() // checkpoint resume with no new data: must emit zero rows
      s.read.parquet(out).select(
        col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
    }),

    // Stream-static join through the real engine: the streaming fact is
    // enriched against a broadcast static dim (no state, no watermark —
    // the dim is re-resolvable per micro-batch), then aggregated. The
    // 100-TB shape for "join the firehose against reference data":
    // the stream never shuffles for the join.
    "q_stream_static_join" -> ((s, dir) => {
      val cust = graft.Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      runToMemorySink(eventsStream(s, dir)
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")),
        "graft_q_stream_static_", "complete")
    }),

    // Stream-stream interval join through the real engine: signups joined
    // to purchases by the same user within the following hour. Both sides
    // carry a 2-hour watermark and the join condition bounds event time on
    // both, so per-key state is expired as the watermark advances —
    // bounded state at any scale (an unconstrained stream-stream join
    // would buffer forever). Times are second-truncated BEFORE the
    // watermark so both engines compare at the same resolution; inner
    // join in append mode emits exactly the matched pairs -> exact oracle.
    "q_stream_stream_join" -> ((s, dir) => {
      // stream-stream joins keep one state store per shuffle partition per
      // side: partition count should track join-key cardinality (150
      // users here), not the batch corpus default — forked session so the
      // setting doesn't leak
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      def side(tag: String, typ: String) = eventsStream(s2, dir)
        .filter(col("event_type") === typ)
        .select(col("user_id").as(s"${tag}_user"),
          col("event_id").as(s"${tag}_id"),
          date_trunc("second", col("ts")).as(s"${tag}_ts"))
        .withWatermark(s"${tag}_ts", "2 hours")
      runToMemorySink(side("s", "signup").join(side("p", "purchase"),
          col("s_user") === col("p_user") &&
            col("p_ts") >= col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("s_user").as("user_id"),
          col("s_id").as("signup_id"), col("p_id").as("purchase_id"),
          (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("delay_s")),
        "graft_q_stream_ssj_", "append")
    }),

    // Stream-stream LEFT OUTER interval join: matched pairs emit as they
    // arrive; an unmatched signup emits its NULL-padded row only when the
    // watermark proves no qualifying purchase can still come (its join
    // window has closed). Signups whose window is still open at end of
    // stream remain in state and emit NOTHING — the oracle encodes
    // exactly that: matched pairs plus unmatched signups with
    // s_ts + 1h < min(max ts per side) - 2h (the final watermark).
    // This is the semantics a 100-TB attribution pipeline needs: no
    // premature "no conversion" verdicts, bounded state.
    "q_stream_outer_join" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "8")
      def side(tag: String, typ: String) = eventsStream(s2, dir)
        .filter(col("event_type") === typ)
        .select(col("user_id").as(s"${tag}_user"),
          col("event_id").as(s"${tag}_id"),
          date_trunc("second", col("ts")).as(s"${tag}_ts"))
        .withWatermark(s"${tag}_ts", "2 hours")
      runToMemorySink(side("s", "signup").join(side("p", "purchase"),
          col("s_user") === col("p_user") &&
            col("p_ts") >= col("s_ts") &&
            col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .select(col("s_user").as("user_id"),
          col("s_id").as("signup_id"), col("p_id").as("purchase_id"),
          (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("delay_s")),
        "graft_q_stream_oj_", "append")
    }),

    // foreachBatch MERGE — the production pattern for "stream into a
    // keyed serving table": each micro-batch pre-aggregates per key, then
    // merges into a versioned parquet target (read current -> combine ->
    // write next version), exactly what MERGE INTO does on a lakehouse
    // table. The merge state is (count, latest-event struct): counts ADD
    // and latest takes the struct MAX on the unique (ts, event_id) order,
    // both associative+commutative, so the final table is independent of
    // how the source files split into micro-batches (forced to 4 via
    // maxFilesPerTrigger=1 over a 4-file copy of events). Restart-safe
    // BY KEYING ON batchId (not driver-local state): target_b<batchId>
    // is a pure function of the replayable batch content plus the
    // newest COMMITTED (_SUCCESS-marked) target with a smaller batchId,
    // and mode-overwrite makes a replayed batch rewrite its own version
    // identically — the idempotent-merge contract foreachBatch sinks
    // must implement themselves (a real deployment says MERGE INTO on a
    // transactional table; the version listing here is bounded driver
    // metadata, one entry per micro-batch).
    "q_stream_upsert" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_upsert").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "events").repartition(4)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      def committedVersions: Seq[Long] = Option(new java.io.File(root).listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(f => f.getName.startsWith("target_b")
          && new java.io.File(f, "_SUCCESS").exists())
        .map(_.getName.stripPrefix("target_b").toLong)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val bAgg = batch.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              max(struct(col("ts"), col("event_id"), col("event_type"),
                col("value"))).as("latest"))
          val merged = committedVersions.filter(_ < batchId).sorted.lastOption match {
            case None => bAgg
            case Some(prior) =>
              s.read.parquet(s"$root/target_b$prior")
                .unionByName(bAgg)
                .groupBy("user_id")
                .agg(sum(col("n_events")).as("n_events"),
                  max(col("latest")).as("latest"))
          }
          merged.write.mode("overwrite").parquet(s"$root/target_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$root/target_b${committedVersions.sorted.lastOption.getOrElse(
        sys.error(s"q_stream_upsert: no committed target version under $root"))}")
        .select(col("user_id"), col("n_events"),
          col("latest.ts").cast("timestamp_ntz").as("last_ts"),
          col("latest.event_type").as("last_type"),
          col("latest.value").as("last_value"))
    }),

    // Streaming trending top-k — the "what's hot right now" serving
    // table, maintained incrementally: each micro-batch pre-aggregates
    // (hour, event_type) counts map-side, then merges them into a
    // versioned count grid by SUM (associative + commutative, so the
    // grid is micro-batch-split-invariant), with the same
    // batchId-keyed idempotent-overwrite contract as q_stream_upsert
    // (state_b<id> is a pure function of replayable batch content plus
    // the newest committed smaller-id state; a replayed batch rewrites
    // its own version identically). The top-3-per-hour rank runs on the
    // MERGED GRID, never the event stream: per-batch cost is
    // O(batch + grid), and the grid is bounded by hours x event-types
    // regardless of event volume — at 100 TB/day the serving query cost
    // is fixed while ingestion scales with the firehose.
    "q_stream_topk" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_topk").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "events").repartition(4)
        .write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      def committedVersions: Seq[Long] = Option(new java.io.File(root).listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(f => f.getName.startsWith("state_b")
          && new java.io.File(f, "_SUCCESS").exists())
        .map(_.getName.stripPrefix("state_b").toLong)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val bAgg = batch
            .groupBy(date_trunc("hour", col("ts")).as("hour_ts"),
              col("event_type"))
            .agg(count(lit(1)).as("n"))
          val merged = committedVersions.filter(_ < batchId).sorted.lastOption match {
            case None => bAgg
            case Some(prior) =>
              s.read.parquet(s"$root/state_b$prior")
                .unionByName(bAgg)
                .groupBy("hour_ts", "event_type")
                .agg(sum(col("n")).as("n"))
          }
          merged.write.mode("overwrite").parquet(s"$root/state_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val grid = s.read.parquet(s"$root/state_b${committedVersions.sorted.lastOption
        .getOrElse(sys.error(s"q_stream_topk: no committed state under $root"))}")
      grid
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("hour_ts")
            .orderBy(col("n").desc, col("event_type")))
          .cast("int"))
        .filter(col("rn") <= 3)
        .select(col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
          col("event_type"), col("n"), col("rn"))
    }),

    // Exactly-once dedup through the real engine: every event arrives
    // twice (two independent readers of the source), and
    // dropDuplicatesWithinWatermark must restore exactly the original
    // event set — which the oracle knows, since event_ids are unique.
    // Genuinely UNBOUNDED ingest (the Kafka stand-in the file/memory
    // sources can't model): the rate source emits the exactly-once
    // sequence 0,1,2,... forever; the query runs until the first 1000
    // values have landed, stops, and aggregates ONLY value < 1000 — the
    // wall-clock timestamp column is never used, so the result is
    // deterministic and plain-SQL oracle-able despite the source having
    // no end. This is the production entry shape: an always-on source,
    // a bounded predicate defining the reporting universe, and a sink
    // you can stop and restart at any micro-batch boundary.
    "q_stream_rate" -> ((s, dir) => {
      val sink = "graft_q_stream_rate_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val n = 1000L
      val q = s.readStream.format("rate")
        .option("rowsPerSecond", "5000").option("numPartitions", "4")
        .load()
        .select(col("value"))
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .start()
      try {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (s.table(sink).filter(col("value") < n).count() < n) {
          require(System.nanoTime() < deadline,
            "rate source did not deliver 1000 values within 60s")
          Thread.sleep(50)
        }
      } finally q.stop()
      val out = s.table(sink).filter(col("value") < n)
        .groupBy((col("value") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_values"), sum(col("value")).as("sum_value"))
      s.catalog.dropTempView(sink)
      out
    }),

    // Streaming NEAR-dup ingest filter — the production shape of corpus
    // dedup: the base corpus exists only as its compact MinHash signature
    // store (Dedup.ensureBaseSignatureStore), the delta (odd doc_ids,
    // split into 4 files => 4 micro-batches) streams in, and each batch
    // is tokenized, banded against the base store, exact-verified on
    // gram Jaccard, and its dups dropped BEFORE landing. Per-batch work
    // is O(batch + collisions) regardless of base size, and the survivor
    // set is batch-split-invariant (each doc's verdict depends only on
    // itself vs the base — StreamingSpec pins 1-batch == 4-batch).
    // Exactly-once is the SINK's job under foreachBatch: each batch
    // overwrites its own batchId-keyed directory (a replayed batch
    // rewrites the identical files), so the landed set never
    // double-counts under crash/replay — a bare mode("append") here
    // would be at-least-once.
    // Sampling-at-ingest through the real engine: the corpus streams in
    // forced micro-batches and each row passes the SAME integer-exact
    // md5-bucket mixture rule as the batch q_mixture_sample — stateless,
    // so the kept set is batch-split-invariant BY CONSTRUCTION (no state,
    // no watermark, no ordering sensitivity) and the append-mode file
    // sink is exactly-once under the checkpoint. The data-recipe rates
    // apply as the data lands, not in a later compaction pass — at
    // 100 TB/day that's the difference between sampling a firehose and
    // re-reading it.
    "q_stream_sample" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_streamsample").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .select("doc_id", "source")
        .repartition(4).write.mode("overwrite").parquet(src)
      // rule SHARED with the batch q_mixture_sample (one definition, so
      // the exact-parity guarantee can't drift when rates are tuned)
      val q = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("bucket", graft.operators.Text.mixtureBucket)
        .withColumn("rate", graft.operators.Text.mixtureRate)
        .filter(col("bucket") < col("rate"))
        .select(col("doc_id"), col("source"), col("rate").cast("int").as("rate"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$root/kept")
        .option("checkpointLocation", s"$root/ckpt").start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$root/kept")
    }),

    "q_stream_neardup_filter" -> ((s, dir) => {
      // persisted across the 4 micro-batches: every batch band-joins and
      // gram-verifies against the SAME base store — without this each
      // foreachBatch invocation re-scans the store twice
      val base = graft.operators.Dedup.ensureBaseSignatureStore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val root = java.nio.file.Files
        .createTempDirectory("graft_neardup").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // loan pattern: drops only this batch's gram cache afterwards
          // (clearCache() here would nuke every live cache in the session)
          graft.operators.Dedup.withNearDupSurvivors(batch, base) {
            // batchId-keyed overwrite = idempotent under replay (see the
            // exactly-once note above)
            _.write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally { q.stop(); base.unpersist() }
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // The GROWING near-dup door (round-12 verdict task 2: store
    // maintenance) — q_stream_neardup_filter dedups every batch against
    // a FROZEN base, so two near-identical NEW documents arriving in
    // different micro-batches both pass; here each batch's survivors
    // APPEND their (doc_id, grams, sig) rows to the door's signature
    // store before the next batch runs, so batch N dedups against
    // base ∪ kept arrivals of batches 1..N-1. Exactly-once growth: the
    // appended rows land overwrite-keyed BY BATCH ID (a replayed batch
    // reads the same earlier-batch dirs — unchanged by its own replay —
    // and rewrites identical survivor rows), the foreachBatch MERGE
    // convention of q_stream_upsert. Batch membership must be
    // DETERMINISTIC for this to be oracle-able (verdicts now depend on
    // arrival order): the odd-id delta splits by doc_id % 8 into groups
    // 1,3,5,7 written as one file each with strictly increasing mtimes,
    // which FileStreamSource delivers oldest-first — so the DuckDB
    // oracle can replay the exact same 4-step sequential fold as
    // chained CTEs. NOT batch-split-invariant, by design — that is the
    // semantic difference growth buys (the fixtures carry odd-odd
    // near-dup pairs across groups: 3 extra drops at sf0.01, 51 at
    // sf0.1); StreamingSpec pins the intra-stream-dup-caught law, the
    // door == sequential-batch-fold law, and drained store == rebuilt.
    "q_stream_neardup_grow" -> ((s, dir) => {
      val base = graft.operators.Dedup.ensureBaseSignatureStore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val delta = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      val groups = Seq(1L, 3L, 5L, 7L)
        .map(k => delta.filter(col("doc_id") % 8 === k))
      try nearDupGrowDoor(s, groups, base)
      finally base.unpersist()
    }),

    // Ingest-time exact-substring dedup — the streaming twin of
    // q_span_dedup_cross (Lee et al. 2021 at the door instead of in the
    // nightly batch): delta documents arrive in 4 file micro-batches,
    // each batch span-hashes map-side and probes the SAME persisted base
    // span store, and the per-doc duplication profile lands
    // batchId-keyed (idempotent under replay). Per-batch cost is
    // O(batch spans + hits) — the base corpus is never re-read, so
    // ingest keeps up regardless of how much history the store
    // represents. Because every document sits wholly inside one batch,
    // the unioned output is row-identical to the batch twin —
    // the oracle is the SAME SQL.
    "q_stream_span_dedup" -> ((s, dir) => {
      // persisted across the 4 micro-batches: every batch probes the
      // same base span store without re-reading its parquet
      val base = graft.operators.Text.ensureSpanStore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val root = java.nio.file.Files
        .createTempDirectory("graft_spanstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Text.spanProfileAgainst(batch, base)
            .write.mode("overwrite").parquet(s"$root/out/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally { q.stop(); base.unpersist() }
      s.read.parquet(s"$root/out/batch_b*")
    }),

    // The growth pattern extended to the SPAN store (round-12 verdict
    // task 2's closing step, third instance): the profiling door's
    // store grows with EVERY batch's arrival spans, so batch N's
    // duplication counts include spans duplicated against arrivals of
    // batches 1..N-1 — cross-batch duplicated text the frozen
    // q_stream_span_dedup door cannot see. Deterministic doc_id % 8
    // groups; oracled as the 4-step chained-CTE fold at both SFs.
    "q_stream_span_grow" -> ((s, dir) => {
      val base = graft.operators.Text.ensureSpanStore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val delta = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
      val groups = Seq(1L, 3L, 5L, 7L)
        .map(k => delta.filter(col("doc_id") % 8 === k))
      try spanGrowDoor(s, groups, base)
      finally base.unpersist()
    }),

    // The growth pattern extended to the exact-FINGERPRINT store
    // (fourth instance): batch 0 is the pretrain door's synthesized
    // crawl (verbatim %13 re-submissions drop vs the base fp store,
    // battery-kept " graftdelta" %7 docs survive); batch 1 re-submits
    // those survivors VERBATIM under new ids — their fps are nowhere in
    // the base store, so only the grown store drops them — plus fresh
    // " graftfresh" %11 docs that must survive. Battery + fp definition
    // shared with the pretrain door (Text.batteryKeptDocs); oracled via
    // the shared battery CTEs chained into the two-step fold.
    "q_stream_exactdup_grow" -> ((s, dir) => {
      val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val baseFp = graft.operators.Text.ensurePretrainFpStore(s, dir)
        .persist(sl)
      val doc = graft.Tables(s, dir, "documents")
        .select("doc_id", "text", "source", "lang")
      val g0 = doc.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"),
          col("source"), col("lang"))
        .unionAll(doc.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"),
            concat(col("text"), lit(" graftdelta")).as("text"),
            col("source"), col("lang")))
      val g1 = doc.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(col("text"), lit(" graftdelta")).as("text"),
          col("source"), col("lang"))
        .unionAll(doc.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 8000000L).as("doc_id"),
            concat(col("text"), lit(" graftfresh")).as("text"),
            col("source"), col("lang")))
      try exactDupGrowDoor(s, Seq(g0, g1), baseFp)
      finally baseFp.unpersist()
    }),

    // The grow-store LIFECYCLE, end to end (round-14 verdict task 1):
    // the same two-batch fold as q_stream_exactdup_grow, but split
    // across TWO STREAMS with a PROMOTION between them — stream 1
    // ingests batch g0 against a copied base fp store, promoteGrowStore
    // folds its grow dirs INTO the store, and stream 2 (fresh root,
    // fresh checkpoint, empty grow) ingests g1 against the promoted
    // store alone. Output = kept(stream 1) ∪ kept(stream 2), which
    // equals the one-stream grow door row-for-row exactly when
    // promotion is lossless AND the promoted store fully replaces the
    // grow union — so the oracle is the SAME two-step fold SQL. This is
    // the production cadence (day N's stream → overnight promote → day
    // N+1 starts at the fresh-base probe floor) made oracle-visible.
    "q_stream_exactdup_promote" -> ((s, dir) => {
      val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val T = graft.operators.Text
      // promotion mutates its target, so work on a COPY of the fixture
      // store (the shared pretrain_fp_v1 must stay frozen for every
      // other consumer)
      T.ensurePretrainFpStore(s, dir) // ensure built (the store build is
                                      // synchronous inside ensureStore;
                                      // round-16 dropped the extra count job)
      val origPath = graft.operators.Sources.fixturePath(dir, "pretrain_fp_v1")
      val baseCopy = java.nio.file.Files
        .createTempDirectory("graft_fppromote_store").toString + "/store"
      s.read.parquet(origPath).write.parquet(baseCopy)
      val doc = graft.Tables(s, dir, "documents")
        .select("doc_id", "text", "source", "lang")
      val g0 = doc.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"),
          col("source"), col("lang"))
        .unionAll(doc.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"),
            concat(col("text"), lit(" graftdelta")).as("text"),
            col("source"), col("lang")))
      val g1 = doc.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(col("text"), lit(" graftdelta")).as("text"),
          col("source"), col("lang"))
        .unionAll(doc.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 8000000L).as("doc_id"),
            concat(col("text"), lit(" graftfresh")).as("text"),
            col("source"), col("lang")))
      val root1 = java.nio.file.Files
        .createTempDirectory("graft_fppromote_s1").toString
      val base1 = s.read.parquet(baseCopy).persist(sl)
      // the door computes during the stream; its return value is a lazy
      // read over the IMMUTABLE kept/batch_b* parquet, which promotion
      // never touches — so the frame stays valid across the store fold
      val kept1 =
        try exactDupGrowDoor(s, Seq(g0), base1, rootDir = root1)
        finally base1.unpersist()
      promoteGrowStore(s, root1, baseCopy)
      val root2 = java.nio.file.Files
        .createTempDirectory("graft_fppromote_s2").toString
      val base2 = s.read.parquet(baseCopy).persist(sl)
      val kept2 =
        try exactDupGrowDoor(s, Seq(g1), base2, rootDir = root2)
        finally base2.unpersist()
      kept1.unionByName(kept2)
    }),

    // Ingest-time benchmark decontamination — the streaming twin of
    // q_decontaminate (the eval-overlap n-gram rule applied at the door
    // instead of in a pre-training batch pass): the benchmark suite's
    // distinct gram set is the one-time bench_grams_v1 store (eval
    // suites are fixed and tiny — it broadcasts), the corpus streams in
    // 4 file micro-batches, each batch computes its gram profile
    // map-side via the SHARED Text.contaminationProfile, probes the
    // broadcast store, and only docs with ZERO benchmark overlap land,
    // batchId-keyed (idempotent under replay — the exactly-once
    // convention above). Per-batch cost is O(batch grams), independent
    // of corpus history; the benchmark enters only through the
    // fixed-size broadcast. Each doc's verdict depends only on itself
    // vs the store, so the kept set is batch-split-invariant
    // (StreamingSpec pins 1-batch == 4-batch). Docs under 4 tokens have
    // no grams, can't overlap a benchmark, and are not profiled — the
    // oracle's len(w) >= 4 guard (same contract as the near-dup door's
    // sub-3-token rule, except here the door REPORTS survivors with
    // their gram counts, so gram-less docs have no row to report).
    "q_stream_decontaminate" -> ((s, dir) => {
      // persisted across the 4 micro-batches: every batch broadcasts
      // the same benchmark gram set without re-reading its parquet
      val bench = graft.operators.Text.ensureBenchGramStore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val root = java.nio.file.Files
        .createTempDirectory("graft_decontamstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 53 =!= 0)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Text.contaminationProfile(
            spreadBatch(batch, doSpread),
            bench)
            .filter(!col("contaminated"))
            .select("doc_id", "n_grams")
            .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally { q.stop(); bench.unpersist() }
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // Ingest-time cross-modal (media) exact-dup filter — the streaming
    // twin of q_dedup_media, closing the door matrix's last gap (every
    // other dedup family already had an ingest twin): the base asset
    // catalog exists only as its compact decoded-signature store
    // (media_sig_v1 — decode-once-at-ingest; the petabyte of payloads is
    // never re-read), new assets arrive in 4 file micro-batches, and
    // each batch is DECODED (the per-batch MediaCodec pass — the only
    // decode anywhere at query time), hyperplane-coded, band-joined
    // against the base BLOCKED on (nbytes, width, height), verified on
    // full signature equality, and only genuinely-new assets land,
    // batchId-keyed (idempotent under replay). Per-batch cost is
    // O(batch decode + collisions), independent of catalog size. The
    // arrival fixture plants both verdicts: byte-identical copies of the
    // doc_id%10==0 assets (must be dropped — recovery structural:
    // identical payload => identical signature => collides on every
    // band) and %10==5 assets extended by one extra content block
    // (must survive). Each asset's verdict depends only on itself vs
    // the store, so the kept set is batch-split-invariant
    // (StreamingSpec pins streamed == one-shot).
    "q_stream_media_filter" -> ((s, dir) => {
      val M = graft.operators.Multimodal
      // the base index (block-keyed band explode + verify structs) is
      // built and persisted ONCE beside the store and reused by every
      // micro-batch (the IvfSeedIndex convention) — per-batch cost is
      // then genuinely O(batch decode + collisions), never a re-explode
      // of the whole catalog. Band width from the BASE count, once —
      // batch and base must band identically, and a per-batch width
      // would drift with batch size.
      val baseStore = M.ensureMediaSigStore(s, dir)
      // band width from the BASE count — read from the store's parquet
      // footers driver-side (round-16: the count() was a full job for
      // footer metadata; the value is bit-identical)
      val index = M.buildMediaIndex(baseStore,
        graft.operators.Lsh.bandBits(parquetFooterRows(s,
          Seq(graft.operators.Sources.fixturePath(dir, "media_sig_v1")))))
      val root = java.nio.file.Files
        .createTempDirectory("graft_mediastream").toString
      val src = s"$root/src"
      M.mediaArrivals(s, dir)
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // loan pattern: the batch decode cache is released per batch
          M.withMediaSurvivors(batch, index) {
            _.select("doc_id", "nbytes")
              .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally { q.stop(); index.unpersist() }
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // The growth pattern EXTENDED to the media store (round-12 verdict
    // task 2's closing step): batch 0 is the standard arrival fixture
    // (+1e9 ids: byte-identical %10==0 copies drop vs base, extended
    // %10==5 assets survive); batch 1 re-submits batch 0's SURVIVOR
    // payloads byte-identically under +2e9 ids — the frozen door would
    // land them again (they match nothing in the base catalog); the
    // growing door drops them because the survivors' decoded signatures
    // joined the store between the batches — plus fresh "y"-extended
    // %10==7 assets that must still survive (growth never over-drops).
    // The miss is ORACLE-VISIBLE as extra rows: the DuckDB fold keeps
    // exactly batch-0 survivors ∪ batch-1 fresh, so a door that stopped
    // growing would fail on row count, not just content.
    "q_stream_media_grow" -> ((s, dir) => {
      val M = graft.operators.Multimodal
      val m = M.ensureMediaStore(s, dir)
      val docs = graft.Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val g0 = M.mediaArrivals(s, dir)
      val resub = m.join(docs, "doc_id").filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + lit(2000000000L)).as("doc_id"),
          concat(col("payload"),
            unhex(md5(concat(col("text"), lit("x"))))).as("payload"))
      val fresh = m.join(docs, "doc_id").filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + lit(2000000000L)).as("doc_id"),
          concat(col("payload"),
            unhex(md5(concat(col("text"), lit("y"))))).as("payload"))
      mediaGrowDoor(s, Seq(g0, resub.unionAll(fresh)),
        M.ensureMediaSigStore(s, dir))
    }),

    // Ingest-time Gopher quality gating — the streaming twin of
    // q_gopher_rules, completing the curation-at-the-door set (quality,
    // near-dup, substring, semantic, DSIR, sampling): each micro-batch
    // runs the identical rule battery (shared Text.gopherProfile) and
    // only 'kept' docs land, batchId-keyed. The battery is a stateless
    // scan-rate map, so per-batch cost rides batch tokens and the kept
    // set is trivially batch-split-invariant (StreamingSpec pins
    // 1-batch == 4-batch).
    "q_stream_quality" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_qualstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Text.gopherProfile(
            spreadBatch(batch, doSpread))
            .filter(col("verdict") === "kept")
            .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // Ingest-time repetition quarantine — the streaming twin of
    // q_repetition_rules: each micro-batch runs the identical 13-signal
    // battery (shared Text.repetitionRules — the zero-shuffle RLE fold)
    // and lands only the FLAGGED docs with their first-failing verdict,
    // batchId-keyed. Stateless scan-rate map ⇒ per-batch cost rides
    // batch bytes and the flagged set is batch-split-invariant; the
    // oracle is the batch form restricted to the delta half.
    "q_stream_repetition" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_repstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Text.repetitionRules(
            spreadBatch(batch, doSpread))
            .filter(col("verdict") =!= "kept")
            .select("doc_id", "verdict")
            .write.mode("overwrite").parquet(s"$root/flagged/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      // a repetition-free batch commits an empty dir (every row filtered
      // before the write) — same schema-inference guard as the PII door
      val outs = nonEmptyBatchDirs(s"$root/flagged", requireSuccess = false)
      if (outs.isEmpty)
        graft.Tables(s, dir, "documents").limit(0)
          .select(col("doc_id"), lit("").as("verdict")).filter(lit(false))
      else s.read.parquet(outs: _*)
    }),

    // Ingest-time DSIR quality gating — the streaming twin of q_dsir:
    // the importance models are fit ONCE on the base half and persisted
    // as the 1024-row model store; the delta corpus streams in 4
    // micro-batches and each batch is scored map-side against the
    // broadcast models, keeping docs with positive log importance
    // weight (importance weight > 1 — the published keep rule). Per-batch
    // cost is O(batch bigrams) — independent of base size, which enters
    // only through the fixed-width store. Each doc's verdict depends only
    // on itself vs the store, so the kept set is batch-split-invariant
    // (StreamingSpec pins 1-batch == 4-batch). NOTE the synthetic
    // fixture's per-doc vocabularies are largely disjoint, so base-half
    // models see delta docs as near-noise and the positive set is small
    // and lang-mixed here — the full-pool q_dsir law (AnalyticsSpec) is
    // where the en-skew is demonstrated; this query's subject is the
    // ingest mechanics + store shape.
    "q_stream_dsir" -> ((s, dir) => {
      val models = graft.operators.Text.dsirModelsOf(
        s.read.parquet(graft.operators.Text.ensureDsirModelStore(s, dir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val root = java.nio.file.Files
        .createTempDirectory("graft_dsirstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // a one-file micro-batch arrives as a single partition, which
          // would serialize the CPU-bound scoring fold onto one core —
          // spread it (the verdict is per-doc, so this is result-neutral)
          graft.operators.Text.dsirProfileAgainst(
            spreadBatch(batch, doSpread),
            models)
            .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally { q.stop(); models.unpersist() }
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // Ingest-time CCNet perplexity gate — the streaming deployment of
    // the Wenzek et al. 2020 filter and the round-9 composition piece:
    // the bigram LM is FIT ONCE on the base half (persisted store,
    // Text.ensureBaseBigramLmStore) and its head+middle/tail cutpoint
    // is PERSISTED ALONGSIDE IT (Text.ensurePplCutpointStore — both
    // ingest-time artifacts, like CCNet's Wikipedia-trained KenLM +
    // fixed buckets; round 10 moved the cutpoint from a per-run base
    // rescore into the one-time store). Each delta micro-batch scores
    // map-side-tokenize + store-probe joins and keeps docs at ppl <=
    // the stored cutpoint. Add-one smoothing gives unseen delta
    // bigrams/words real probability mass (cb=0/cu=0 left joins), so
    // genuinely-new text scores rather than crashing — the semantics a
    // door filter needs. Per-batch cost rides batch tokens +
    // vocabulary-bounded probe joins; the base corpus is never re-read
    // (or re-scored) at ingest. Per-doc verdict =>
    // batch-split-invariant (StreamingSpec law).
    "q_stream_ppl_filter" -> ((s, dir) => {
      val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val (uni, bi) = graft.operators.Text.baseBigramLm(s, dir)
      uni.persist(sl); bi.persist(sl)
      val (vSize, c2) = graft.operators.Text.basePplCutpoint(s, dir)
      val root = java.nio.file.Files
        .createTempDirectory("graft_pplstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Text.perplexityAgainst(
            spreadBatch(batch, doSpread),
            uni, bi, vSize)
            .filter(col("ppl") <= lit(c2))
            .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally {
        q.stop(); uni.unpersist(); bi.unpersist()
      }
      s.read.parquet(s"$root/kept/batch_b*")
    }),

    // Ingest-time SEMANTIC dedup — the streaming twin of q_dedup_semantic
    // (SemDeDup at the door): the base corpus exists as its seed table +
    // cluster-assigned member store (at scale both persisted, rebuilt
    // only on re-index), the delta vectors stream in 4 micro-batches,
    // and each batch is (a) assigned its nearest AND runner-up seed in
    // two broadcast map passes (the round-9 delta-side MULTI-PROBE —
    // boundary-straddling dups whose base twin sits just across the
    // assignment boundary are caught by the second probe; the base
    // store stays single-assigned, so the ×2 cost lands on the small
    // delta only, and the recall gain is measured in
    // q_dedup_semantic_recall's recall_mp2 vs recall), (b) anti-joined
    // against base members of EITHER probed cluster at cosine >= tau.
    // Survivors land batchId-keyed (idempotent under replay). Per-batch
    // cost is O(batch * k + 2 * batch * cluster_width) — the base is
    // touched only through the cluster-keyed join, never rescanned
    // whole. Each vector's verdict depends only on itself vs the base,
    // so the survivor set is batch-split-invariant (StreamingSpec pins
    // 1-batch == 4-batch).
    "q_stream_semantic_filter" -> ((s, dir) =>
      semanticDoorSurvivors(s, dir)),

    // The door's ×3 probe-ladder rung, selectable (round-11 verdict task
    // 3): identical pipeline with the delta side probing its 3rd-nearest
    // cluster too — the measured recall step 0.457 → 0.621 at sf0.1
    // (SCALE.md probe-cost ladder) bought at one more broadcast map pass
    // over the DELTA batch only. Fully oracled (assignment and keep rule
    // stay deterministic SQL; the oracle is the 2-probe door's with
    // rn <= 3); beyond k = ExactAssignMaxSeeds the rung flips to the
    // sub-quadratic IvfTop3 (all-cells-probed == exact law in DedupSpec).
    "q_stream_semantic_filter_p3" -> ((s, dir) =>
      semanticDoorSurvivors(s, dir, probes = 3)),

    // The door's band-UNION mode, selectable (round-11 verdict task 3):
    // cluster-probe candidates OR-ed with hyperplane-band collisions
    // against a base band store built once beside the cluster store —
    // the measured +0.095 recall lever (SemKScale, SCALE.md round-11;
    // the two candidate families overlap only ~0.09). Band collisions
    // are HASH-specific, so this mode is rows-only by contract (the
    // oracled 2-probe row above stays the default); its laws: survivor
    // ⊆ the 2-probe door's survivors (the union can only drop MORE),
    // batch-split invariance, and the recall twin
    // q_dedup_semantic_recall_union (StreamingSpec / Dedup).
    "q_stream_semantic_union" -> ((s, dir) =>
      semanticDoorSurvivors(s, dir, bandUnion = true)),

    // THE PRETRAINING INGEST DOOR — the streaming twin of
    // q_pipeline_pretrain (round-11 verdict task 4): a synthesized delta
    // crawl (verbatim re-submissions + suffixed new docs —
    // Text.pretrainDeltaDocs, the q_dedup_bloom convention) streams in 4
    // micro-batches; each batch runs the Gopher battery, exact-dedups
    // against the persisted BASE fingerprint store (content already in
    // the base artifact never re-packs), encodes survivors with the
    // PERSISTED cleaned tokenizer + the BASE symbol-id table (unseen
    // symbols take UNK id 0), and packs its deterministic ingest group
    // (doc_id % 4) into that group's own shard-id range
    // (shard = group·1e6 + local — exactly-once on replay: segments land
    // overwrite-keyed BY GROUP, and the group is derived from the DATA,
    // so replays and file-merges rewrite identical rows). Per-batch cost
    // rides batch tokens + the vocabulary-bounded encode joins; the base
    // enters only through the compact fingerprint store and the
    // once-built symtab — never re-read (the 16× row pins this).
    // FULLY ORACLED: every stage is deterministic SQL (battery, fp
    // anti-join, tokenizer-store encode, UNK coalesce, per-group banded
    // pack), so DuckDB rebuilds the exact segment table; StreamingSpec
    // additionally pins batch-split invariance and the no-token-lost /
    // shard-tiling laws per group.
    "q_stream_pretrain" -> ((s, dir) => streamPretrainSegments(s, dir)),

    // Ingest-time CONTAINMENT against the deduped corpus — "is this
    // batch quoted anywhere": the index enters ONLY through the
    // persisted rarity-order stores (contain_cnt_v1 + contain_index_v1,
    // built once beside the canonical store) pinned in memory across
    // micro-batches; the probe docs (the q_containment doc_id%3 batch
    // shape) stream in 4 micro-batches, each grammed with THE single
    // gram definition (Dedup.batchGrams), ranked against the STORED
    // counts (unseen grams rarest — candidates complete under any
    // consistent shared rarity order, so per-batch pruning differences
    // never change output), and PPJoined against the stored postings
    // (Dedup.containmentProbeStoredOrder, broadcastProbe = true). This
    // retires the round-12 weak: the recount form paid O(index grams)
    // in shuffles + sorts EVERY batch — the only door whose per-batch
    // cost grew with base size; now the index side is scanned map-side
    // only, so per-batch cost rides the batch (SCALE.md round-13 door
    // row). Each probe's verdict depends only on itself vs the index,
    // so the streamed union EQUALS q_containment_canonical's batch
    // output row-for-row — which is the oracle (same SQL), and
    // StreamingSpec pins the equality as the split-invariance law.
    "q_stream_containment" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val D = graft.operators.Dedup
      // persisted across micro-batches; the caches fill lazily inside
      // batch 0's first job (round-16: the two eager count() jobs bought
      // nothing — every store is consumed by the same per-batch plan)
      val sets = D.ensureContainIndexStore(s, dir).persist(sl)
      val postings = D.containIndexPostings(sets).persist(sl)
      val cnt = D.ensureContainCountStore(s, dir).persist(sl)
      val root = java.nio.file.Files
        .createTempDirectory("graft_containstream").toString
      val src = s"$root/src"
      graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select("doc_id", "text")
        .repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          releasingBatchCaches(s) {
            // adaptive spread before the CPU-bound gram pass (the
            // LangDoorScale finding, size-gated — see spreadBatch)
            D.containmentProbeStoredOrder(D.batchGrams(spreadBatch(batch, doSpread)),
                sets, postings, cnt, broadcastProbe = true)
              .write.mode("overwrite").parquet(s"$root/found/batch_b$batchId")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally {
        q.stop(); sets.unpersist(); postings.unpersist(); cnt.unpersist()
      }
      s.read.parquet(s"$root/found/batch_b*")
    }),

    // Ingest-time structured-PII redaction — the door twin of
    // q_pii_scrub (round-13 verdict task 2): arrivals stream in 4 file
    // micro-batches and each batch runs the SAME map-only pattern
    // battery (Text.piiScrubProfile — counts, sequential redaction,
    // residual re-count), landing its flagged rows batchId-keyed
    // (idempotent under replay). Zero cross-batch state and zero base
    // artifact: the verdict is a pure per-row function, so the door is
    // batch-split-invariant and the unioned output is row-identical to
    // the batch twin — the oracle is the SAME SQL. Per-batch cost is
    // batch-sized codegen regex work; nothing grows with history.
    "q_stream_pii_redact" -> ((s, dir) => {
      val T = graft.operators.Text
      val root = java.nio.file.Files
        .createTempDirectory("graft_piistream").toString
      val src = s"$root/src"
      val aug = T.piiAugmentedDocs(graft.Tables(s, dir, "documents"))
      aug.repartition(doorSplit).write.mode("overwrite").parquet(src)
      val doSpread = spreadArrivals(s, src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // single-file batch → spread before the CPU-bound regex
          // battery (the LangDoorScale finding)
          T.piiScrubProfile(spreadBatch(batch, doSpread))
            .filter(T.piiFlagged) // generated from PiiPatterns — class
                                  // additions reach the door untouched
            .write.mode("overwrite").parquet(s"$root/out/batch_b$batchId")
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      // a PII-free corpus commits only empty batch dirs (every row is
      // filtered before the write), and a bare glob read over them dies
      // with "Unable to infer schema" — return a schema-correct empty
      // frame instead (round-14 review; same guard committedGrowDirs
      // applies to grow stores)
      val outs = nonEmptyBatchDirs(s"$root/out", requireSuccess = false)
      if (outs.isEmpty)
        T.piiScrubProfile(aug.limit(0)).filter(T.piiFlagged)
      else s.read.parquet(outs: _*)
    }),

    // Ingest-time language routing — the door twin of the TrigramLangId
    // batch classifier (SURVEY §7.9 candidate, landed round 14): every
    // published curation pipeline routes by language at ingest (C4 and
    // FineWeb keep English; multilingual corpora fan out per-lang), and
    // the trigram classifier probes a one-time frozen store — exactly
    // the frozen-base door shape. Arrivals stream in `doorSplit` file
    // micro-batches; each batch classifies against the broadcast
    // langprof_v1 store (≤ langs × K rows — trained ONCE, never re-read
    // per batch thanks to the persist) and only docs whose predicted
    // language is in the accept set land, batchId-keyed with their
    // prediction (idempotent under replay). Per-batch cost is O(batch
    // trigrams), independent of corpus history; the training corpus
    // enters only through the fixed-size broadcast. Each doc's verdict
    // depends only on itself vs the store, so the kept set is
    // batch-split-invariant (StreamingSpec pins streamed == one-shot on
    // a planted corpus) and the unioned output equals the batch
    // classifier filtered to the accept set — the oracle is LangId's
    // own trigram CTE chain with that filter.
    "q_stream_lang_filter" -> ((s, dir) =>
      langFilterDoor(s, graft.Tables(s, dir, "documents"),
        graft.operators.LangId.ensureProfileStore(s, dir),
        Seq("en", "fr"))),

    // Ingest-time language FAN-OUT (round-14 verdict task 4): the
    // filter door keeps one accept set; this door routes EVERY language
    // to its own partition sink (batch_b*/predicted=<lang>/) — the
    // multilingual-pipeline shape where each language's downstream
    // pipeline reads only its own directories. Same frozen broadcast
    // store, same per-batch classify; the output frame re-reads each
    // language from the partition PATHS the router chose, so the oracle
    // (the full trigram CTE prediction table, unfiltered — classify is
    // total, every doc routes somewhere) checks the physical routing,
    // not just the predicted column.
    "q_stream_lang_route" -> ((s, dir) =>
      langRouteDoor(s, graft.Tables(s, dir, "documents"),
        graft.operators.LangId.ensureProfileStore(s, dir))),

    "q_stream_dedup" -> ((s, dir) =>
      runToMemorySink(dedupedStream(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec")),
        "graft_q_stream_dedup_", "append"))
  )

  /** The growing near-dup door's engine run (see the
    * q_stream_neardup_grow query comment): `groups` arrive as one file
    * micro-batch each, in sequence order (strictly increasing mtimes —
    * FileStreamSource delivers oldest-first under maxFilesPerTrigger=1);
    * each batch dedups against `base` ∪ the survivor signatures of all
    * EARLIER batches, lands its kept ids batchId-keyed, and appends its
    * survivors' (doc_id, grams, sig) rows to the door's grow store
    * (batchId-keyed overwrite = idempotent under replay: a replayed
    * batch's verdict inputs — base + earlier-batch dirs — are untouched
    * by its own replay, so it rewrites identical rows). Per-batch cost
    * rides the batch + the compact signature frames; the base corpus
    * text is never read. One honest cost axis the door family's
    * base-size contract does not cover: each batch OPENS all earlier
    * grow dirs, so file-listing work grows with STREAM AGE (harmless at
    * 4 batches; a long-lived production stream runs the standard
    * maintenance job instead — periodically compact the grow dirs into
    * the base store and truncate them, which is exactly the one-time
    * store build these doors already amortize against). Factored from
    * the query so StreamingSpec can drive planted corpora and inspect
    * the grow store via `root`.
    */
  /** Writes `groups` as ONE parquet file each with strictly increasing
    * mtimes (60 s apart — well past FS timestamp granularity) under
    * `root/src` and returns the file stream reading them back
    * oldest-first, one per micro-batch — the deterministic-arrival-order
    * setup every GROWING door shares (batch membership must be a
    * function of the data for the sequential fold to be oracle-able).
    */
  private def orderedGroupStream(s: SparkSession, groups: Seq[DataFrame],
      root: String): DataFrame = {
    val t0 = System.currentTimeMillis() - 3600L * 1000
    // ONE single-task job stages every group (round-16: the per-group
    // loop paid one scan+write job per group for the same bytes — ~4
    // jobs of fixed scheduler/commit latency per grow door): tag each
    // group with its index, write partitionBy the tag (stripped from
    // the file contents, so the moved files carry the original group
    // schema byte-for-byte), then order the mtimes exactly as before.
    // A group with NO rows writes no partition dir — it falls back to
    // the old per-group empty write, so batch count and arrival order
    // are EXACTLY as before (the grow folds depend on both).
    val stage = s"$root/stage"
    groups.zipWithIndex.map { case (g, k) => g.withColumn("__g", lit(k)) }
      .reduce(_ unionByName _)
      .coalesce(1).write.partitionBy("__g").mode("overwrite").parquet(stage)
    groups.zipWithIndex.foreach { case (g, k) =>
      val gdir = new java.io.File(s"$stage/__g=$k")
      val staged =
        if (gdir.isDirectory)
          gdir.listFiles().filter(_.getName.endsWith(".parquet")).headOption
        else None
      val part = staged.getOrElse {
        val st2 = s"$root/stage_empty/g$k"
        g.coalesce(1).write.mode("overwrite").parquet(st2)
        new java.io.File(st2).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
      }
      val dst = new java.io.File(s"$root/src/g$k.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(t0 + k * 60000L),
        s"could not order source file mtimes at $dst")
    }
    s.readStream
      .schema(s.read.parquet(s"$root/src").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
  }

  /** The language-routing door's engine run (see the
    * q_stream_lang_filter query comment): arrivals in `docs` stream in
    * `doorSplit` file micro-batches, each batch classifies against the
    * frozen `profiles` (persisted once here, broadcast inside
    * `LangId.classify` at ≤ langs × K rows) and only docs whose
    * predicted language is in `accept` land, batchId-keyed. Public and
    * frame-parameterized so StreamingSpec drives it with a PLANTED
    * labeled corpus (where the prediction semantics are checkable),
    * while the fixture query passes the langprof_v1 store.
    */
  def langFilterDoor(s: SparkSession, docs: DataFrame,
      profiles: DataFrame, accept: Seq[String]): DataFrame = {
    val L = graft.operators.LangId
    val prof = profiles
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prof.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_langstream").toString
    val src = s"$root/src"
    docs.select("doc_id", "text")
      .repartition(doorSplit).write.mode("overwrite").parquet(src)
    val doSpread = spreadArrivals(s, src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one micro-batch = one arrival file = 1-2 scan tasks; the
        // native profile is CPU-bound O(bytes) per row, so without the
        // spread the whole box idles behind one core (LangDoorScale:
        // the profile stage alone ran 4.5× its static cost — THE lang
        // door premium; same fix as the repetition door)
        L.predictionsOf(L.classify(spreadBatch(batch, doSpread), prof))
          .filter(col("predicted").isin(accept: _*))
          .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally { q.stop(); prof.unpersist() }
    // a batch keeping zero docs commits a dir with no parquet part
    // files; a bare glob read over only such dirs dies with "Unable to
    // infer schema" — same guard as the PII door / committedGrowDirs
    val outs = nonEmptyBatchDirs(s"$root/kept", requireSuccess = false)
    if (outs.isEmpty) L.predictionsOf(L.classify(docs.limit(0), prof))
    else s.read.parquet(outs: _*)
  }

  /** The language door FAN-OUT (round-14 verdict task 4): real
    * multilingual pipelines route each language to its OWN sink rather
    * than keeping one accept set (C4/FineWeb keep English; mC4/OSCAR
    * fan out per language). Same frozen-store classify as
    * [[langFilterDoor]]; each batch's predictions land
    * `partitionBy(predicted)` under the batchId-keyed dir, so every
    * language owns `batch_b<k>/predicted=<lang>` — a per-lang sink a
    * downstream per-language pipeline reads without touching any other
    * language's bytes (partition pruning at the DIRECTORY grain; at
    * 100 TB the router is what makes "train the French model" a
    * French-sized read). The routed label set is the store's own label
    * domain (≤ langs rows, the one bounded collect).
    *
    * The return frame re-reads each language FROM ITS PARTITION
    * DIRECTORIES, tagging rows with the lang parsed from the path the
    * router chose — so a misrouted file diverges from the oracle even
    * though the files themselves no longer carry the predicted column
    * (partitionBy moves it into the path). Empty-partition guard: a
    * language that never wins writes no dirs and contributes a
    * schema-correct empty slice (the routing fixture's spec law); a
    * fully empty arrival set returns the schema-correct empty frame.
    */
  def langRouteDoor(s: SparkSession, docs: DataFrame,
      profiles: DataFrame): DataFrame = {
    val L = graft.operators.LangId
    val prof = profiles
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prof.count()
    val langs = prof.select("lang").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val root = java.nio.file.Files
      .createTempDirectory("graft_langroute").toString
    val src = s"$root/src"
    val arrivals = docs.select("doc_id", "text")
    arrivals.repartition(doorSplit).write.mode("overwrite").parquet(src)
    // schema from the frame, not the written dir: an EMPTY arrival set
    // writes no part files, and read.parquet on a part-less dir dies
    // with "Unable to infer schema" (the empty-partition guard law)
    val doSpread = spreadArrivals(s, src)
    val stream = s.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same single-file-batch parallelism spread as langFilterDoor
        L.predictionsOf(L.classify(spreadBatch(batch, doSpread), prof))
          .write.mode("overwrite").partitionBy("predicted")
          .parquet(s"$root/routed/batch_b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally { q.stop(); prof.unpersist() }
    // committed batch dirs (partitionBy nests the data files, so the
    // flat-parquet guard of nonEmptyBatchDirs does not apply — _SUCCESS
    // is still written at the batch dir's top level)
    val batchDirs = Option(new java.io.File(s"$root/routed").listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        new java.io.File(d, "_SUCCESS").exists())
    val empty = docs.select(col("doc_id")).limit(0)
      .withColumn("predicted", lit(""))
    if (langs.isEmpty) return empty
    langs.map { lang =>
      // the exact dir-name escaping partitionBy itself applies, so any
      // label value round-trips (the non-identifier-label lesson from
      // the classify wide-pivot review)
      val part = "predicted=" + org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(lang)
      val dirs = batchDirs.map(d => new java.io.File(d, part))
        .filter { d =>
          val fs = d.listFiles()
          d.isDirectory && fs != null &&
            fs.exists(f => f.getName.endsWith(".parquet") && f.length() > 0)
        }
        .map(_.toString).toSeq
      if (dirs.isEmpty) empty.filter(lit(false))
      else s.read.parquet(dirs: _*)
        .select(col("doc_id"), lit(lang).as("predicted"))
    }.reduce(_ unionByName _)
  }

  /** The earlier-batch grow dirs a growing door may union in: committed
    * (`_SUCCESS`) AND holding at least one non-empty parquet data file.
    * A micro-batch with zero survivors can commit a dir that has
    * `_SUCCESS` but no part files (Spark writes no file for empty
    * non-collapsed partitions); `read.parquet` over only such dirs dies
    * with "Unable to infer schema", killing the stream — an edge the
    * committed fixtures never hit but the public door functions must
    * survive (round-13 ADVICE).
    */
  private[graft] def committedGrowDirs(root: String, batchId: Long): Seq[String] = {
    // an unfinished compaction/promotion (crash between its two phases)
    // must fail LOUD here, not surface as silently-wrong profiles over a
    // half-swapped layout — re-running compactGrowStore /
    // promoteGrowStore completes it
    require(!new java.io.File(s"$root/grow/_compact_pending").exists(),
      s"$root/grow has an unfinished compaction — re-run compactGrowStore")
    require(!new java.io.File(s"$root/grow/_promote_pending").exists(),
      s"$root/grow has an unfinished promotion — re-run promoteGrowStore")
    nonEmptyBatchDirs(s"$root/grow", requireSuccess = true,
      maxBatchExclusive = batchId)
  }

  /** Grow-store COMPACTION (round-13 verdict task 3): rewrites all
    * committed batchId-keyed grow dirs into ONE dir (batch_b0),
    * content-identical, and removes the rest — the maintenance job the
    * door scaladocs have always pointed at ("periodically compact the
    * grow dirs"), now a rule instead of a comment. At real ingest
    * cadence the append-one-dir-per-micro-batch layout is the batch
    * small-files problem (one more dir to open per batch, forever);
    * after compaction `committedGrowDirs` sees exactly one dir and the
    * union is unchanged by construction: the dirs are PAIRWISE DISJOINT
    * (every door appends batch-unique doc ids or anti-joined-fresh
    * fps/spans), so a plain union rewrite preserves both the set AND
    * multiset content — the span door's count semantics survive.
    * Run it between streams (the production maintenance window): a
    * replayed micro-batch K would rewrite batch_bK whose rows are
    * already folded into batch_b0, which is harmless for the
    * membership-semantics doors but would double the span door's counts
    * — same discipline as any checkpoint-coupled store rewrite.
    * Returns the number of dirs folded.
    */
  /** The batch index of a `batch_b<i>` dir name, None for anything
    * else (markers, tmp dirs, foreign files). */
  private def batchIndexOf(name: String): Option[Long] = {
    val suffix = name.stripPrefix("batch_b")
    if (name.startsWith("batch_b") && suffix.nonEmpty &&
        suffix.forall(_.isDigit)) Some(suffix.toLong) else None
  }

  /** Sorted (by batch index) `batch_b*` dirs under `parent` holding at
    * least one non-empty parquet data file — and `_SUCCESS` when
    * `requireSuccess` — with index < `maxBatchExclusive`. The ONE
    * definition of "committed, readable batch dir" shared by the
    * doors' output reads, [[committedGrowDirs]], and
    * [[compactGrowStore]] (round-14 review: four verbatim copies of
    * this guard had grown; a future edit to any one of them would
    * silently desynchronize which dirs the doors consider committed).
    */
  private[graft] def nonEmptyBatchDirs(parent: String,
      requireSuccess: Boolean = true,
      maxBatchExclusive: Long = Long.MaxValue): Seq[String] =
    Option(new java.io.File(parent).listFiles()).getOrElse(Array.empty)
      .flatMap(f => batchIndexOf(f.getName).map(i => (i, f)))
      .filter { case (i, f) =>
        f.isDirectory && i < maxBatchExclusive &&
          (!requireSuccess || new java.io.File(f, "_SUCCESS").exists()) && {
            val fs = f.listFiles()
            fs != null &&
              fs.exists(g => g.getName.endsWith(".parquet") && g.length() > 0)
          }
      }
      .sortBy(_._1).map(_._2.toString).toSeq

  def compactGrowStore(s: SparkSession, root: String,
      maxBatchExclusive: Long = Long.MaxValue): Int = {
    val growRoot = new java.io.File(s"$root/grow")
    val pending = new java.io.File(growRoot, "_compact_pending")
    val tmp = new java.io.File(growRoot, ".compact_tmp")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    // every dir this compaction may fold OR delete respects the bound:
    // a mid-stream caller passes its batchId, so the current batch's
    // own (not-yet-checkpointed) dir is never touched — the replay-
    // safety contract maybeCompactGrow documents (round-14 review: the
    // unbounded form folded a replayed batch's own pre-crash dir into
    // batch_b0, so the replay computed against a store already holding
    // its own contribution — wrong span counts, membership doors
    // dropping every arrival)
    def batchDirs(): Array[java.io.File] =
      Option(growRoot.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          batchIndexOf(f.getName).exists(_ < maxBatchExclusive))
    // two-phase commit against the crash window (round-14 review: the
    // first cut deleted every dir BEFORE renaming the compacted tmp, so
    // a crash in between silently lost the whole store): the union is
    // written to tmp, THEN the pending marker commits intent, THEN the
    // originals drop and tmp renames to batch_b0, THEN the marker
    // clears. A crash before the marker leaves the store untouched
    // (orphan tmp overwritten next run); after the marker, re-running
    // compactGrowStore completes the fold from tmp — and
    // committedGrowDirs refuses to read a store with a pending marker,
    // so no door can compute on the half-swapped layout.
    //
    // The marker RECORDS the folded dir names (round-14 ADVICE, hardened):
    // a resume must delete exactly the dirs the tmp absorbed — no more,
    // no fewer — and the CALLER's bound cannot reconstruct that set. A
    // fresh stream restarting at batch 0 on a crashed root resumes with
    // maxBatchExclusive == 0, under which batchDirs() excludes everything:
    // the stale batch_b0 would fail the rename require loudly with no
    // self-healing path, and deleting only the target would leave
    // b1..bK-1 alive beside the renamed union that already contains them
    // — a silent double-count. Replaying the recorded manifest is exact
    // in both directions: every folded dir drops, and any dir written
    // AFTER the marker (a replayed batch's own pre-crash output) is
    // untouched.
    def finish(foldedNames: Seq[String]): Unit = {
      foldedNames.foreach { n =>
        val d = new java.io.File(growRoot, n)
        if (d.exists()) deleteRec(d)
      }
      require(tmp.renameTo(new java.io.File(growRoot, "batch_b0")),
        s"compactGrowStore: rename $tmp failed")
      pending.delete(); ()
    }
    def readMarkerManifest(): Seq[String] = {
      val lines = new String(java.nio.file.Files.readAllBytes(pending.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").map(_.trim)
      val names = lines.filter(_.nonEmpty).toSeq
      if (names.nonEmpty) names
      else {
        // legacy EMPTY marker (pre-manifest protocol): the fold set can
        // only be reconstructed when the resuming caller's bound still
        // covers every committed dir (same-checkpoint resume). If the
        // bound excludes some (a fresh stream restarting at batch 0),
        // completing with a partial delete set would leave folded rows
        // alive beside the renamed union — a silent double-count — so
        // fail LOUD instead (round-15 review), exactly as the
        // pre-manifest code did at this point.
        val inBound = batchDirs().map(_.getName).toSeq
        val all = Option(growRoot.listFiles()).getOrElse(Array.empty)
          .count(f => f.isDirectory && batchIndexOf(f.getName).isDefined)
        require(inBound.size == all,
          s"compactGrowStore: legacy pending marker at $pending but the " +
            s"resume bound ($maxBatchExclusive) excludes committed dirs " +
            s"($inBound of $all visible) — resume from the original " +
            "stream's checkpoint, or clear the root manually")
        (inBound :+ "batch_b0").distinct
      }
    }
    if (pending.exists()) {
      if (new java.io.File(tmp, "_SUCCESS").exists())
        finish(readMarkerManifest())
      else {
        // crashed between the rename and the marker delete: the fold is
        // complete and finish() deletes folded dirs BEFORE the rename,
        // so they are already gone — only the marker remains. The
        // manifest re-drop below is purely defensive (exists() guarded,
        // a no-op on the normal path); batch_b0 holds every folded
        // dir's content by the rename's precondition.
        require(new java.io.File(growRoot, "batch_b0/_SUCCESS").exists(),
          s"compactGrowStore: pending marker at $pending with neither a " +
            "complete tmp nor a compacted batch_b0 — store corrupt")
        readMarkerManifest().filterNot(_ == "batch_b0").foreach { n =>
          val d = new java.io.File(growRoot, n)
          if (d.exists()) deleteRec(d)
        }
        pending.delete()
      }
      return 1 // resumed an interrupted compaction
    }
    val live = nonEmptyBatchDirs(growRoot.toString,
      requireSuccess = true, maxBatchExclusive)
    if (live.length <= 1) return 0
    s.read.parquet(live: _*).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val foldedNames = live.map(new java.io.File(_).getName)
    // marker committed ATOMICALLY (sibling write + rename, the
    // promoteGrowStore protocol): a crash mid-write of the final path
    // would leave a torn-but-nonempty manifest the resume path would
    // replay as complete, deleting only part of the fold set beside
    // the full union — the same silent double-count the manifest
    // exists to prevent (round-15 review)
    val markerTmp = new java.io.File(growRoot, "._compact_pending.write")
    java.nio.file.Files.write(markerTmp.toPath,
      (foldedNames.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    require(markerTmp.renameTo(pending),
      s"compactGrowStore: could not commit marker $pending")
    finish(foldedNames)
    live.length
  }

  /** Grow-store PROMOTION into the base-store artifact (round-14
    * verdict task 1 — the lifecycle step compaction alone cannot
    * provide): compaction bounds the grow LAYOUT at ≤ compactEvery+1
    * dirs, but the compacted batch_b0 itself grows forever beside the
    * frozen base — every probe unions an ever-larger second store, and
    * the base artifacts (signature/fp/span/media-sig stores) never
    * absorb what the doors learned. This rule folds all committed grow
    * dirs INTO the base store between streams, leaving the grow dir
    * empty, so the next stream starts at the fresh-base probe floor.
    *
    * O(grow), never O(base): the grow union is rewritten once
    * (compaction-sized work) and enters the base store by per-file
    * RENAME — the base's existing files are never read, rewritten, or
    * even listed, which is what makes the rule affordable when the
    * base is 100 TB and the grow is a day's survivors. (Renames must
    * stay on one filesystem — the stores' ensureStore contract already
    * requires that; an object-store deployment would swap the rename
    * for its committer, same as ensureStore itself.)
    *
    * Two-phase crash-safe, the [[compactGrowStore]] discipline:
    * phase 1 writes the grow union to .promote_tmp, then commits the
    * _promote_pending marker ATOMICALLY (written to a sibling and
    * renamed in, so a reader never sees a partial manifest) recording
    * the exact file moves and folded dir names; phase 2 executes the
    * moves (each file rename atomic), drops the folded grow dirs,
    * removes the tmp, and clears the marker. Crash BEFORE the marker:
    * base and grow untouched (the orphan tmp is overwritten by the
    * next run). Crash AFTER the marker — at any point: re-running
    * promoteGrowStore replays the manifest idempotently (moves whose
    * destination exists are skipped; dir drops are exists()-guarded),
    * and [[committedGrowDirs]] fails every door LOUD while the marker
    * stands, so nothing computes over the half-promoted state.
    *
    * Content contract: promoted base == old base ∪ grow as a MULTISET.
    * The grow dirs are pairwise disjoint from base and from each other
    * by the doors' anti-join appends, so set semantics — including the
    * span door's match COUNTS — are preserved exactly (the
    * StreamingSpec bit-identity + probe-equivalence laws). Schema
    * contract: all four grow doors append rows in their base store's
    * schema by construction; checked loudly here. Returns the number
    * of grow dirs folded (0 = nothing to promote).
    */
  def promoteGrowStore(s: SparkSession, root: String,
      baseStorePath: String): Int = {
    val growRoot = new java.io.File(s"$root/grow")
    val pending = new java.io.File(growRoot, "_promote_pending")
    val tmp = new java.io.File(growRoot, ".promote_tmp")
    val baseDir = new java.io.File(baseStorePath)
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    def finish(moves: Seq[(String, String)], dirNames: Seq[String]): Unit = {
      moves.foreach { case (src, dest) =>
        val d = new java.io.File(baseDir, dest)
        if (!d.exists()) {
          val sf = new java.io.File(tmp, src)
          require(sf.isFile && sf.renameTo(d),
            s"promoteGrowStore: move $sf -> $d failed")
        }
      }
      dirNames.foreach { n =>
        val d = new java.io.File(growRoot, n)
        if (d.exists()) deleteRec(d)
      }
      if (tmp.exists()) deleteRec(tmp)
      pending.delete(); ()
    }
    if (pending.exists()) {
      // resume: the marker is atomic (rename-committed), so its manifest
      // is always complete — replay it
      val lines = new String(
        java.nio.file.Files.readAllBytes(pending.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val moves = lines.filter(_.startsWith("file\t"))
        .map { l => val p = l.split("\t"); (p(1), p(2)) }
      val dirNames = lines.filter(_.startsWith("dir\t")).map(_.split("\t")(1))
      finish(moves, dirNames)
      return 1 // resumed an interrupted promotion
    }
    require(!new java.io.File(growRoot, "_compact_pending").exists(),
      s"$root/grow has an unfinished compaction — run compactGrowStore first")
    val live = nonEmptyBatchDirs(growRoot.toString, requireSuccess = true)
    if (live.isEmpty) return 0
    require(new java.io.File(baseDir, "_SUCCESS").exists(),
      s"promoteGrowStore: $baseStorePath is not a committed store")
    val baseCols = s.read.parquet(baseStorePath).columns
    val grow = s.read.parquet(live: _*)
    require(grow.columns.sorted.sameElements(baseCols.sorted),
      s"promoteGrowStore: grow schema (${grow.columns.mkString(",")}) does " +
        s"not match base store schema (${baseCols.mkString(",")})")
    if (tmp.exists()) deleteRec(tmp) // orphan of a pre-marker crash
    grow.select(baseCols.toIndexedSeq.map(col): _*).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val moves = tmp.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet") && f.length() > 0)
      .map(f => (f.getName, s"promoted_${uid}_${f.getName}")).toSeq
    require(moves.nonEmpty, s"promoteGrowStore: empty union write at $tmp")
    val dirNames = live.map(new java.io.File(_).getName)
    val manifest = (moves.map { case (a, b) => s"file\t$a\t$b" } ++
      dirNames.map(n => s"dir\t$n")).mkString("\n") + "\n"
    val markerTmp = new java.io.File(growRoot, "._promote_pending.write")
    java.nio.file.Files.write(markerTmp.toPath,
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    require(markerTmp.renameTo(pending),
      s"promoteGrowStore: could not commit marker $pending")
    finish(moves, dirNames)
    live.length
  }

  /** AUTO-compaction cadence for the grow doors (SURVEY §7.9 candidate,
    * landed round 14): fires [[compactGrowStore]] at the START of every
    * `compactEvery`-th micro-batch — before the batch reads the store
    * and before it writes its own grow dir, i.e. exactly the
    * no-reader-is-live window the manual maintenance job uses. Running
    * at batch START with `batchId` passed as the fold bound is what
    * makes the cadence REPLAY-SAFE where a batch-end compaction would
    * not be: only dirs of batches strictly before the current one can
    * fold or drop (compactGrowStore's maxBatchExclusive — the bound is
    * load-bearing, not just the firing point: batch K's own grow dir
    * can already EXIST here, written pre-crash by an uncommitted run
    * of K, and an unbounded fold would absorb it into batch_b0 so the
    * replay computes against a store holding its own contribution —
    * round-14 review), so a replayed batch K finds the same store
    * CONTENT (union preserved by the compaction law) and overwrites
    * grow/batch_bK with identical rows — the batchId-keyed idempotence
    * argument unchanged; a batch-END compaction could fold batch_bK
    * itself before K commits, and the replay would then re-append rows
    * already inside batch_b0, double-counting every later span match.
    * `compactEvery` = 0 (the
    * default everywhere) disables the cadence; correctness fixtures
    * keep the 4-dir layout. A crash-interrupted compaction resumes here
    * on the next firing (compactGrowStore's two-phase contract), and
    * committedGrowDirs fails loud in between.
    */
  private def maybeCompactGrow(s: SparkSession, root: String,
      batchId: Long, compactEvery: Int): Unit =
    if (compactEvery > 0 &&
        (batchId > 0 && batchId % compactEvery == 0 ||
          new java.io.File(s"$root/grow/_compact_pending").exists())) {
      compactGrowStore(s, root, maxBatchExclusive = batchId); ()
    }

  def nearDupGrowDoor(s: SparkSession, groups: Seq[DataFrame],
      base: DataFrame, threshold: Double = 0.7,
      rootDir: String = "", compactEvery: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val D = graft.operators.Dedup
    val root = if (rootDir.nonEmpty) rootDir
      else java.nio.file.Files.createTempDirectory("graft_neardupgrow").toString
    val stream = orderedGroupStream(s, groups, root)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maybeCompactGrow(s, root, batchId, compactEvery)
        releasingBatchCaches(s) {
          val earlier = committedGrowDirs(root, batchId)
          val grow = if (earlier.isEmpty) base
            else base.unionByName(s.read.parquet(earlier: _*))
          val withG = D.batchGrams(batch)
            .withColumn("sig", call_function("minhash64", col("grams")))
            .persist()
          val kept = D.survivorsFromGrams(batch.select("doc_id"), withG,
              grow, threshold)
            .persist()
          kept.write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          // the MERGE: survivors' signatures join the store before the
          // next batch's verdicts are computed
          withG.join(kept, Seq("doc_id"))
            .select("doc_id", "grams", "sig")
            .write.mode("overwrite").parquet(s"$root/grow/batch_b$batchId")
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$root/kept/batch_b*")
      .select(col("doc_id"), (col("doc_id") % 8).as("grp"))
  }

  /** The growth pattern extended to the MEDIA store (the round-12
    * verdict's "state the pattern once and extend" step): identical
    * shape to [[nearDupGrowDoor]] — ordered group files, per-batch
    * survivors landed batchId-keyed, survivors' decoded signature rows
    * appended batchId-keyed before the next batch — with the media
    * door's dup rule (full decoded-signature equality) in place of
    * banded Jaccard. Per batch: the banded BASE index probe is the
    * frozen door's path unchanged; the GROWN side is an arrival-sized
    * signature-equality anti-join (broadcast — earlier survivors are a
    * sliver of the catalog). Exactly-once growth by the same
    * batchId-keyed-overwrite argument; same stream-age caveat and
    * compaction mitigation as [[nearDupGrowDoor]].
    */
  def mediaGrowDoor(s: SparkSession, groups: Seq[DataFrame],
      baseStore: DataFrame, rootDir: String = "",
      compactEvery: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val M = graft.operators.Multimodal
    // baseStore is an arbitrary caller frame here (specs pass planted
    // stores), so the count stays a Spark count — only the fixture
    // query's filter door (above) reads footers
    val index = M.buildMediaIndex(baseStore,
      graft.operators.Lsh.bandBits(baseStore.count()))
    val root = if (rootDir.nonEmpty) rootDir
      else java.nio.file.Files.createTempDirectory("graft_mediagrow").toString
    val stream = orderedGroupStream(s, groups, root)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maybeCompactGrow(s, root, batchId, compactEvery)
        releasingBatchCaches(s) {
          val earlier = committedGrowDirs(root, batchId)
          M.withMediaSurvivors(batch, index) { survBase =>
            val kept = (if (earlier.isEmpty) survBase
              else {
                val grownSigs = s.read.parquet(earlier: _*)
                  .withColumn("sigv", M.mediaSigStruct)
                  .select("sigv").distinct()
                survBase.withColumn("sigv", M.mediaSigStruct)
                  .join(broadcast(grownSigs), Seq("sigv"), "left_anti")
                  .drop("sigv")
              }).persist()
            kept.select("doc_id", "nbytes")
              .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
            // the MERGE: survivors' decoded signatures join the store
            // before the next batch's verdicts are computed
            kept.write.mode("overwrite").parquet(s"$root/grow/batch_b$batchId")
          }
          ()
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally { q.stop(); index.unpersist() }
    s.read.parquet(s"$root/kept/batch_b*")
  }

  /** The growth pattern extended to the exact-FINGERPRINT store: each
    * batch battery-gates its arrivals (the pretrain door's shared
    * Text.batteryKeptDocs — one fp definition end-to-end), anti-joins
    * their normalized-text fingerprints against base ∪ earlier-kept
    * fps, lands survivors, and appends their distinct fps batchId-keyed
    * before the next batch — so a verbatim re-submission of an earlier
    * KEPT arrival is dropped even though its fp never entered the base
    * store. Same exactly-once and stream-age notes as
    * [[nearDupGrowDoor]].
    */
  def exactDupGrowDoor(s: SparkSession, groups: Seq[DataFrame],
      baseFp: DataFrame, rootDir: String = "",
      compactEvery: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val T = graft.operators.Text
    val root = if (rootDir.nonEmpty) rootDir
      else java.nio.file.Files.createTempDirectory("graft_fpgrow").toString
    val stream = orderedGroupStream(s, groups, root)
    val doSpread = spreadArrivals(s, s"$root/src")
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maybeCompactGrow(s, root, batchId, compactEvery)
        releasingBatchCaches(s) {
          val earlier = committedGrowDirs(root, batchId)
          val grow = if (earlier.isEmpty) baseFp.select("fp")
            else baseFp.select("fp")
              .unionByName(s.read.parquet(earlier: _*))
          // single-file batch → spread before the CPU-bound battery
          // (the LangDoorScale finding)
          val kept = T.batteryKeptDocs(spreadBatch(batch, doSpread))
            .select("doc_id", "fp")
            .join(grow, Seq("fp"), "left_anti")
            .persist()
          kept.select("doc_id", "fp")
            .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
          kept.select("fp").distinct()
            .write.mode("overwrite").parquet(s"$root/grow/batch_b$batchId")
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$root/kept/batch_b*")
  }

  /** The growth pattern extended to the SPAN store (Lee et al. 2021
    * across the stream, not just vs the frozen base): this door
    * PROFILES rather than filters, so growth means every batch's
    * arrival spans — not a survivor subset, deduped against what the
    * store already holds so the union stays a SET — append
    * batchId-keyed, and
    * batch N's duplication profile counts spans already seen in base ∪
    * arrivals of batches 1..N-1 (the frozen q_stream_span_dedup door
    * counts base hits only, so cross-batch duplicated text is invisible
    * to it). Same exactly-once and stream-age notes as
    * [[nearDupGrowDoor]].
    */
  def spanGrowDoor(s: SparkSession, groups: Seq[DataFrame],
      base: DataFrame, rootDir: String = "",
      compactEvery: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val T = graft.operators.Text
    val root = if (rootDir.nonEmpty) rootDir
      else java.nio.file.Files.createTempDirectory("graft_spangrow").toString
    // one count at door setup (the store is the caller-persisted compact
    // frame): the per-batch prune decision compares it to the batch
    val baseN = base.count()
    val stream = orderedGroupStream(s, groups, root)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maybeCompactGrow(s, root, batchId, compactEvery)
        releasingBatchCaches(s) {
          val earlier = committedGrowDirs(root, batchId)
          val grow = if (earlier.isEmpty) base
            else base.unionByName(s.read.parquet(earlier: _*))
          // span-hash the batch ONCE; both the profile join and the
          // store append read the cached frame (released by
          // releasingBatchCaches)
          val arrival = T.spanHashes(batch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val arrivalN = arrival.count()
          // the store the profile actually joins = base ∪ grow dirs, so
          // the prune decision must count BOTH (gating on baseN alone
          // never engages for a door started on a small/empty base even
          // after the grow dirs dwarf every batch — round-14 review).
          // Footer counts are read DRIVER-SIDE (round-16): the count is
          // parquet footer metadata, and the old `read.parquet.count()`
          // paid a full Spark job round per micro-batch for it.
          val storeN = baseN +
            (if (earlier.isEmpty) 0L else parquetFooterRows(s, earlier))
          // bloom-prune the store side by the batch's span set BEFORE
          // the joins (round-13 verdict task 4) — ADAPTIVELY: the prune
          // pays one extra batch pass (the bloom fold) to cut the
          // store-side shuffle to might-match rows, so it is engaged
          // only in the STORE-DOMINANT regime (store > 4× batch spans —
          // the 100 TB ingest shape, where the persisted base dwarfs a
          // day's crawl; measured warm 1.84 → 0.65 s on a 17.6M-span
          // content-disjoint store vs a 28k-span batch, SCALE.md
          // round-14). The dup-heavy smoke corpora invert the ratio
          // (replica collapse keeps the DISTINCT store tiny while raw
          // batch spans scale with the corpus), and there the bloom is
          // pure overhead — measured +28% on the 64× door — so the
          // batch-dominant path keeps the plain join. Both paths are
          // result-identical (no false negatives; the transparency law).
          val storeDominant = storeN > 4L * arrivalN
          val pruned = (if (storeDominant)
              T.bloomPruneSpans(arrival, grow, knownDeltaRows = arrivalN)
            else grow)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // size the join side by a BOUND instead of an exact count
          // (round-16: the count was one more full job per micro-batch;
          // the persist now fills lazily inside the profile write job).
          // Store-dominant: the bloom keeps true matches (≤ the batch's
          // span rows) + false positives (≤ storeN × ~0.05% at 16
          // bits/item — padded to storeN/500 here); batch-dominant: the
          // un-pruned store is exactly storeN rows, known driver-side.
          // The bound only picks broadcast-vs-shuffle — either plan is
          // result-identical — and stays under the same 1M-row ceiling
          // (~70 MB hashed relation) as the round-14 form.
          val prunedEst =
            if (storeDominant) arrivalN + storeN / 500L + 1L else storeN
          val storeSide = if (prunedEst <= 1000000L) broadcast(pruned)
            else pruned
          T.spanProfileOfSpans(arrival, storeSide)
            .select(col("doc_id"), col("n_spans"),
              col("n_base_dup_spans").as("n_dup_spans"),
              col("base_dup_ratio").as("dup_ratio"))
            .write.mode("overwrite").parquet(s"$root/out/batch_b$batchId")
          // append only the NOT-YET-SEEN spans: the profile is a COUNT
          // of matches, so the grow union must stay a SET — a span in
          // both base and an earlier dir would double every later match
          // (caught by the sf0.1 oracle: one doc read 116 vs the true
          // 58). In the store-dominant regime the anti-join is
          // batch-sized on BOTH sides (store side bloom-pruned); base
          // and the dirs stay pairwise disjoint by construction, so no
          // per-batch distinct over the whole store is ever needed.
          arrival.select("gh").distinct()
            .join(storeSide, Seq("gh"), "left_anti")
            .write.mode("overwrite").parquet(s"$root/grow/batch_b$batchId")
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$root/out/batch_b*")
  }

  /** Per-micro-batch cache hygiene for doors whose batch work persists
    * frames it cannot reach (the IVF assigners' `assigned`, the
    * containment PPJoin's toks/sets — each documented for the harness's
    * per-query clearCache, which a LONG-LIVED stream never runs): runs
    * `body`, then releases every cache created inside it — the
    * withNearDupSurvivors loan generalized from one frame to a cache
    * snapshot diff. Long-lived stores built BEFORE the stream (seeds,
    * base members, IVF index, band/gram stores) predate the snapshot
    * and survive. Releases the RDD blocks directly (the storage the
    * leak is made of); the CacheManager's plan-level entries linger as
    * metadata until the harness clearCache, which is the acceptable
    * residue.
    */
  private def releasingBatchCaches[T](s: SparkSession)(body: => T): T = {
    val before = s.sparkContext.getPersistentRDDs.keySet
    try body finally {
      val after = s.sparkContext.getPersistentRDDs
      (after.keySet -- before).foreach(id =>
        after.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  /** The pretraining ingest door's pipeline (see the q_stream_pretrain
    * query comment): battery → base-fingerprint exact-dedup → stored-
    * tokenizer encode with the BASE symtab → per-ingest-group banded
    * pack with group-owned shard-id ranges. The fingerprint store and
    * the symtab are ingest-time artifacts built/read ONCE before the
    * stream starts; each micro-batch touches only its own rows plus
    * those two compact tables. Group g owns shard range [g·1e6,
    * (g+1)·1e6) — disjoint while a group stays under 1e6 × 2048 ≈ 2G
    * tokens per ingest group (document the resize at production scale).
    */
  def streamPretrainSegments(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val T = graft.operators.Text
    // ALL three ingest-time artifacts are read once and cached for the
    // stream's lifetime (round-16: the fp store and the tokenizer vocab
    // view were re-read from parquet by EVERY micro-batch — only the
    // symtab was persisted). The caches fill lazily inside batch 0's
    // first job; no eager count jobs at setup.
    val baseFp = T.ensurePretrainFpStore(s, dir).persist(sl)
    val symtab = T.ensurePretrainSymtabStore(s, dir).persist(sl)
    val vocab = T.cleanTokenizerVocab(s, dir).persist(sl)
    val root = java.nio.file.Files
      .createTempDirectory("graft_pretrainstream").toString
    val src = s"$root/src"
    // 4 deterministic ingest groups (doc_id % 4), one file each: with
    // maxFilesPerTrigger=1 each micro-batch carries one group — and
    // because packing keys on the DATA-derived group, a replay or a
    // file-merged batch still rewrites the identical per-group segments.
    // Written as ONE single-task partitionBy job (round-16: the per-group
    // loop paid 4 scan+write jobs for the same bytes), then each group's
    // file moves under src/ with ascending mtimes — the
    // orderedGroupStream convention; membership is identical because the
    // partition column IS the data-derived group id (stripped from the
    // file contents by partitionBy, exactly like the old per-group
    // writes). An empty group writes no file and so no micro-batch —
    // same output either way (an empty batch packs nothing).
    val delta = T.pretrainDeltaDocs(s, dir)
    val stage = s"$root/stage"
    delta.withColumn("gid", pmod(col("doc_id"), lit(4L)))
      .coalesce(1)
      .write.partitionBy("gid").mode("overwrite").parquet(stage)
    val t0 = System.currentTimeMillis() - 3600L * 1000
    (0 until 4).foreach { g =>
      val gdir = new java.io.File(s"$stage/gid=$g")
      if (gdir.isDirectory) {
        val part = gdir.listFiles()
          .filter(_.getName.endsWith(".parquet")).headOption
        part.foreach { f =>
          val dst = new java.io.File(s"$src/g$g.parquet")
          dst.getParentFile.mkdirs()
          java.nio.file.Files.move(f.toPath, dst.toPath)
          require(dst.setLastModified(t0 + g * 60000L),
            s"could not order source file mtimes at $dst")
        }
      }
    }
    // an ENTIRELY empty delta writes no partition dirs at all — keep the
    // old per-group writer's "empty src file" shape so the stream setup
    // below still resolves (the final seg/group_g* read is empty-glob
    // either way)
    if (!new java.io.File(src).exists())
      delta.limit(0).coalesce(1).write.mode("overwrite").parquet(src)
    val doSpread = spreadArrivals(s, src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        releasingBatchCaches(s) {
        // one micro-batch = one coalesced group file = one scan task;
        // the battery + encode are CPU-bound per-row work, so spread
        // the batch across the box first (the lang-door LangDoorScale
        // finding; same fix as the repetition/quality doors)
        val kept = T.batteryKeptDocs(spreadBatch(batch, doSpread))
          .join(baseFp, Seq("fp"), "left_anti") // exact-dedup vs the base
          .select("doc_id", "w")
        val encoded = T.encodeWithVocab(kept, vocab, symtab)
          .withColumn("gid", pmod(col("doc_id"), lit(4L)))
          .persist(sl)
        // present groups: <= 4 rows, driver-bounded metadata (one group
        // per batch in normal operation; several only on a merged replay)
        val gids = encoded.select("gid").distinct()
          .collect().map(_.getLong(0)).sorted
        gids.foreach { g =>
          // persistInput = false: `encoded` above is the cache (released
          // right below) — packedSegmentsOf's internal persist would be
          // unreachable and leak one cached frame per (batch, group)
          T.packedSegmentsOf(
              encoded.filter(col("gid") === g)
                .select("doc_id", "ids", "n_tokens"),
              shardBase = g * 1000000L, persistInput = false)
            .withColumn("ingest_group", lit(g))
            .write.mode("overwrite").parquet(s"$root/seg/group_g$g")
        }
        encoded.unpersist()
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop(); symtab.unpersist(); baseFp.unpersist(); vocab.unpersist()
    }
    s.read.parquet(s"$root/seg/group_g*")
  }

  /** The semantic ingest door (SemDeDup at the door), parameterized by
    * its two measured recall levers (round-11 verdict task 3): the base
    * corpus exists as its seed table + cluster-assigned member store
    * (at scale both persisted, rebuilt only on re-index), the delta
    * vectors stream in 4 micro-batches, and each batch is (a) assigned
    * its nearest + runner-up (+ 3rd at `probes` = 3) seed in broadcast
    * map passes over the DELTA only, (b) anti-joined against base
    * members of ANY probed cluster at cosine >= tau (equi join on the
    * exploded cluster key — an OR-ed predicate would nested-loop the
    * base store), and (c) when `bandUnion` is set, ALSO anti-joined
    * against hyperplane-band collisions verified at the same tau — the
    * band store is built ONCE beside the cluster store, and per-batch
    * band work rides the batch (code + band explode) plus collision
    * volume. Survivors land batchId-keyed (idempotent under replay).
    * Per-batch cost is O(batch × k + probes × batch × cluster_width
    * [+ batch × band collisions]) — the base is touched only through
    * the cluster- (and band-) keyed joins, never rescanned whole. Each
    * vector's verdict depends only on itself vs the base, so the
    * survivor set is batch-split-invariant at every (probes, bandUnion)
    * setting (StreamingSpec pins 1-batch == 4-batch).
    *
    * Assignment is ADAPTIVE at every probe depth (exact — bit-identical
    * to the oracle — while k <= ExactAssignMaxSeeds, true at every
    * fixture SF; the measured IVF path beyond, its coarse index built
    * once beside the seed table; the ×3 rung flips to IvfTop3).
    */
  def semanticDoorSurvivors(s: SparkSession, dir: String,
      probes: Int = 2, bandUnion: Boolean = false): DataFrame = {
    require(probes == 2 || probes == 3,
      s"probes $probes: the door's measured ladder is x2 (default) / x3")
    graft.functions.GraftFunctions.register(s)
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = graft.Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val baseEmb = e.filter(col("vec_id") % 2 === 0)
    // persisted across the 4 micro-batches: every batch re-uses the
    // same seed broadcast and cluster-assigned base member store
    val nBase = baseEmb.count()
    val k = graft.operators.Dedup.semanticK(nBase)
    val seeds = graft.operators.Dedup.semanticSeedsK(baseEmb, k).persist(sl)
    // beyond the exact-path threshold, the IVF coarse index is built
    // ONCE beside the persisted seed table and shared by the base
    // assignment and every micro-batch (round-11 ADVICE: without this
    // the k × √k index build re-ran per batch)
    val ivfIdx =
      if (k > graft.operators.Dedup.ExactAssignMaxSeeds)
        Some(graft.operators.Dedup.buildIvfSeedIndex(seeds, k))
      else None
    val base = graft.operators.Dedup
      .assignToSeedsAdaptive(baseEmb, seeds, k, ivfIdx)
      .select(col("cluster_id").as("b_cluster"),
        col("embedding").as("b_emb"))
      .persist(sl)
    // band-union mode: the base band store, built once (hyperplane code
    // + adaptive-width band explode — the q_dedup_embedding machinery),
    // plus a base-embedding lookup for the exact cosine verify
    val bits = graft.operators.Lsh.bandBits(nBase)
    val baseBands = if (!bandUnion) None else Some(
      graft.operators.Lsh.explodeBands(
        baseEmb.withColumn("code",
          call_function("hyperplane_bits", col("embedding")))
          .select(col("vec_id"), col("code")), "code", bits)
        .select(col("vec_id").as("b_vid"), col("band"), col("bv"))
        .join(baseEmb.select(col("vec_id").as("b_vid"),
          col("embedding").as("b_emb")), Seq("b_vid"))
        .persist(sl))
    val root = java.nio.file.Files
      .createTempDirectory("graft_semstream").toString
    val src = s"$root/src"
    e.filter(col("vec_id") % 2 === 1)
      .repartition(doorSplit).write.mode("overwrite").parquet(src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        releasingBatchCaches(s) {
        val asg =
          if (probes == 2) graft.operators.Dedup
            .assignToSeedsTop2Adaptive(batch, seeds, k, ivfIdx)
          else graft.operators.Dedup
            .assignToSeedsTop3Adaptive(batch, seeds, k, ivfIdx)
        val probeCols =
          if (probes == 2) array(col("cluster_id"), col("cluster2_id"))
          else array(col("cluster_id"), col("cluster2_id"),
            col("cluster3_id"))
        // explode the probes so the base join stays an EQUI join on the
        // cluster key
        val dupCluster = asg.select(col("vec_id"), col("embedding"),
            explode(probeCols).as("pc"))
          .join(base,
            col("pc") === col("b_cluster") &&
              call_function("cosine_sim",
                col("embedding"), col("b_emb")) >= 0.4,
            "left_semi")
          .select("vec_id").distinct()
        val dup = baseBands match {
          case None => dupCluster
          case Some(bb) =>
            // batch-side code + bands, equi-joined on (band, bv) against
            // the base band store, exact-verified at the same tau
            val dupBand = graft.operators.Lsh.explodeBands(
              batch.withColumn("code",
                call_function("hyperplane_bits", col("embedding")))
                .select(col("vec_id"), col("code")), "code", bits)
              .select(col("vec_id"), col("band"), col("bv"))
              .join(batch.select(col("vec_id"), col("embedding")),
                Seq("vec_id"))
              .join(bb,
                Seq("band", "bv"))
              .filter(call_function("cosine_sim",
                col("embedding"), col("b_emb")) >= 0.4)
              .select("vec_id").distinct()
            dupCluster.unionByName(dupBand).distinct()
        }
        asg.join(dup, Seq("vec_id"), "left_anti")
          .select("vec_id")
          .write.mode("overwrite").parquet(s"$root/kept/batch_b$batchId")
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop(); seeds.unpersist(); base.unpersist()
      ivfIdx.foreach(_.unpersist()); baseBands.foreach(_.unpersist())
    }
    s.read.parquet(s"$root/kept/batch_b*")
  }

  /** Same SQL as the batch twins' oracles (q_sessionize / q_time_bucket). */
  private val oraclesBase: Map[String, String] = Map(
    // the rate source's exactly-once 0..N-1 sequence is fully determined,
    // so the gated aggregate equals plain SQL over range(N)
    "q_stream_rate" ->
      """SELECT value % 10 AS bucket, count(*) AS n_values,
           CAST(sum(value) AS BIGINT) AS sum_value
         FROM range(0, 1000) t(value) GROUP BY 1""",

    // the merged serving table must equal the batch "latest row + count
    // per key" over the whole stream, whatever the micro-batch split
    "q_stream_upsert" ->
      """WITH c AS (
           SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
         l AS (
           SELECT user_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT c.user_id, c.n_events, l.ts AS last_ts,
           l.event_type AS last_type, l.value AS last_value
         FROM c JOIN l ON c.user_id = l.user_id
         WHERE l.rn = 1""",

    // the merged count grid must equal the batch per-hour counts
    // whatever the micro-batch split; top-3 tie-broken by event_type
    "q_stream_topk" ->
      """WITH c AS (
           SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT hour_ts, event_type, n, rn FROM (
           SELECT hour_ts, event_type, n,
             CAST(row_number() OVER (PARTITION BY hour_ts
               ORDER BY n DESC, event_type) AS INTEGER) AS rn
           FROM c)
         WHERE rn <= 3""",

    "q_stream_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id, event_id, sec,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         sess AS (
           SELECT user_id, sec,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
           min(sec) AS sess_start, max(sec) AS sess_end
         FROM sess GROUP BY user_id, session_id""",

    // the batch sessionization minus each user's final session (the one
    // the NoTimeout state machine correctly leaves open)
    "q_stream_custom_state" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id, event_id, sec,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         sess AS (
           SELECT user_id, sec,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM g),
         agg AS (
           SELECT user_id, session_id, count(*) AS n_events,
             min(sec) AS sess_start, max(sec) AS sess_end
           FROM sess GROUP BY user_id, session_id)
         SELECT user_id, session_id, n_events, sess_start, sess_end FROM (
           SELECT *, max(session_id) OVER (PARTITION BY user_id) AS last_sid
           FROM agg)
         WHERE session_id < last_sid""",

    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_stream_sliding" ->
      """WITH x AS (
           SELECT event_type,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS win_start
           FROM events)
         SELECT win_start, event_type, count(*) AS n
         FROM x GROUP BY win_start, event_type""",

    // batch aggregation restricted to watermark-finalized windows:
    // window end <= max event time - 2h (max ts is mid-hour in every
    // fixture, so the boundary is unambiguous)
    "q_stream_durable" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events)
         SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events, m
         WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
         GROUP BY 1, 2""",

    "q_stream_static_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment, event_type""",

    "q_stream_stream_join" ->
      """WITH s AS (
           SELECT user_id, event_id, date_trunc('second', ts) AS ts
           FROM events WHERE event_type = 'signup'),
         p AS (
           SELECT user_id, event_id, date_trunc('second', ts) AS ts
           FROM events WHERE event_type = 'purchase')
         SELECT s.user_id,
           s.event_id AS signup_id, p.event_id AS purchase_id,
           CAST(epoch(p.ts) - epoch(s.ts) AS BIGINT) AS delay_s
         FROM s JOIN p ON s.user_id = p.user_id
           AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR""",

    "q_stream_outer_join" ->
      """WITH s AS (
           SELECT user_id, event_id, date_trunc('second', ts) AS ts
           FROM events WHERE event_type = 'signup'),
         p AS (
           SELECT user_id, event_id, date_trunc('second', ts) AS ts
           FROM events WHERE event_type = 'purchase'),
         wm AS (
           SELECT least((SELECT max(ts) FROM s), (SELECT max(ts) FROM p))
             - INTERVAL 2 HOUR AS w),
         m AS (
           SELECT s.user_id, s.event_id AS signup_id,
             p.event_id AS purchase_id,
             CAST(epoch(p.ts) - epoch(s.ts) AS BIGINT) AS delay_s
           FROM s JOIN p ON s.user_id = p.user_id
             AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR),
         u AS (
           SELECT s.user_id, s.event_id AS signup_id,
             CAST(NULL AS BIGINT) AS purchase_id,
             CAST(NULL AS BIGINT) AS delay_s
           FROM s, wm
           WHERE NOT EXISTS (
               SELECT 1 FROM p WHERE p.user_id = s.user_id
                 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR)
             AND s.ts + INTERVAL 1 HOUR < wm.w)
         SELECT * FROM m UNION ALL SELECT * FROM u""",

    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
         FROM events""",

    // the stateless per-row rule makes the streamed kept set equal the
    // batch mixture sample exactly — SAME shared oracle string
    "q_stream_sample" -> graft.operators.Text.mixtureOracleSql,

    // survivors = odd (delta) docs with NO verified J>=0.7 partner in
    // the even (base) half; same gram CTE + size prefilter the
    // q_dedup_cross oracle proves sound, and hashed-gram Jaccard equals
    // string-gram Jaccard up to 2^-64 collisions
    // identical SQL to q_span_dedup_cross: batching must not change any
    // per-document profile (each doc lives wholly inside one batch)
    "q_stream_span_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id, md5(array_to_string(w[u.i:u.i+7], ' ')) AS gh
           FROM t, UNNEST(range(1, len(w) - 6)) AS u(i)
           WHERE len(w) >= 8),
         base AS (SELECT DISTINCT gh FROM g WHERE doc_id % 2 = 0),
         delta AS (SELECT doc_id, gh FROM g WHERE doc_id % 2 = 1)
         SELECT delta.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(base.gh) AS BIGINT) AS n_base_dup_spans,
           round(CAST(count(base.gh) AS DOUBLE) / count(*), 6) AS base_dup_ratio
         FROM delta LEFT JOIN base ON delta.gh = base.gh GROUP BY 1""",

    // the span growth door's 4-step sequential fold: group k's dup
    // counts run against base spans ∪ the ARRIVAL spans of all earlier
    // groups (profiling door — every arrival's spans join the store,
    // not a survivor subset)
    "q_stream_span_grow" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id, md5(array_to_string(w[u.i:u.i+7], ' ')) AS gh
           FROM t, UNNEST(range(1, len(w) - 6)) AS u(i)
           WHERE len(w) >= 8),
         base AS (SELECT DISTINCT gh FROM g WHERE doc_id % 2 = 0),
         del AS (SELECT doc_id, gh, doc_id % 8 AS k FROM g WHERE doc_id % 2 = 1),
         o1 AS (
           SELECT d.doc_id, count(*) AS ns, count(i.gh) AS nd
           FROM del d LEFT JOIN base i ON d.gh = i.gh
           WHERE d.k = 1 GROUP BY 1),
         i3 AS (SELECT gh FROM base
                UNION SELECT DISTINCT gh FROM del WHERE k = 1),
         o3 AS (
           SELECT d.doc_id, count(*) AS ns, count(i.gh) AS nd
           FROM del d LEFT JOIN i3 i ON d.gh = i.gh
           WHERE d.k = 3 GROUP BY 1),
         i5 AS (SELECT gh FROM i3
                UNION SELECT DISTINCT gh FROM del WHERE k = 3),
         o5 AS (
           SELECT d.doc_id, count(*) AS ns, count(i.gh) AS nd
           FROM del d LEFT JOIN i5 i ON d.gh = i.gh
           WHERE d.k = 5 GROUP BY 1),
         i7 AS (SELECT gh FROM i5
                UNION SELECT DISTINCT gh FROM del WHERE k = 5),
         o7 AS (
           SELECT d.doc_id, count(*) AS ns, count(i.gh) AS nd
           FROM del d LEFT JOIN i7 i ON d.gh = i.gh
           WHERE d.k = 7 GROUP BY 1),
         allo AS (SELECT * FROM o1 UNION ALL SELECT * FROM o3
                  UNION ALL SELECT * FROM o5 UNION ALL SELECT * FROM o7)
         SELECT doc_id, CAST(ns AS BIGINT) AS n_spans,
           CAST(nd AS BIGINT) AS n_dup_spans,
           round(CAST(nd AS DOUBLE) / ns, 6) AS dup_ratio
         FROM allo""",

    // the shared repetition CTEs over the delta half, flagged only
    "q_stream_repetition" ->
      s"""WITH ${graft.operators.Text.repSignalsCtes}
         SELECT doc_id, (${graft.operators.Text.repVerdictSql}) AS verdict
         FROM sig
         WHERE doc_id % 2 = 1
           AND (${graft.operators.Text.repVerdictSql}) <> 'kept'""",

    // the shared battery CTE over the delta half, kept verdicts only
    "q_stream_quality" ->
      s"""WITH ${graft.operators.Text.gopherBatteryCte}
         SELECT doc_id, n_words, round(mean_wlen, 6) AS mean_word_len,
           round(sym_ratio, 6) AS symbol_ratio,
           round(alpha_ratio, 6) AS alpha_word_ratio, n_stop_hits,
           ${graft.operators.Text.gopherVerdictSql} AS verdict
         FROM f
         WHERE doc_id % 2 = 1
           AND (${graft.operators.Text.gopherVerdictSql}) = 'kept'""",

    // rebuilds the base-half models from the same construction as the
    // persisted store (deterministic), scores the delta half, keeps
    // log_w > 0 — the synthesized-input convention of the store family
    "q_stream_dsir" ->
      """WITH d AS (
           SELECT doc_id, lang,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents),
         t AS (
           SELECT doc_id, lang,
             list_transform(range(1, len(w)), i ->
               CAST(('0x' || substring(md5(w[i] || ' ' || w[i+1]), 1, 8)) AS BIGINT) % 1024) AS bks
           FROM d WHERE len(w) >= 2),
         gr AS (SELECT lang, unnest(bks) AS b FROM t WHERE doc_id % 2 = 0),
         m AS (
           SELECT b,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc,
             CAST(count(*) AS BIGINT) AS rc
           FROM gr GROUP BY b),
         model AS (
           SELECT
             (SELECT map(list(b ORDER BY b), list(tc ORDER BY b)) FROM m) AS tm,
             (SELECT CAST(sum(tc) AS DOUBLE) FROM m) AS tt,
             (SELECT map(list(b ORDER BY b), list(rc ORDER BY b)) FROM m) AS rm,
             (SELECT CAST(sum(rc) AS DOUBLE) FROM m) AS rt),
         sc AS (
           SELECT doc_id, lang, CAST(len(bks) AS BIGINT) AS n_bigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), bks), (acc, b) ->
               acc + ln((coalesce(tm[b][1], 0) + 1) / (tt + 1024.0))
                   - ln((coalesce(rm[b][1], 0) + 1) / (rt + 1024.0))) AS log_w
           FROM t, model WHERE doc_id % 2 = 1)
         SELECT doc_id, lang, n_bigrams, round(log_w, 6) AS log_w
         FROM sc WHERE log_w > 0""",

    // the batch q_decontaminate oracle restricted to its survivors —
    // per-doc stateless door, so drained output == batch profile + HAVING
    "q_stream_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 2),
               i -> array_to_string(w[i:i+3], ' '))) AS gram
           FROM d WHERE len(w) >= 4),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 53 = 0),
         corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 53 != 0)
         SELECT c.doc_id, count(*) AS n_grams
         FROM corpus c LEFT JOIN bench b ON c.gram = b.gram
         GROUP BY c.doc_id
         HAVING count(b.gram) = 0""",

    // rebuilds the media store's blob hex + the door's arrival fixture
    // (byte-identical copies of %10==0, %10==5 extended by one block) as
    // CTEs, decodes both sides with the same integer+one-division IEEE
    // sequence as the q_dedup_media oracle, and keeps arrivals with NO
    // signature-equal base asset — the door's anti-join, spelled in SQL
    "q_stream_media_filter" ->
      """WITH base AS (
           SELECT doc_id, text,
             md5(text || '0') ||
             CASE WHEN doc_id % 8 >= 1 THEN md5(text || '1') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 2 THEN md5(text || '2') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 3 THEN md5(text || '3') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 4 THEN md5(text || '4') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 5 THEN md5(text || '5') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 6 THEN md5(text || '6') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 7 THEN md5(text || '7') ELSE '' END
               AS hx
           FROM documents),
         u AS (
           SELECT doc_id, hx, 0 AS is_new FROM base
           UNION ALL
           SELECT doc_id + 1000000000 AS doc_id, hx, 1 AS is_new
           FROM base WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id + 1000000000 AS doc_id, hx || md5(text || 'x') AS hx,
             1 AS is_new
           FROM base WHERE doc_id % 10 = 5),
         b AS (
           SELECT doc_id, is_new, CAST(len(hx) // 2 AS BIGINT) AS n,
             list_transform(range(1, len(hx) // 2 + 1),
               j -> CAST(('0x' || substring(hx, CAST(2*j - 1 AS INTEGER), 2))
                 AS BIGINT)) AS bytes
           FROM u),
         sig AS (
           SELECT doc_id, is_new, n,
             CAST(16 + list_sum(bytes) % 16 AS BIGINT) AS width,
             CAST(16 + n % 16 AS BIGINT) AS height,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 0),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f0,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 1),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f1,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 2),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f2,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 3),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f3
           FROM b)
         SELECT nw.doc_id, CAST(nw.n AS INTEGER) AS nbytes
         FROM sig nw
         WHERE nw.is_new = 1 AND NOT EXISTS (
           SELECT 1 FROM sig o WHERE o.is_new = 0
             AND o.n = nw.n AND o.width = nw.width AND o.height = nw.height
             AND o.f0 = nw.f0 AND o.f1 = nw.f1 AND o.f2 = nw.f2
             AND o.f3 = nw.f3)""",

    // the media grow door's two-step sequential fold: the same blob +
    // signature CTEs as q_stream_media_filter with a batch tag (grp 0 =
    // base catalog, 1 = the arrival fixture, 2 = byte-identical
    // re-submissions of batch 1's survivors + fresh y-extended assets);
    // batch-1 keeps test against base, batch-2 keeps test against
    // base ∪ batch-1 keeps — the re-submissions are dropped ONLY by the
    // grown store, so a non-growing door fails this oracle on rows
    "q_stream_media_grow" ->
      """WITH base AS (
           SELECT doc_id, text,
             md5(text || '0') ||
             CASE WHEN doc_id % 8 >= 1 THEN md5(text || '1') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 2 THEN md5(text || '2') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 3 THEN md5(text || '3') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 4 THEN md5(text || '4') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 5 THEN md5(text || '5') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 6 THEN md5(text || '6') ELSE '' END ||
             CASE WHEN doc_id % 8 >= 7 THEN md5(text || '7') ELSE '' END
               AS hx
           FROM documents),
         u AS (
           SELECT doc_id, hx, 0 AS grp FROM base
           UNION ALL
           SELECT doc_id + 1000000000 AS doc_id, hx, 1 AS grp
           FROM base WHERE doc_id % 10 = 0
           UNION ALL
           SELECT doc_id + 1000000000 AS doc_id, hx || md5(text || 'x') AS hx,
             1 AS grp
           FROM base WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id + 2000000000 AS doc_id, hx || md5(text || 'x') AS hx,
             2 AS grp
           FROM base WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id + 2000000000 AS doc_id, hx || md5(text || 'y') AS hx,
             2 AS grp
           FROM base WHERE doc_id % 10 = 7),
         b AS (
           SELECT doc_id, grp, CAST(len(hx) // 2 AS BIGINT) AS n,
             list_transform(range(1, len(hx) // 2 + 1),
               j -> CAST(('0x' || substring(hx, CAST(2*j - 1 AS INTEGER), 2))
                 AS BIGINT)) AS bytes
           FROM u),
         sig AS (
           SELECT doc_id, grp, n,
             CAST(16 + list_sum(bytes) % 16 AS BIGINT) AS width,
             CAST(16 + n % 16 AS BIGINT) AS height,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 0),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f0,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 1),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f1,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 2),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f2,
             CAST(list_sum(list_transform(
               list_filter(range(1, n + 1), i -> (i - 1) % 4 = 3),
               i -> bytes[CAST(i AS INTEGER)])) AS DOUBLE) / n AS f3
           FROM b),
         k1 AS (
           SELECT * FROM sig nw
           WHERE nw.grp = 1 AND NOT EXISTS (
             SELECT 1 FROM sig o WHERE o.grp = 0
               AND o.n = nw.n AND o.width = nw.width AND o.height = nw.height
               AND o.f0 = nw.f0 AND o.f1 = nw.f1 AND o.f2 = nw.f2
               AND o.f3 = nw.f3)),
         i2 AS (SELECT * FROM sig WHERE grp = 0 UNION ALL SELECT * FROM k1),
         k2 AS (
           SELECT * FROM sig nw
           WHERE nw.grp = 2 AND NOT EXISTS (
             SELECT 1 FROM i2 o
              WHERE o.n = nw.n AND o.width = nw.width AND o.height = nw.height
               AND o.f0 = nw.f0 AND o.f1 = nw.f1 AND o.f2 = nw.f2
               AND o.f3 = nw.f3))
         SELECT doc_id, CAST(n AS INTEGER) AS nbytes FROM k1
         UNION ALL
         SELECT doc_id, CAST(n AS INTEGER) AS nbytes FROM k2""",

    "q_stream_neardup_filter" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
           FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
                 FROM documents)
           WHERE len(w) >= 3),
         dup AS (
           SELECT DISTINCT b.doc_id FROM d a JOIN d b
             ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
            AND len(a.g) * 10 >= len(b.g) * 7
            AND len(b.g) * 10 >= len(a.g) * 7
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / len(list_distinct(list_concat(a.g, b.g))) >= 0.7)
         SELECT doc_id FROM documents
         WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)""",

    // the growing door's sequential fold replayed as chained CTEs:
    // group k's dup test runs against base ∪ the KEPT docs of all
    // earlier groups (1, 3, 5, 7 in arrival order) — same brute-force
    // string-gram Jaccard as q_stream_neardup_filter's oracle (banded ==
    // brute force at this data: every fixture pair at J >= 0.7 sits at
    // J >= 0.9, the q_dedup_minhash recall argument); hashed-gram counts
    // equal string-gram counts up to 2^-64
    "q_stream_neardup_grow" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
           FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
                 FROM documents)
           WHERE len(w) >= 3),
         s AS (SELECT doc_id, g, len(g) AS n FROM d),
         base AS (SELECT g, n FROM s WHERE doc_id % 2 = 0),
         del AS (SELECT doc_id, g, n, doc_id % 8 AS k FROM s WHERE doc_id % 2 = 1),
         dup1 AS (
           SELECT DISTINCT a.doc_id FROM del a JOIN base b
             ON a.k = 1 AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / (a.n + b.n - len(list_intersect(a.g, b.g))) >= 0.7),
         i3 AS (SELECT g, n FROM base UNION ALL
                SELECT g, n FROM del
                WHERE k = 1 AND doc_id NOT IN (SELECT doc_id FROM dup1)),
         dup3 AS (
           SELECT DISTINCT a.doc_id FROM del a JOIN i3 b
             ON a.k = 3 AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / (a.n + b.n - len(list_intersect(a.g, b.g))) >= 0.7),
         i5 AS (SELECT g, n FROM i3 UNION ALL
                SELECT g, n FROM del
                WHERE k = 3 AND doc_id NOT IN (SELECT doc_id FROM dup3)),
         dup5 AS (
           SELECT DISTINCT a.doc_id FROM del a JOIN i5 b
             ON a.k = 5 AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / (a.n + b.n - len(list_intersect(a.g, b.g))) >= 0.7),
         i7 AS (SELECT g, n FROM i5 UNION ALL
                SELECT g, n FROM del
                WHERE k = 5 AND doc_id NOT IN (SELECT doc_id FROM dup5)),
         dup7 AS (
           SELECT DISTINCT a.doc_id FROM del a JOIN i7 b
             ON a.k = 7 AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
            AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / (a.n + b.n - len(list_intersect(a.g, b.g))) >= 0.7),
         dups AS (SELECT doc_id FROM dup1 UNION ALL
                  SELECT doc_id FROM dup3 UNION ALL
                  SELECT doc_id FROM dup5 UNION ALL
                  SELECT doc_id FROM dup7)
         SELECT doc_id, doc_id % 8 AS grp FROM documents
         WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dups)""",

    // rebuilds the base-half LM store via CTEs (the synthesized-input
    // rule), scores the base against itself for the tercile cutpoint,
    // then scores the odd-half delta with the SAME left-join add-one
    // smoothing the engine uses (unseen bigram -> cb 0, unseen word ->
    // cu 0) and keeps ppl <= c2
    "q_stream_ppl_filter" ->
      """WITH tokB AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               t -> length(t) > 0)) AS word,
             generate_subscripts(list_filter(string_split_regex(lower(text), '\s+'),
               t -> length(t) > 0), 1) AS pos
           FROM documents WHERE doc_id % 2 = 0),
         uni AS (SELECT word, count(*) AS cu FROM tokB GROUP BY word),
         v AS (SELECT count(*) AS v_size FROM uni),
         bB AS (
           SELECT * FROM (
             SELECT doc_id, pos, word,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS next
             FROM tokB)
           WHERE next IS NOT NULL),
         bc AS (SELECT word, next, count(*) AS cb FROM bB GROUP BY word, next),
         lpB AS (
           SELECT bB.doc_id, bB.pos,
             ln(coalesce(bc.cb, 0) + 1.0) - ln(coalesce(uni.cu, 0) + v.v_size) AS logp
           FROM bB LEFT JOIN bc USING (word, next)
             LEFT JOIN uni USING (word) CROSS JOIN v),
         dB AS (SELECT doc_id, count(*) AS n_bigrams,
                  list(logp ORDER BY pos) AS l
                FROM lpB GROUP BY doc_id),
         pplB AS (
           SELECT doc_id,
             round(exp(-(list_reduce(list_prepend(0.0, l), (a, b) -> a + b))
               / n_bigrams), 6) AS ppl
           FROM dB),
         c AS (SELECT quantile_cont(ppl, 0.666667) AS c2 FROM pplB),
         tokD AS (
           SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               t -> length(t) > 0)) AS word,
             generate_subscripts(list_filter(string_split_regex(lower(text), '\s+'),
               t -> length(t) > 0), 1) AS pos
           FROM documents WHERE doc_id % 2 = 1),
         bD AS (
           SELECT * FROM (
             SELECT doc_id, pos, word,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS next
             FROM tokD)
           WHERE next IS NOT NULL),
         lpD AS (
           SELECT bD.doc_id, bD.pos,
             ln(coalesce(bc.cb, 0) + 1.0) - ln(coalesce(uni.cu, 0) + v.v_size) AS logp
           FROM bD LEFT JOIN bc USING (word, next)
             LEFT JOIN uni USING (word) CROSS JOIN v),
         dD AS (SELECT doc_id, count(*) AS n_bigrams,
                  list(logp ORDER BY pos) AS l
                FROM lpD GROUP BY doc_id)
         SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(exp(-(list_reduce(list_prepend(0.0, l), (a, b) -> a + b))
             / n_bigrams), 6) AS ppl
         FROM dD, c
         WHERE round(exp(-(list_reduce(list_prepend(0.0, l), (a, b) -> a + b))
             / n_bigrams), 6) <= c2""",

    // same seeds / assignment / cosine fold as the q_dedup_semantic
    // oracle, restricted to base = even vec_ids, delta = odd; the delta
    // side keeps its TOP-2 seeds (rn <= 2) — the multi-probe — while the
    // base store stays single-assigned (rn = 1)
    // the door's DuckDB twin: the SHARED base chain (battery → dedup →
    // tokenizer training → encode view → base symtab,
    // Text.pretrainBaseCtes — the exact q_pipeline_pretrain prefix),
    // the synthesized delta rebuilt via CTE (the synthesized-input
    // rule), the same battery over it, the fingerprint anti-join, the
    // UNK-coalesced encode, and the per-group pack with group-owned
    // shard ranges
    // the fp growth door's two-step fold: base fps = distinct
    // fingerprints of the battery-kept corpus (the store's definition),
    // batch-1 keeps = battery-kept arrivals with unseen fps, batch-2
    // keeps test against base ∪ batch-1 fps — verbatim re-submissions of
    // batch-1 survivors are dropped ONLY by the grown set, so a
    // non-growing door fails on rows
    "q_stream_exactdup_grow" ->
      s"""WITH ${graft.operators.Text.gopherBatteryCte},
         j AS (
           SELECT *, (${graft.operators.Text.gopherVerdictSql}) = 'kept'
             AS pass_q FROM f),
         basefp AS (
           SELECT DISTINCT md5(array_to_string(w, ' ')) AS fp
           FROM j WHERE pass_q),
         a1 AS (
           SELECT doc_id + 5000000 AS doc_id, text, source, lang
           FROM documents WHERE doc_id % 13 = 0
           UNION ALL
           SELECT doc_id + 6000000 AS doc_id, text || ' graftdelta' AS text,
             source, lang
           FROM documents WHERE doc_id % 7 = 0),
         ${graft.operators.Text.gopherBatteryCteOver("a1", "ad1", "af1")},
         k1 AS (
           SELECT doc_id, md5(array_to_string(w, ' ')) AS fp
           FROM (SELECT *, (${graft.operators.Text.gopherVerdictSql}) = 'kept'
                 AS pq FROM af1)
           WHERE pq AND md5(array_to_string(w, ' '))
             NOT IN (SELECT fp FROM basefp)),
         i2 AS (SELECT fp FROM basefp UNION SELECT fp FROM k1),
         a2 AS (
           SELECT doc_id + 7000000 AS doc_id, text || ' graftdelta' AS text,
             source, lang
           FROM documents WHERE doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 8000000 AS doc_id, text || ' graftfresh' AS text,
             source, lang
           FROM documents WHERE doc_id % 11 = 0),
         ${graft.operators.Text.gopherBatteryCteOver("a2", "ad2", "af2")},
         k2 AS (
           SELECT doc_id, md5(array_to_string(w, ' ')) AS fp
           FROM (SELECT *, (${graft.operators.Text.gopherVerdictSql}) = 'kept'
                 AS pq FROM af2)
           WHERE pq AND md5(array_to_string(w, ' '))
             NOT IN (SELECT fp FROM i2))
         SELECT doc_id, fp FROM k1
         UNION ALL
         SELECT doc_id, fp FROM k2""",

    "q_stream_pretrain" ->
      s"""WITH ${graft.operators.Text.pretrainBaseCtes},
         delta AS (
           SELECT doc_id + 5000000 AS doc_id, text, source, lang
           FROM documents WHERE doc_id % 13 = 0
           UNION ALL
           SELECT doc_id + 6000000 AS doc_id, text || ' graftdelta' AS text,
             source, lang
           FROM documents WHERE doc_id % 7 = 0),
         ${graft.operators.Text.gopherBatteryCteOver("delta", "dd", "df")},
         dj AS (
           SELECT *, (${graft.operators.Text.gopherVerdictSql}) = 'kept'
             AS pass_q FROM df),
         dk AS (
           SELECT *, md5(array_to_string(w, ' ')) AS fp FROM dj WHERE pass_q),
         fresh AS (SELECT * FROM dk WHERE fp NOT IN (SELECT fp FROM k)),
         dtok AS (SELECT doc_id, unnest(w) AS word,
                    generate_subscripts(w, 1) AS pos
                  FROM fresh),
         dwsyms AS (SELECT t.doc_id, t.pos, coalesce(e.syms, [t.word]) AS syms
                    FROM dtok t LEFT JOIN enc e USING (word)),
         dstream AS (SELECT doc_id, pos, unnest(syms) AS sym,
                       generate_subscripts(syms, 1) AS spos
                     FROM dwsyms),
         ddocs AS (SELECT doc_id, doc_id % 4 AS gid,
                     list(coalesce(tid, 0) ORDER BY pos, spos) AS ids,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS mk
                   FROM dstream LEFT JOIN symtab USING (sym) GROUP BY doc_id),
         c AS (
           SELECT doc_id, gid, ids, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY gid ORDER BY mk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM ddocs WHERE n_tokens > 0),
         seg AS (
           SELECT doc_id, gid, ids, n_tokens, cum_before,
             unnest(range(CAST(cum_before // 2048 AS BIGINT),
               CAST((cum_before + n_tokens - 1) // 2048 + 1 AS BIGINT))) AS shard
           FROM c)
         SELECT CAST(gid * 1000000 + shard AS BIGINT) AS shard, doc_id,
           CAST(greatest(shard * 2048 - cum_before, 0) AS BIGINT) AS start_tok,
           CAST(least((shard + 1) * 2048, cum_before + n_tokens)
             - cum_before - 1 AS BIGINT) AS end_tok,
           CAST(greatest(shard * 2048, cum_before) - shard * 2048 AS BIGINT)
             AS off_in_shard,
           array_to_string(
             ids[CAST(greatest(shard * 2048 - cum_before, 0) + 1 AS BIGINT):
                 CAST(least((shard + 1) * 2048, cum_before + n_tokens)
                   - cum_before AS BIGINT)], '-') AS ids,
           CAST(gid AS BIGINT) AS ingest_group
         FROM seg""",

    // identical relation to the batch q_containment_canonical (each
    // probe's verdict depends only on itself vs the canonical index),
    // so the door shares that oracle VERBATIM
    "q_stream_containment" ->
      graft.operators.Dedup.oracles("q_containment_canonical"),

    // per-row verdicts => the door's unioned output is row-identical to
    // the batch twin; same oracle
    "q_stream_pii_redact" ->
      graft.operators.Text.oracles("q_pii_redact"),

    // per-doc verdict vs the frozen profile store => the door's unioned
    // output is the batch trigram classifier filtered to the accept set
    // — LangId's own CTE chain, shared, with the filter appended
    "q_stream_lang_filter" ->
      s"""WITH ${graft.operators.LangId.trigramCtes}
         SELECT doc_id, predicted FROM pred
         WHERE predicted IN ('en', 'fr')""",

    // the fan-out router lands EVERY doc in exactly one language
    // partition (classify is total), and the engine's output rebuilds
    // (doc_id, predicted) from the partition PATHS — so the unfiltered
    // prediction table is the oracle, and a misrouted or dropped file
    // is a row/hash mismatch
    "q_stream_lang_route" ->
      s"""WITH ${graft.operators.LangId.trigramCtes}
         SELECT doc_id, predicted FROM pred""",

    "q_stream_semantic_filter" -> semanticDoorOracle(2),

    // identical construction, one more probe (rn <= 3)
    "q_stream_semantic_filter_p3" -> semanticDoorOracle(3)
  )

  // promotion preserves door semantics ACROSS streams: stream 1 on a
  // copied base store, promoteGrowStore, stream 2 on a FRESH root
  // against the promoted store must together equal the one-stream
  // two-batch grow door's sequential fold — so the oracle is the grow
  // door's oracle, IDENTICAL by construction. A promotion that lost
  // rows would re-keep batch-2's verbatim re-submissions (extra rows);
  // a duplication cannot over-drop here (fp membership is idempotent)
  // but the bit-identity law pins that side.
  val oracles: Map[String, String] = oraclesBase +
    ("q_stream_exactdup_promote" -> oraclesBase("q_stream_exactdup_grow"))

  /** The semantic door's DuckDB twin at a probe depth: base = exact
    * nearest-seed assignment, delta = top-`probes` assignment, dup =
    * any probed cluster holding a base member at cosine >= tau.
    */
  private def semanticDoorOracle(probes: Int): String =
      s"""WITH be AS (SELECT vec_id, embedding FROM embeddings
             WHERE vec_id % 2 = 0),
         s AS (SELECT vec_id AS seed_id, embedding AS s_emb FROM be
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               LIMIT greatest(8, (SELECT count(*) // 128 FROM be))),
         bscored AS (
           SELECT be.vec_id, be.embedding, s.seed_id,
             ${graft.operators.Dedup.cosFold("be.embedding", "s.s_emb")} AS ccos
           FROM be CROSS JOIN s),
         basg AS (
           SELECT vec_id, embedding, seed_id FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, seed_id) AS rn
             FROM bscored) WHERE rn = 1),
         de AS (SELECT vec_id, embedding FROM embeddings
             WHERE vec_id % 2 = 1),
         dscored AS (
           SELECT de.vec_id, de.embedding, s.seed_id,
             ${graft.operators.Dedup.cosFold("de.embedding", "s.s_emb")} AS ccos
           FROM de CROSS JOIN s),
         dasg AS (
           SELECT vec_id, embedding, seed_id FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, seed_id) AS rn
             FROM dscored) WHERE rn <= $probes),
         dup AS (
           SELECT DISTINCT d.vec_id FROM dasg d JOIN basg b
             ON d.seed_id = b.seed_id
            AND ${graft.operators.Dedup.cosFold("d.embedding", "b.embedding")} >= 0.4)
         SELECT vec_id FROM de
         WHERE vec_id NOT IN (SELECT vec_id FROM dup)"""

  /** The deterministic engine-path variant of [[sessionize]]: NoTimeout,
    * so a session emits exactly when a later event closes it and open
    * tails stay in state forever — output is micro-batch-schedule-
    * independent (no wall-clock flush), which is what makes the REAL
    * flatMapGroupsWithState run DuckDB-oracle-able (q_stream_custom_state:
    * every session except each user's open last one). Production keeps
    * the timeout flush of [[sessionize]]; correctness of the shared fold
    * is identical.
    */
  def sessionizeClosedOnly(events: Dataset[Ev], gapSeconds: Long = 1800): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toArray.sortBy(e => (e.sec, e.event_id))
          val st = state.getOption.getOrElse(SessState(0, None))
          val (closed, cur, nClosed) =
            foldSessions(user, sorted.toSeq, gapSeconds, st.sessionsClosed, st.cur)
          state.update(SessState(nClosed, cur))
          closed.iterator
      }
      .toDF()
  }

  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800): DataFrame = {
    import events.sparkSession.implicits._

    def flush(user: Long, state: GroupState[SessState]): Iterator[SessionOut] = {
      val st = state.getOption.getOrElse(SessState(0, None))
      st.cur match {
        case Some((start, end, n)) =>
          state.update(SessState(st.sessionsClosed + 1, None))
          Iterator(SessionOut(user, st.sessionsClosed + 1, n, start, end))
        case None => Iterator.empty
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) flush(user, state)
          else {
            val sorted = it.toArray.sortBy(e => (e.sec, e.event_id))
            val st = state.getOption.getOrElse(SessState(0, None))
            val (closed, cur, nClosed) =
              foldSessions(user, sorted.toSeq, gapSeconds, st.sessionsClosed, st.cur)
            state.update(SessState(nClosed, cur))
            state.setTimeoutDuration("30 seconds")
            closed.iterator
          }
      }
      .toDF()
  }
}
