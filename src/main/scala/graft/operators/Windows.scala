package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Window-function inventory (SURVEY.md §2.2 "Window functions") plus
  * time-bucketed aggregation and gap-based sessionization on `events`.
  *
  * The reference can only express a window by shipping a whole partition's
  * value list into one reducefn call (mincemeat.py:179-182); Spark's window
  * exchange partitions on the window key and streams frames — the scalable
  * form as long as a single partition key's rows fit an executor.
  *
  * Determinism: every ORDER BY inside a window ends in a unique tiebreaker
  * column so row_number/lag/frames are reproducible across engines.
  */
object Windows {

  private def dec(c: org.apache.spark.sql.Column) = Parity.dec(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ranking family over a unique ordering; rank/dense_rank additionally
    // over a non-unique value ordering (deterministic *values* under ties).
    "q_window_rank" -> ((s, dir) => {
      // (l_orderkey, l_partkey, l_suppkey) is the fixture's unique key --
      // ROWS-order-sensitive functions need a total order.
      val wUnique = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val wQty = Window.partitionBy("l_suppkey").orderBy(col("l_quantity").desc)
      Tables(s, dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
          "l_shipdate", "l_partkey")
        .withColumn("rn", row_number().over(wUnique))
        .withColumn("rnk", rank().over(wQty))
        .withColumn("drnk", dense_rank().over(wQty))
        .withColumn("nt", ntile(4).over(wUnique))
        .filter(col("rn") <= 5)
        .drop("l_shipdate", "l_partkey")
    }),

    // Analytic family: lag / lead / first_value over customer order history.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .drop("o_orderdate")
    }),

    // EWMA smoothing of the daily series per event type (zero-seeded,
    // α=0.25): the classic recursive filter no SQL window frame can
    // express directly. Computed as per-prefix folds over the SORTED
    // per-type (day, cnt) list — the series is dimension-sized (≤31
    // days/type), so the quadratic prefix folding is bounded and both
    // engines run the identical interpreted op sequence (α and 1−α are
    // exact binary fractions; output stays raw, no rounding — a dyadic
    // rational can land exactly on a round boundary, where engine
    // round() semantics diverge).
    "q_ewma" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("dc"))
        .select(col("event_type"),
          explode(expr("""transform(dc, (el, t) ->
            struct(el.day AS day, el.cnt AS cnt,
              aggregate(slice(dc, 1, t + 1), 0.0D,
                (acc, y) -> 0.25D * y.cnt + 0.75D * acc) AS ewma))""")).as("u"))
        .select(col("event_type"), col("u.day").as("day"),
          col("u.cnt").as("cnt"), col("u.ewma").as("ewma"))
    }),

    // Windowed HOLISTIC aggregate: 7-day rolling median of daily event
    // counts per type — an exact percentile evaluated over a bounded
    // ROWS frame (7 values), so per-row state is frame-sized no matter
    // the corpus. Pre-aggregation to the (type, day) grain first means
    // the window runs over dimension-sized data, not raw events. Counts
    // are integers, so the even-frame interpolation lands on exact .5
    // halves — deterministic with NO rounding on either engine.
    "q_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      Tables(s, dir, "events")
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("med7", expr("percentile(cnt, 0.5)").over(w))
    }),

    // Sequence mining: first-order Markov transition counts between
    // consecutive events per user (the behavior-model / next-event
    // matrix). One per-user window pass emits (state, next_state) pairs,
    // then a states²-bounded aggregation; p_next is an exact-integer
    // ratio so the probability column is engine-deterministic. At scale
    // this is one shuffle on user_id + one tiny agg — the raw stream is
    // never re-scanned per state.
    "q_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("p_next",
          col("cnt") / sum(col("cnt")).over(Window.partitionBy("event_type")))
    }),

    // Frames: running sum (ROWS unbounded), sliding 3-row sum, and a
    // RANGE frame over a numeric ordering column. Decimal sums: exact.
    "q_window_frames" -> ((s, dir) => {
      // (l_orderkey, l_partkey, l_suppkey) is unique in the fixture data:
      // ROWS frames need a total order to be deterministic.
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      val wr = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .withColumn("running_qty",
          sum(dec(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .withColumn("slide3_qty",
          sum(dec(col("l_quantity"))).over(w.rowsBetween(-2, Window.currentRow)).cast(DoubleType))
        .withColumn("range2_qty",
          sum(dec(col("l_quantity"))).over(wr.rangeBetween(-2, Window.currentRow)).cast(DoubleType))
    }),

    // Distribution family: percent_rank / cume_dist over account balance
    // within market segment — the remaining ranking-window surface beyond
    // q_window_rank. Rank-derived values are tie-stable: with a unique
    // ORDER BY (acctbal, custkey) both engines agree bit-for-bit.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
    }),

    // Top-k per group — the scalable replacement for the reference's
    // "sort the whole value list in reducefn" idiom (SURVEY.md §2.2).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    }),

    // Gap-based sessionization (30 min): lag -> new-session flag -> running
    // sum = session id -> per-session aggregates. One shuffle on user_id.
    // Second-granularity timestamps for cross-engine parity.
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
        .withColumn("new_s",
          when(coalesce(col("sec") - lag(col("sec"), 1).over(w) > 1800, lit(true)), 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             min(col("sec")).as("sess_start"),
             max(col("sec")).as("sess_end"))
    }),

    // Spark's native session_window (batch mode): same 30-min gap-merge
    // semantics as q_sessionize, one declarative operator. At scale this
    // is the form Structured Streaming state-stores natively.
    "q_session_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(
          session_window(date_trunc("second", col("ts")), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_timestamp(col("sw.start")).as("sess_start"),
          col("n_events"))),

    // Funnel conversion: per user, first signup and first purchase at or
    // after it. The purchase constraint lives in the join condition (not a
    // post-filter) so users with zero qualifying purchases survive the
    // left join. One shuffle on user_id.
    "q_funnel" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      def sec(c: org.apache.spark.sql.Column) = unix_timestamp(date_trunc("second", c))
      val sig = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(sec(col("ts"))).as("first_signup"))
      val pur = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), sec(col("ts")).as("psec"))
      sig.join(pur,
          col("user_id") === col("p_uid") && col("psec") >= col("first_signup"), "left")
        .groupBy("user_id", "first_signup")
        .agg(min(col("psec")).as("first_purchase_after"),
          count(col("psec")).as("n_purchases_after"))
        .withColumn("converted", col("first_purchase_after").isNotNull)
    }),

    // Cohort retention: users grouped by first-active week, counted at
    // each later week offset — the standard growth-analytics matrix.
    // Two-level aggregation: (user, week) distinct activity, per-user min
    // for the cohort, join back, count distinct per (cohort, offset).
    // All shuffles key on user_id or the tiny (cohort, offset) pair;
    // the per-user first-seen table is the only state carried forward at
    // 100 TB (and is itself incrementally maintainable).
    "q_cohort_retention" -> ((s, dir) => {
      val uw = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      uw.join(first, "user_id")
        .groupBy(col("cohort_wk").cast("timestamp_ntz").as("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast(IntegerType).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Rolling 7-day active users: each (user, day) pair explodes map-side
    // into the 7 window-end days it contributes to, then ONE distinct
    // aggregation — no per-day self-joins, no window over the raw event
    // stream (the explode multiplies the small distinct (user, day) set,
    // not the events). The upper bound trims partial trailing windows.
    "q_rolling_active" -> ((s, dir) => {
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val hi = ud.agg(max(col("day")).as("hi"))
      ud.select(col("user_id"),
          explode(expr("sequence(day, day + interval 6 days, interval 1 day)"))
            .as("target_day"))
        .crossJoin(broadcast(hi))
        .filter(col("target_day") <= col("hi"))
        .groupBy("target_day")
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .select(col("target_day").cast("timestamp_ntz").as("target_day"),
          col("active_7d"))
    }),

    // Sliding time-window aggregation (1 h window, 30 min slide): Spark's
    // window() expands each event into its two containing windows before
    // the shuffle — partial aggregation still applies, so the shuffle
    // carries 2 partial rows per (window, type) group per partition, not
    // 2x the events.
    "q_sliding_window" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("timestamp_ntz").as("win_start"),
          col("event_type"), col("n"))),

    // Tumbling time-window aggregation (batch form; the streaming variant
    // with watermarks lives in graft.streaming and is spec-tested).
    "q_time_bucket" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_ts"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(dec(col("value"))).cast(DoubleType).as("sum_value"))),

    // Time-series resampling: regularize an irregular event stream onto a
    // fixed hourly grid — the gap-fill + LOCF (last-observation-carried-
    // forward) step every monitoring/feature pipeline needs before
    // windowed models. The spine (every key x every hour) is DERIVED from
    // the already-aggregated hourly table (dimension-sized, not
    // corpus-sized), so the corpus is scanned once for the partial-agg
    // rollup and never again; the LOCF window partitions by key. At
    // 100 TB the spine is #keys x #buckets rows — the join is
    // dimension-scale even when the raw stream isn't.
    "q_resample" -> ((s, dir) => {
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("raw_n"),
          sum(dec(col("value"))).cast(DoubleType).as("raw_sum"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      val spine = hourly.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(hourly, Seq("event_type", "hour"), "left")
        .withColumn("is_gap", col("raw_n").isNull)
        .withColumn("n", coalesce(col("raw_n"), lit(0L)))
        .withColumn("sum_value", coalesce(col("raw_sum"), lit(0.0)))
        .withColumn("locf_value", last(col("raw_sum"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("hour").cast("timestamp_ntz").as("hour_ts"),
          col("n"), col("sum_value"), col("is_gap"), col("locf_value"))
    }),

    // SCD Type-2 history build — the warehouse pattern for "what was this
    // user's state over time": collapse each user's event stream into
    // versioned validity intervals, one row per run of consecutive equal
    // event_type (gaps-and-islands). lag() marks run starts, a running sum
    // numbers the runs, lead() closes each interval with the next run's
    // start; the open interval (valid_to NULL) is the current state. All
    // windows partition by user_id — per-user history shuffles once and
    // never needs a global order, so the build is one exchange at any
    // corpus size. Seconds since epoch (the sessionize convention) keep
    // the interval arithmetic engine-exact.
    "q_scd2" -> ((s, dir) => {
      val wRow = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy(col("version"))
      val runs = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"),
          col("event_type"))
        .withColumn("chg",
          (lag(col("event_type"), 1).over(wRow).isNull ||
            lag(col("event_type"), 1).over(wRow) =!= col("event_type"))
            .cast(LongType))
        .withColumn("version",
          sum(col("chg")).over(wRow.rowsBetween(Window.unboundedPreceding, 0))
            .cast(IntegerType))
        .groupBy("user_id", "version", "event_type")
        .agg(min(col("sec")).as("valid_from"), count(lit(1)).as("n_events"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
        .withColumn("is_current", col("valid_to").isNull)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT * FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS rn,
             rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
             dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk,
             ntile(4) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey) AS nt
           FROM lineitem
         ) WHERE rn <= 5""",

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    // Same sorted per-prefix folds; dc[1:t] is 1-based inclusive = the
    // first t elements, matching Spark's slice(dc, 1, t+1) at 0-based t.
    // Every lambda operand is CAST to DOUBLE: DuckDB parses bare 0.25 as
    // DECIMAL and would run the whole fold in decimal arithmetic.
    "q_ewma" ->
      """WITH daily AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS cnt
           FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
         g AS (
           SELECT event_type,
             list(struct_pack(day := day, cnt := cnt) ORDER BY day) AS dc
           FROM daily GROUP BY event_type),
         x AS (
           SELECT event_type,
             unnest(list_transform(range(1, len(dc) + 1), t ->
               struct_pack(day := dc[t].day, cnt := dc[t].cnt,
                 ewma := list_reduce(
                   list_prepend(CAST(0 AS DOUBLE),
                     list_transform(dc[1:t], y -> CAST(y.cnt AS DOUBLE))),
                   (acc, c) -> CAST(0.25 AS DOUBLE) * c
                     + CAST(0.75 AS DOUBLE) * acc)))) AS u
           FROM g)
         SELECT event_type, u.day AS day, u.cnt AS cnt, u.ewma AS ewma
         FROM x""",

    "q_rolling_median" ->
      """WITH daily AS (
           SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS cnt
           FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d'))
         SELECT event_type, day, cnt,
           quantile_cont(cnt, 0.5) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
         FROM daily""",

    "q_event_transitions" ->
      """WITH nx AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
           FROM events)
         SELECT event_type, next_type, count(*) AS cnt,
           CAST(count(*) AS DOUBLE) /
             sum(count(*)) OVER (PARTITION BY event_type) AS p_next
         FROM nx WHERE next_type IS NOT NULL
         GROUP BY event_type, next_type""",

    "q_window_frames" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS slide3_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber
             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range2_qty
         FROM lineitem""",

    "q_window_dist" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",

    "q_topk_per_group" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders
         ) WHERE rn <= 3""",

    "q_sessionize" ->
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

    "q_session_window" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
           FROM events),
         g AS (
           SELECT user_id, event_id, sec,
             -- strictly greater: Spark's session_window treats an event at
             -- exactly session-end (gap == 30 min) as part of the session
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         sess AS (
           SELECT user_id, sec,
             -- (sec, event_id) tiebreak MUST match the g window's order:
             -- with sec alone, two events on the same truncated second
             -- (they exist at sf0.1) could have the new_s=0 row placed
             -- before its new_s=1 twin, attaching it to the prior session
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, min(sec) AS sess_start, count(*) AS n_events
         FROM sess GROUP BY user_id, sid""",

    "q_funnel" ->
      """WITH sig AS (
           SELECT user_id,
             min(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS first_signup
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         pur AS (
           SELECT user_id AS p_uid,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS psec
           FROM events WHERE event_type = 'purchase')
         SELECT s.user_id, s.first_signup,
           min(p.psec) AS first_purchase_after,
           count(p.psec) AS n_purchases_after,
           min(p.psec) IS NOT NULL AS converted
         FROM sig s LEFT JOIN pur p
           ON p.p_uid = s.user_id AND p.psec >= s.first_signup
         GROUP BY s.user_id, s.first_signup""",

    "q_sliding_window" ->
      """WITH x AS (
           SELECT event_type,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS win_start
           FROM events)
         SELECT win_start, event_type, count(*) AS n
         FROM x GROUP BY win_start, event_type""",

    "q_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_resample" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS raw_n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS raw_sum
           FROM events GROUP BY 1, 2),
         bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
         spine AS (
           SELECT t.event_type, g.hour
           FROM (SELECT DISTINCT event_type FROM hourly) t,
                (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                 FROM bounds) g)
         SELECT s.event_type, s.hour AS hour_ts,
           coalesce(h.raw_n, 0) AS n,
           coalesce(h.raw_sum, 0.0) AS sum_value,
           h.raw_n IS NULL AS is_gap,
           last_value(h.raw_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
         FROM spine s LEFT JOIN hourly h
           ON h.event_type = s.event_type AND h.hour = s.hour""",

    "q_scd2" ->
      """WITH e AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             event_type
           FROM events),
         m AS (
           SELECT user_id, event_id, sec, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w != event_type THEN 1 ELSE 0 END AS chg
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         v AS (
           SELECT user_id, sec, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS version
           FROM m),
         runs AS (
           SELECT user_id, version, event_type,
             min(sec) AS valid_from, count(*) AS n_events
           FROM v GROUP BY user_id, version, event_type)
         SELECT user_id, version, event_type, valid_from, n_events,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
             AS is_current
         FROM runs""",

    "q_cohort_retention" ->
      """WITH uw AS (
           SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
         f AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
         SELECT cohort_wk,
           CAST(date_diff('day', cohort_wk, wk) / 7 AS INTEGER) AS week_offset,
           count(DISTINCT user_id) AS n_users
         FROM uw JOIN f USING (user_id)
         GROUP BY cohort_wk, week_offset""",

    // range() is end-exclusive: day .. day+6 inclusive, matching Spark's
    // inclusive sequence(day, day + interval 6 days)
    "q_rolling_active" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
         bounds AS (SELECT max(day) AS hi FROM ud),
         tgt AS (
           SELECT user_id,
             unnest(range(day, day + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS target_day
           FROM ud)
         SELECT target_day, count(DISTINCT user_id) AS active_7d
         FROM tgt, bounds WHERE target_day <= hi
         GROUP BY target_day"""
  )
}
