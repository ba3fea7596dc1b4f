package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.streaming.EventStreams

/** Batch twins of the streaming window analytics over `events` — the same
  * plans run under Structured Streaming with watermarks (see
  * EventStreamsSpec); here they execute in batch for the DuckDB oracle. */
object StreamingQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** The events parquet has shipped with two physical `ts` types:
    * TIMESTAMP(NANOS) (vectorized reader rejects it; read nanos as long,
    * truncate to micros — matching DuckDB) and plain TIMESTAMP_MICROS
    * (read natively; NTZ casts to session-TZ timestamp, identical under
    * the UTC session both engines run in). Adapt to whichever is on disk
    * so a regenerated dataset never breaks the whole events family. */
  def events(s: org.apache.spark.sql.SparkSession, dir: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(t(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn(
          "ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Literal test intervals over the events' January-2024 span
    * (overlapping on purpose — points can land in several). */
  val RangeIntervals: Seq[(Int, String, String)] = Seq(
    (1, "2024-01-02 00:00:00", "2024-01-04 12:00:00"),
    (2, "2024-01-03 06:00:00", "2024-01-05 00:00:00"),
    (3, "2024-01-08 00:00:00", "2024-01-08 23:59:59"),
    (4, "2024-01-10 12:00:00", "2024-01-15 00:00:00"),
    (5, "2024-01-14 00:00:00", "2024-01-14 06:30:00"),
    (6, "2024-01-18 00:00:00", "2024-01-25 00:00:00"),
    (7, "2024-01-24 18:00:00", "2024-01-26 12:00:00"),
    (8, "2024-01-29 00:00:00", "2024-02-02 00:00:00"))

  val all: Seq[Q] = Seq(
    Q("events_tumbling", (s, dir) => {
      EventStreams.tumblingCounts(events(s, dir))
        .orderBy(col("window_start"), col("event_type"))
    }, Some(EventStreams.tumblingOracle)),

    Q("events_sliding", (s, dir) => {
      EventStreams.slidingCounts(events(s, dir))
        .orderBy(col("window_start"))
    }, Some(EventStreams.slidingOracle)),

    Q("events_sessions", (s, dir) => {
      EventStreams.sessionCounts(events(s, dir))
        .orderBy(col("user_id"), col("session_start"))
    }, Some(EventStreams.sessionOracle)),

    // interval (stream-stream capable) join: clicks x same-user errors
    // within the preceding 15 minutes
    Q("events_interval_join", (s, dir) => {
      val ev = events(s, dir)
      EventStreams.clickErrorIntervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "error"))
        .orderBy(col("click_id"), col("us_before_click"))
    }, Some(EventStreams.intervalJoinOracle)),

    // as-of join: each click gets the user's most recent prior error
    Q("asof_click_error", (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("ts").as("err_ts"),
          col("value").as("err_value"))
      graft.operators.AsOfJoin
        .backward(clicks, errors, "user_id", "ts", Seq("err_ts", "err_value"))
        .select(col("event_id"), col("user_id"),
          col("asof_err_value"),
          (expr("unix_micros(ts)") - expr("unix_micros(asof_err_ts)"))
            .as("us_since_error"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |               WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, e.value AS asof_err_value,
        |  epoch_us(c.ts) - epoch_us(e.ts) AS us_since_error
        |FROM clicks c ASOF LEFT JOIN errors e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin)),

    // tolerance-bounded as-of (pandas merge_asof(tolerance=...) / kdb wj
    // semantics): a match older than the tolerance is masked to NULL,
    // not dropped. Pure composition over the as-of operator — the
    // matched timestamp already rides the payload, so the bound is one
    // per-row mask after the join, no operator change.
    Q("asof_tolerance", (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("ts").as("err_ts"),
          col("value").as("err_value"))
      val tolUs = 300L * 1000000L // 5 minutes
      graft.operators.AsOfJoin
        .backward(clicks, errors, "user_id", "ts", Seq("err_ts", "err_value"))
        .withColumn("gap_us",
          expr("unix_micros(ts)") - expr("unix_micros(asof_err_ts)"))
        .select(col("event_id"), col("user_id"),
          when(col("gap_us") <= tolUs, col("asof_err_value"))
            .as("recent_err_value"),
          when(col("gap_us") <= tolUs, col("gap_us")).as("us_since_error"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events
        |               WHERE event_type = 'click'),
        |errors AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 300000000
        |    THEN e.value END AS recent_err_value,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= 300000000
        |    THEN epoch_us(c.ts) - epoch_us(e.ts) END AS us_since_error
        |FROM clicks c ASOF LEFT JOIN errors e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin)),

    // marketing attribution: each purchase gets the user's most recent
    // prior click (last touch, via the as-of operator) and earliest-ever
    // click at-or-before it (first touch, via a per-user min reduction —
    // no window). Clicks pre-reduce to one row per (user, ts) with a
    // max-id tiebreak so the ASOF match is unambiguous on both engines.
    Q("attribution_touch", (s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts"), col("ts").as("clk_ts"),
          col("click_id"))
      val lastTouch = graft.operators.AsOfJoin
        .backward(purchases, clicks, "user_id", "ts",
          Seq("clk_ts", "click_id"))
      val firstClick = clicks
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("fc_ts"),
          min_by(col("click_id"), struct(col("ts"), col("click_id")))
            .as("fc_id"))
      lastTouch.join(firstClick, Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("last_click_id"),
          (expr("unix_micros(ts)") - expr("unix_micros(asof_clk_ts)"))
            .as("us_since_click"),
          when(col("fc_ts") <= col("ts"), col("fc_id"))
            .as("first_click_id"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts),
        |fc AS (SELECT user_id, min(ts) AS fc_ts,
        |         first(click_id ORDER BY ts, click_id) AS fc_id
        |       FROM c GROUP BY user_id)
        |SELECT p.event_id, p.user_id,
        |  c.click_id AS last_click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS us_since_click,
        |  CASE WHEN fc.fc_ts <= p.ts THEN fc.fc_id END AS first_click_id
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |LEFT JOIN fc ON p.user_id = fc.user_id
        |ORDER BY p.event_id""".stripMargin)),

    // event-sequence transition matrix: per-user lag over a total order
    // (ts then event_id), then global (prev -> next) counts — the Markov
    // view of user behavior; window is user-partitioned, counts integer
    Q("event_transitions", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev"), col("next"))
    }, Some(
      """SELECT prev, event_type AS next, count(*) AS n
        |FROM (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev
        |      FROM events)
        |WHERE prev IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev, next""".stripMargin)),

    // forward as-of: each error gets the user's NEXT click at-or-after it
    Q("asof_forward", (s, dir) => {
      val ev = events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("ts").as("clk_ts"),
          col("value").as("clk_value"))
      graft.operators.AsOfJoin
        .forward(errors, clicks, "user_id", "ts", Seq("clk_ts", "clk_value"))
        .select(col("event_id"), col("user_id"),
          col("asof_clk_value"),
          (expr("unix_micros(asof_clk_ts)") - expr("unix_micros(ts)"))
            .as("us_until_click"))
        .orderBy(col("event_id"))
    }, Some(
      """WITH errors AS (SELECT event_id, user_id, ts, value FROM events
        |               WHERE event_type = 'error'),
        |clicks AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, c.value AS asof_clk_value,
        |  epoch_us(c.ts) - epoch_us(e.ts) AS us_until_click
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts <= c.ts
        |ORDER BY e.event_id""".stripMargin)),

    // ordered funnel: first view -> first click AFTER that view -> first
    // purchase AFTER that click, per user; one summary row of stage
    // conversion counts. Each stage is a min-aggregation joined forward —
    // no per-user sequence scan, shuffles only on user_id.
    Q("events_funnel", (s, dir) => {
      val ev = events(s, dir)
      def stage(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("ts"))
      val v = stage("view").groupBy(col("user_id"))
        .agg(min(col("ts")).as("v_ts"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts") >= col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts") >= col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .agg(count(col("v_ts")).as("n_view"),
          count(col("c_ts")).as("n_click_after_view"),
          count(col("p_ts")).as("n_purchase_after_click"))
    }, Some(
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT count(v_ts) AS n_view,
        |  count(c_ts) AS n_click_after_view,
        |  count(p_ts) AS n_purchase_after_click
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""
        .stripMargin)),

    // weekly cohort retention: users bucketed by first-seen week, counted
    // per (cohort, week offset) — the standard retention triangle
    Q("events_retention", (s, dir) => {
      val ev = events(s, dir)
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      active.join(cohort, "user_id")
        .select(col("cohort_week"),
          (datediff(col("w"), col("cohort_week")) / 7)
            .cast("int").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }, Some(
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT c.cohort_week,
        |  CAST(datediff('day', c.cohort_week, a.w) / 7 AS INTEGER)
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM active a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)),

    // time-series resample + forward fill: an hourly spine per user,
    // gap-filled with the most recent observation — the as-of join IS the
    // forward-fill operator (one shuffle, no per-gap recursion)
    Q("events_resample", (s, dir) => {
      val ev = events(s, dir).filter(col("user_id") <= 20)
        .select(col("user_id"), col("ts"), col("value"))
      val spine = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          max(col("ts")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
            .as("ts"))
      graft.operators.AsOfJoin
        .backward(spine, ev, "user_id", "ts", Seq("value"))
        .select(col("user_id"), col("ts").as("hour_ts"),
          round(col("asof_value"), 2).as("ffill_value"))
        .orderBy(col("user_id"), col("hour_ts"))
    }, Some(
      """WITH ev AS (SELECT user_id, ts, value FROM events
        |            WHERE user_id <= 20),
        |b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |        max(ts) AS h1
        |      FROM ev GROUP BY 1),
        |spine AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts
        |  FROM b)
        |SELECT s.user_id, s.ts AS hour_ts, round(e.value, 2) AS ffill_value
        |FROM spine s ASOF LEFT JOIN ev e
        |  ON s.user_id = e.user_id AND s.ts >= e.ts
        |ORDER BY s.user_id, hour_ts""".stripMargin)),

    // bucketed point-in-interval range join over literal intervals
    Q("range_join_intervals", (s, dir) => {
      import s.implicits._
      val iv = RangeIntervals.map { case (id, a, b) => (id, a, b) }
        .toDF("interval_id", "start_s", "end_s")
        .select(col("interval_id"),
          col("start_s").cast("timestamp").as("start"),
          col("end_s").cast("timestamp").as("end"))
      graft.operators.RangeJoin
        .pointInInterval(events(s, dir), iv, bucketWidthSec = 86400L)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("interval_id"))
    }, Some {
      val vals = RangeIntervals.map { case (id, a, b) =>
        s"($id, TIMESTAMP '$a', TIMESTAMP '$b')"
      }.mkString(",\n")
      s"""WITH iv(interval_id, s, e) AS (VALUES
         |$vals)
         |SELECT interval_id, count(*) AS n, round(sum(value), 2) AS total
         |FROM events JOIN iv ON ts >= s AND ts < e
         |GROUP BY interval_id ORDER BY interval_id""".stripMargin
    }),
  )

}
