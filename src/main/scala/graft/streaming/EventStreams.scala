package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics (the `events` table extension, SURVEY §2.8):
  * tumbling / sliding / session windows, expressed once so the SAME plan
  * runs in batch (for the DuckDB oracle) and under Structured Streaming
  * (with watermarks, exercised in the test suite via MemoryStream).
  *
  * Streaming-at-scale notes: aggregation state is keyed by
  * (window, event_type) or (user_id, session) — bounded by the watermark,
  * which caps state size; `session_window` + watermark is Spark's native
  * scalable session implementation, and the `flatMapGroupsWithState`
  * variant shows the custom-state escape hatch for semantics the built-in
  * cannot express.
  */
object EventStreams {

  val SessionGap = "10 minutes"

  /** Tumbling 1-hour counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  val tumblingOracle: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("window_start"), col("n"), col("total"))

  val slidingOracle: String =
    """SELECT window_start, count(*) AS n, round(sum(value), 2) AS total
      |FROM (
      |  SELECT unnest([
      |      CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
      |      CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
      |        - INTERVAL 30 MINUTE
      |    ]) AS window_start, value
      |  FROM events) x
      |GROUP BY 1 ORDER BY window_start""".stripMargin

  /** Session windows per user with a 10-minute inactivity gap, via
    * Spark's native session_window (streaming-capable with watermark). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), SessionGap).as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total"))

  /** Gaps-and-islands twin of session_window semantics: a session ends
    * `gap` after its last event. Boundary (verified by the exact-gap test
    * in EventStreamsSpec): Spark MERGES an event arriving exactly `gap`
    * after its predecessor — adjacent [ts, ts+gap) windows coalesce — so
    * a new session starts only when the gap is STRICTLY greater. */
  val sessionOracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 10 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 10 MINUTE AS session_end,
      |  count(*) AS n, round(sum(value), 2) AS total
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Interval join: each click pairs with the same user's errors from the
    * preceding 2 hours. Written once; in streaming both sides carry
    * watermarks and the time-range predicate bounds the join state (Spark
    * evicts rows older than watermark + range). */
  def clickErrorIntervalJoin(
      clicks: DataFrame,
      errors: DataFrame): DataFrame =
    clicks.alias("c")
      .join(errors.alias("e"),
        expr("""c.user_id = e.user_id AND
                e.ts >= c.ts - INTERVAL 2 HOURS AND
                e.ts <= c.ts"""))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        (expr("unix_micros(c.ts)") - expr("unix_micros(e.ts)"))
          .as("us_before_click"),
        col("e.value").as("err_value"))

  val intervalJoinOracle: String =
    """SELECT c.event_id AS click_id, c.user_id,
      |  epoch_us(c.ts) - epoch_us(e.ts) AS us_before_click,
      |  e.value AS err_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id
      | AND e.ts >= c.ts - INTERVAL 2 HOUR AND e.ts <= c.ts
      |ORDER BY click_id, us_before_click""".stripMargin

  /** Streaming form with bounded state on both sides. */
  def streamingIntervalJoin(clicks: DataFrame, errors: DataFrame): DataFrame =
    clickErrorIntervalJoin(
      clicks.withWatermark("ts", "10 minutes"),
      errors.withWatermark("ts", "30 minutes"))

  // ---- Structured Streaming forms -----------------------------------

  /** Streaming tumbling aggregation with a 10-minute watermark: late
    * events beyond the watermark are dropped; state is bounded. */
  def streamingTumblingCounts(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "10 minutes"))

  def streamingSessionCounts(events: DataFrame): DataFrame =
    sessionCounts(events.withWatermark("ts", "10 minutes"))

  /** Custom-state sessionization via flatMapGroupsWithState — the escape
    * hatch for session semantics the built-in cannot express. Emits
    * closed sessions when a new event arrives more than the gap after
    * the previous one (final open sessions stay in state; for batch
    * comparison use [[sessionCounts]]). */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)
  final case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n: Long, total: Double)

  val GapMs: Long = 10 * 60 * 1000L

  def sessionize(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        // strictly > : exactly-gap-spaced events MERGE, matching the
        // built-in session_window (adjacent windows coalesce — verified
        // by the exact-gap test in EventStreamsSpec)
        case Some(st) if t - st.last > GapMs =>
          closed += ClosedSession(userId, new java.sql.Timestamp(st.start),
            new java.sql.Timestamp(st.last + GapMs), st.n, st.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case Some(st) =>
          cur = Some(SessionState(st.start, t, st.n + 1, st.total + e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  def customSessions(events: Dataset[Ev]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionize)
  }

  // ---- transformWithState (Spark 4 arbitrary-state API) --------------

  /** Running per-user totals via the transformWithState API — the
    * Spark-4-native replacement for mapGroupsWithState: typed ValueState
    * handles, timer support, RocksDB-backed state. Emits one
    * (user_id, n_events, total) row per user per micro-batch. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}

    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      totals = getHandle.getValueState[(Long, Double)](
        "totals", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, t) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; t += e.value }
      totals.update((n, t))
      Iterator.single((key, n, t))
    }
  }

  def runningTotals(events: Dataset[Ev]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
