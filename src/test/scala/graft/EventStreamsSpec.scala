package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{ClosedSession, Ev}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming behavior: the batch twins are oracle-checked by
  * the driver; here the SAME plans run as real streams via MemoryStream,
  * plus the custom-state sessionizer and watermark late-data handling. */
class EventStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("streaming tumbling counts equal the batch plan on the same data") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.streamingTumblingCounts(events)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    val data = Seq(
      (ts(1), "click", 1.0), (ts(5), "view", 2.0), (ts(20), "click", 3.0),
      (ts(59), "view", 4.0), (ts(59, 59), "click", 5.0))
    mem.addData(data: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventStreams.tumblingCounts(data.toDF("ts", "event_type", "value"))
      .orderBy("window_start", "event_type").collect().toSeq
    q.stop()
    assert(streamed == batch)
  }

  test("watermark drops events later than the threshold") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.streamingTumblingCounts(events)
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    mem.addData((ts(5), "click", 1.0), (ts(59), "click", 1.0))
    q.processAllAvailable()
    // advance event time far past the first window + watermark
    mem.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "click", 1.0))
    q.processAllAvailable()
    // this event is hours behind the watermark -> must be dropped
    mem.addData((ts(7), "click", 100.0))
    q.processAllAvailable()
    mem.addData((Timestamp.valueOf("2024-01-01 15:00:00"), "click", 1.0))
    q.processAllAvailable()
    val out = spark.table("late_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    q.stop()
    // the 10:00 window was finalized with 2 events; the late 100.0 never lands
    assert(out.contains(("2024-01-01 10:00:00.0", 2L, 2.0)))
    assert(!out.exists(_._3 >= 100.0))
  }

  test("custom flatMapGroupsWithState sessionizer matches session_window") {
    // batch events: per user, the closed sessions (all but each user's
    // last) must match the built-in session_window aggregation
    val raw = Seq(
      (1L, ts(0), 1.0), (1L, ts(3), 2.0), (1L, ts(30), 3.0), (1L, ts(35), 4.0),
      (1L, ts(55), 5.0),
      (2L, ts(10), 1.5), (2L, ts(40), 2.5))
    val df = raw.toDF("user_id", "ts", "value")
    val builtin = EventStreams.sessionCounts(df)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val custom = EventStreams.customSessions(
        df.as[(Long, Timestamp, Double)].map(t => Ev(t._1, t._2, t._3)))
      .collect()
      .map(c => (c.user_id, c.session_start, c.session_end, c.n, c.total))
      .sortBy(t => (t._1, t._2.getTime))
    // drop each user's final (still-open) session from the builtin result
    val closedExpected = builtin.groupBy(_._1).toSeq.flatMap {
      case (_, ss) => ss.sortBy(_._2.getTime).dropRight(1).toSeq
    }.sortBy(t => (t._1, t._2.getTime))
    assert(custom.toSeq == closedExpected)
  }

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val events = mem.toDS().map(t => Ev(t._1, t._2, t._3))
      val q = EventStreams.runningTotals(events)
        .toDF("user_id", "n_events", "total")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      mem.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (2L, ts(2), 5.0))
      q.processAllAvailable()
      mem.addData((1L, ts(3), 4.0))
      q.processAllAvailable()
      val out = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      q.stop()
      // batch 1 snapshots: u1=(2, 3.0), u2=(1, 5.0); batch 2: u1=(3, 7.0)
      assert(out == Set((1L, 2L, 3.0), (2L, 1L, 5.0), (1L, 3L, 7.0)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("an event exactly one gap after its predecessor MERGES into the session") {
    // Empirically pinned boundary semantics: Spark's session_window
    // coalesces ADJACENT [ts, ts+gap) windows, so ts(0) and ts(10) form
    // ONE session [10:00, 10:20). The gaps-and-islands oracle (strict >)
    // and the custom sessionizer must agree.
    val raw = Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0))
    val df = raw.toDF("user_id", "ts", "value")
    val builtin = EventStreams.sessionCounts(df).collect()
    assert(builtin.length == 1, "exact-gap spacing must merge sessions")
    assert(builtin(0).getTimestamp(1) == ts(0) &&
      builtin(0).getTimestamp(2) == ts(20) && builtin(0).getLong(3) == 2L)
    val custom = EventStreams.customSessions(
        df.as[(Long, Timestamp, Double)].map(t => Ev(t._1, t._2, t._3)))
      .collect()
    // the single merged session stays open -> no closed session emitted
    assert(custom.isEmpty)
  }
}
