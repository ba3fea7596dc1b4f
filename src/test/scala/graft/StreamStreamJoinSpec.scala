package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Stream-stream interval join: the same plan that the driver oracle
  * checks in batch (events_interval_join), run as a genuine two-stream
  * join with watermarked state. */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming interval join equals the batch twin on the same data") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp, Double)]
    val errors = MemoryStream[(Long, Long, Timestamp, Double)]
    def df(m: MemoryStream[(Long, Long, Timestamp, Double)]) =
      m.toDF().toDF("event_id", "user_id", "ts", "value")

    val joined = EventStreams.streamingIntervalJoin(df(clicks), df(errors))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()

    // user 1: error at 10:00, clicks at 10:05 (match) and 13:30 (outside 2h)
    // user 2: click at 10:10 with no error
    errors.addData((100L, 1L, ts(0), 9.9))
    clicks.addData((1L, 1L, ts(5), 1.0), (2L, 1L, Timestamp.valueOf("2024-01-01 13:30:00"), 2.0),
      (3L, 2L, ts(10), 3.0))
    q.processAllAvailable()
    // push watermarks forward so results flush
    errors.addData((101L, 9L, Timestamp.valueOf("2024-01-01 18:00:00"), 0.0))
    clicks.addData((4L, 9L, Timestamp.valueOf("2024-01-01 18:00:00"), 0.0))
    q.processAllAvailable()

    val streamed = spark.table("ssj_out")
      .select("click_id", "user_id", "us_before_click")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()

    val batchClicks = Seq((1L, 1L, ts(5), 1.0), (2L, 1L, Timestamp.valueOf("2024-01-01 13:30:00"), 2.0),
      (3L, 2L, ts(10), 3.0), (4L, 9L, Timestamp.valueOf("2024-01-01 18:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val batchErrors = Seq((100L, 1L, ts(0), 9.9),
      (101L, 9L, Timestamp.valueOf("2024-01-01 18:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val batch = EventStreams.clickErrorIntervalJoin(batchClicks, batchErrors)
      .select("click_id", "user_id", "us_before_click")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.contains((1L, 1L, 5L * 60 * 1000000L)))
    assert(!streamed.exists(_._1 == 2L), "click outside the 2h range must not join")
  }

  test("left-outer stream-stream join emits null-matched rows after the watermark") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp, Double)]
    val errors = MemoryStream[(Long, Long, Timestamp, Double)]
    def df(m: MemoryStream[(Long, Long, Timestamp, Double)]) =
      m.toDF().toDF("event_id", "user_id", "ts", "value")

    val c = df(clicks).withWatermark("ts", "10 minutes").alias("c")
    val e = df(errors).withWatermark("ts", "30 minutes").alias("e")
    val joined = c.join(e,
        org.apache.spark.sql.functions.expr(
          """c.user_id = e.user_id AND
             e.ts >= c.ts - INTERVAL 2 HOURS AND e.ts <= c.ts"""),
        "left_outer")
      .select(org.apache.spark.sql.functions.col("c.event_id").as("click_id"),
        org.apache.spark.sql.functions.col("e.event_id").as("err_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_left_out")
      .outputMode("append").start()

    // user 1's click matches an error; user 2's click has none
    errors.addData((100L, 1L, ts(0), 9.9))
    clicks.addData((1L, 1L, ts(5), 1.0), (2L, 2L, ts(6), 2.0))
    q.processAllAvailable()
    // matched rows can emit immediately; the UNMATCHED left row must wait
    val early = spark.table("ssj_left_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(early.contains((1L, 100L)))
    assert(!early.exists(_._1 == 2L),
      "unmatched left row must be held until the watermark closes its window")
    // advance both watermarks far past click 2's join window
    errors.addData((101L, 9L, Timestamp.valueOf("2024-01-02 12:00:00"), 0.0))
    clicks.addData((4L, 9L, Timestamp.valueOf("2024-01-02 12:00:00"), 0.0))
    q.processAllAvailable()
    val late = spark.table("ssj_left_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(late.contains((2L, -1L)),
      s"null-matched row for click 2 must flush after the watermark: $late")
  }

  test("stream-static broadcast enrichment: dim rows join each micro-batch") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    // static dim (the catalog-lookup shape of S2/J1, under streaming):
    // broadcast so each micro-batch enriches map-side with no shuffle
    val dim = Seq((1L, "cz"), (2L, "de")).toDF("user_id", "country")
    val events = MemoryStream[(Long, Long, Timestamp, Double)]
    val enriched = events.toDF().toDF("event_id", "user_id", "ts", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("country"), lit("unknown")).as("country"))
    val q = enriched.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()

    events.addData((10L, 1L, ts(0), 1.0), (11L, 3L, ts(1), 2.0))
    q.processAllAvailable()
    events.addData((12L, 2L, ts(2), 3.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_enrich").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == Set((10L, "cz"), (11L, "unknown"), (12L, "de")),
      s"$got — dim misses must flag, not drop (P6 discipline)")
  }
}
