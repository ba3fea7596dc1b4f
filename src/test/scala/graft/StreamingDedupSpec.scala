package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming exactly-once surfaces: watermarked dropDuplicates (event
  * dedup within the watermark horizon) and sketch sanity. */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming dropDuplicates with watermark removes re-delivered events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "value")
    val deduped = events
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
    q.processAllAvailable()
    // re-delivery of event 1 plus a new event in the same horizon
    mem.addData((1L, ts(0), 1.0), (3L, ts(2), 3.0))
    q.processAllAvailable()
    // advance watermark far ahead so all rows flush in append mode
    mem.addData((99L, Timestamp.valueOf("2024-01-01 13:00:00"), 0.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.count(_ == 1L) == 1, "re-delivered event must appear once")
    assert(ids.toSet.intersect(Set(1L, 2L, 3L)) == Set(1L, 2L, 3L))
  }

  test("approx_count_distinct stays within its error bound on real keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = li.select("l_orderkey").distinct().count().toDouble
    val approx = li.selectExpr("approx_count_distinct(l_orderkey, 0.02)")
      .first().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
