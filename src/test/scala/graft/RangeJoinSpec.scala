package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Guard semantics of the bucketed range join that the happy-path oracle
  * query never exercises. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private val points = Seq((1L, "10:30:00"), (2L, "11:30:00"))
    .map { case (id, t) => (id, ts(t)) }.toDF("point_id", "ts")

  test("half-open containment and bucket-crossing intervals") {
    val iv = Seq((1, ts("10:00:00"), ts("11:00:00")),
      (2, ts("09:00:00"), ts("12:00:00"))) // spans several buckets
      .toDF("interval_id", "start", "end")
    val got = RangeJoin.pointInInterval(points, iv, bucketWidthSec = 1800L)
      .select(col("point_id"), col("interval_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 1), (1L, 2), (2L, 2)))
  }

  test("end < start yields zero candidates, not a descending sequence") {
    val iv = Seq((1, ts("11:00:00"), ts("10:00:00")))
      .toDF("interval_id", "start", "end")
    assert(RangeJoin.pointInInterval(points, iv, 1800L).count() == 0)
  }

  test("an interval spanning more buckets than the guard fails loudly") {
    val iv = Seq((1, ts("10:00:00"),
      Timestamp.valueOf("2030-01-01 00:00:00"))) // ~6 years of 30-min buckets
      .toDF("interval_id", "start", "end")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, iv, 1800L,
        maxBucketsPerInterval = 1000L).count()
    }
    assert(e.getMessage.contains("pointInInterval") ||
      Option(e.getCause).exists(_.getMessage.contains("pointInInterval")),
      s"unexpected error: ${e.getMessage}")
  }
}
