package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing — the scalable replacement
  * for the naive theta join (`p.ts BETWEEN i.start AND i.end` as a
  * cross-join filter, O(|P| x |I|)):
  *
  * each interval explodes to the coarse time buckets it covers; each
  * point maps to exactly one bucket; an equi-join on the bucket key
  * followed by the exact containment filter yields the same result with
  * candidate cost |P| + sum(interval spans / bucketWidth). Bucket width
  * trades dim-side replication against candidate selectivity; AQE handles
  * residual bucket skew.
  *
  * Containment is half-open: start <= ts < end.
  */
object RangeJoin {

  /** @param points     must contain `ts` (timestamp)
    * @param intervals  must contain `start`/`end` (timestamps)
    * @param bucketWidthSec coarse bucket width in seconds */
  /** @param maxBucketsPerInterval hard guard: an interval spanning more
    * buckets than this fails loudly (raise_error) instead of exploding
    * the dim side — an open-ended SCD2 sentinel like 9999-12-31 against
    * an hourly bucket width would otherwise materialize ~70M rows per
    * interval. Cap such intervals at the points' max timestamp first, or
    * widen the bucket. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      bucketWidthSec: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val w = bucketWidthSec * 1000000L // micros
    val p = points.withColumn("__bucket", expr(s"unix_micros(ts) div $w"))
    val i = intervals
      // end < start: zero candidates, not a silently DESCENDING sequence
      // (Spark's sequence auto-steps -1)
      .filter(col("end") >= col("start"))
      .withColumn("__nb",
        expr(s"unix_micros(`end`) div $w - unix_micros(start) div $w + 1"))
      .withColumn("__bucket",
        explode(expr(
          s"""CASE WHEN __nb > ${maxBucketsPerInterval}L
             |  THEN raise_error(concat('pointInInterval: interval spans ',
             |    __nb, ' buckets (max $maxBucketsPerInterval); cap the
             |    interval or widen bucketWidthSec'))
             |  ELSE sequence(unix_micros(start) div $w,
             |                unix_micros(`end`) div $w) END""".stripMargin)))
      .drop("__nb")
    p.join(i, Seq("__bucket"))
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
      .drop("__bucket")
  }
}
