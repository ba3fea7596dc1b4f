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
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      bucketWidthSec: Long): DataFrame = {
    val w = bucketWidthSec * 1000000L // micros
    val p = points.withColumn("__bucket", expr(s"unix_micros(ts) div $w"))
    val i = intervals.withColumn("__bucket",
      explode(expr(
        s"sequence(unix_micros(start) div $w, unix_micros(end) div $w)")))
    p.join(i, Seq("__bucket"))
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
      .drop("__bucket")
  }
}
