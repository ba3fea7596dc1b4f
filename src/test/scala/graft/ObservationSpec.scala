package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** df.observe — in-flight data-quality metrics collected DURING the job
  * (no second pass over the data): the operational hook a production
  * pipeline uses to count nulls/dead-letters/row totals per write. */
class ObservationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("observe collects quality metrics in the same pass as the sink") {
    val obs = Observation("ingest_metrics")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("n_high_qty"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
    li.write.format("noop").mode("overwrite").save()

    val m = obs.get
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .agg(count(lit(1)), sum(when(col("l_quantity") > 45, 1).otherwise(0)),
        round(sum(col("l_extendedprice")), 2))
      .collect()(0)
    assert(m("n_rows") == expected.getLong(0))
    assert(m("n_high_qty") == expected.getLong(1))
    assert(m("total_price") == expected.getDouble(2))
  }
}
