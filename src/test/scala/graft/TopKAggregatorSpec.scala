package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap aggregator's contract is OUTPUT-IDENTITY with the
  * row_number window formulation — including the float edge cases where
  * orderings commonly diverge (NaN, signed zero). */
class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def viaWindow(rows: Seq[(Long, Double, Long)], k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    rows.toDF("g", "s", "id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
  }

  private def viaAgg(rows: Seq[(Long, Double, Long)], k: Int) =
    rows.toDF("g", "s", "id").as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(k).toColumn)
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case ((_, id), i) => (g, i + 1, id) }
      }
      .collect().toSet

  test("NaN scores rank first, exactly like the window sort") {
    val rows = Seq(
      (1L, 0.5, 10L), (1L, Double.NaN, 11L), (1L, 0.9, 12L), (1L, 0.1, 13L))
    assert(viaAgg(rows, 2) == viaWindow(rows, 2))
    // and the NaN candidate IS in the top-2 (Spark desc ranks NaN first)
    assert(viaAgg(rows, 2).contains((1L, 1, 11L)))
  }

  test("signed zero ties break by id, like the window sort") {
    val rows = Seq((1L, 0.0, 20L), (1L, -0.0, 19L), (1L, -1.0, 21L))
    assert(viaAgg(rows, 2) == viaWindow(rows, 2))
  }

  test("random inputs agree with the window formulation") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(500)(
      (rnd.nextInt(7).toLong, math.rint(rnd.nextDouble() * 10) / 10,
        rnd.nextInt(100000).toLong))
      .distinct
    assert(viaAgg(rows, 5) == viaWindow(rows, 5))
  }
}
