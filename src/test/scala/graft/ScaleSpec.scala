package graft

import graft.relational.Scale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale levers are defined to be RESULT-IDENTICAL to their naive
  * formulations; globalRowNumber's contract is plain
  * row_number() OVER (ORDER BY ...) without the single-partition
  * window. */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("globalRowNumber equals the global window, ties included") {
    // duplicate sort values force ranks across range-boundary ties; the
    // unique id in the sort makes the order total
    val df = (1 to 5000).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("id", "v")
      .repartition(8)
    val scalable = Scale.globalRowNumber(df, Seq(col("v").desc, col("id")))
      .select(col("id"), col("rn"))
    val window = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").desc, col("id")))
          .cast("long"))
      .select(col("id"), col("rn"))
    assert(scalable.except(window).isEmpty && window.except(scalable).isEmpty)
    assert(scalable.count() == 5000)
  }

  test("globalRowNumber ranks within partitions, not one global window") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .repartition(8)
    val plan = Scale.globalRowNumber(df, Seq(col("v"), col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      "the window must be partitioned by the range-split id")
  }

  test("globalRowNumber on empty input yields empty output") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Scale.globalRowNumber(df, Seq(col("v"))).count() == 0)
  }

  test("rankingFamily equals the window forms, ties included") {
    // v % 37 plants heavy ties, including tie groups that straddle range
    // boundaries and an N (= 5000) not divisible by the bucket count
    val df = (1 to 5000).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("id", "v").repartition(8)
    val fam = Scale.rankingFamily(df, "v", tieDesc = true,
        tiebreak = col("id"), nBuckets = 7)
      .select(col("id"), col("rnk"), col("drnk"), col("ntl"), col("pct"))
    val wt = Window.orderBy(col("v").desc)
    val wo = Window.orderBy(col("v").desc, col("id"))
    val win = df
      .withColumn("rnk", rank().over(wt).cast("long"))
      .withColumn("drnk", dense_rank().over(wt).cast("long"))
      .withColumn("ntl", ntile(7).over(wo).cast("long"))
      .withColumn("pct", percent_rank().over(wt))
      .select(col("id"), col("rnk"), col("drnk"), col("ntl"), col("pct"))
    assert(fam.except(win).isEmpty && win.except(fam).isEmpty)
    assert(fam.count() == 5000)
  }

  test("globalRunningSum equals the global running-sum window") {
    val df = (1 to 5000).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "v")
      .repartition(8)
    val scalable = Scale.globalRunningSum(df, Seq(col("id")), col("v"), "cum")
      .select(col("id"), col("cum"))
    val win = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum"))
    assert(scalable.except(win).isEmpty && win.except(scalable).isEmpty)
    assert(scalable.count() == 5000)
  }

  test("groupedRunningSum equals the per-group running-sum window") {
    // two giant groups + a tiny one, forced through 8 range partitions
    // so groups SPAN partitions and the cross-partition offsets matter
    val df = (1 to 6000).map { i =>
      (if (i % 3 == 0) "big_a" else if (i % 3 == 1) "big_b" else "small",
        i.toLong, (i % 89).toLong)
    }.toDF("g", "id", "v").repartition(8)
    val scalable = Scale.groupedRunningSum(df, col("g"), Seq(col("id")),
        col("v"), "cum")
      .select(col("g"), col("id"), col("cum"))
    val win = df.withColumn("cum",
        sum(col("v")).over(Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("id"), col("cum"))
    assert(scalable.except(win).isEmpty && win.except(scalable).isEmpty)
    assert(scalable.count() == 6000)
    // empty input
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "id", "v")
    assert(Scale.groupedRunningSum(empty, col("g"), Seq(col("id")),
      col("v"), "cum").count() == 0)
    // groupedRowNumber = the same machinery over ones: must equal the
    // per-group row_number window
    val rn = Scale.groupedRowNumber(df, col("g"), Seq(col("id")), "rn")
      .select(col("g"), col("id"), col("rn"))
    val rnWin = df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("id")))
          .cast("long"))
      .select(col("g"), col("id"), col("rn"))
    assert(rn.except(rnWin).isEmpty && rnWin.except(rn).isEmpty)
  }

  test("rankingFamily and globalRunningSum survive empty input") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Scale.rankingFamily(df, "v", tieDesc = false,
      tiebreak = col("id"), nBuckets = 4).count() == 0)
    assert(Scale.globalRunningSum(df, Seq(col("id")), col("v"), "cum")
      .count() == 0)
  }

  test("rankingFamily with fewer rows than buckets matches ntile") {
    val df = (1 to 3).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val fam = Scale.rankingFamily(df, "v", tieDesc = false,
        tiebreak = col("id"), nBuckets = 10)
      .select(col("id"), col("ntl"))
    val win = df.withColumn("ntl",
        ntile(10).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("ntl"))
    assert(fam.except(win).isEmpty && win.except(fam).isEmpty)
  }
}
