package graft

import graft.relational.Scale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** groupedExactPercentiles is defined to EQUAL the builtin exact
  * `percentile`/`median` aggregate (same interpolation formula) while
  * keeping aggregation state bounded by distinct values instead of row
  * count — the at-scale form q_stats_aggs ships. */
class StatsAtScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, p: Double) =
    df.groupBy(col("g"))
      .agg(expr(s"percentile(v, $p)").as("exp"))

  private def compare(rows: Seq[(String, java.lang.Double)], p: Double): Unit = {
    val df = rows.toDF("g", "v")
    val got = Scale.groupedExactPercentiles(df, "g", col("v"), Seq("got" -> p))
    val joined = got.join(builtin(df, p), "g")
      .select(col("g"), col("got"), col("exp")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (g, a, e) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      assert(a == e, s"group $g p=$p: histogram=$a builtin=$e")
    }
  }

  test("matches builtin percentile across interpolation points and ties") {
    val rows = (1 to 997).map { i =>
      // heavy ties (mod 13) in one group, near-distinct values in the
      // other: both histogram regimes, odd/even counts
      if (i % 2 == 0) ("ties", java.lang.Double.valueOf((i % 13).toDouble))
      else ("wide", java.lang.Double.valueOf(i * 1.37))
    }
    for (p <- Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)) compare(rows, p)
  }

  test("matches builtin median on even and odd group sizes") {
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0,
      "b" -> 10.0, "b" -> 20.0, "b" -> 30.0)
      .map { case (g, v) => (g, java.lang.Double.valueOf(v)) }
    compare(rows, 0.5) // a: interpolated 2.5; b: exact middle 20
  }

  test("single-value and single-row groups") {
    val rows = Seq("one" -> 7.5, "const" -> 3.0, "const" -> 3.0,
      "const" -> 3.0)
      .map { case (g, v) => (g, java.lang.Double.valueOf(v)) }
    for (p <- Seq(0.0, 0.5, 1.0)) compare(rows, p)
  }

  test("nulls are excluded like the builtin") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("g", java.lang.Double.valueOf(1.0)), ("g", null),
      ("g", java.lang.Double.valueOf(3.0)), ("g", null))
    compare(rows, 0.5) // builtin over {1,3} -> 2.0
  }

  test("all-null groups are emitted with NULL, like the builtin") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("live", java.lang.Double.valueOf(1.0)),
      ("live", java.lang.Double.valueOf(2.0)),
      ("dead", null), ("dead", null))
    val df = rows.toDF("g", "v")
    for (p <- Seq(0.0, 0.5, 1.0)) {
      val got = Scale.groupedExactPercentiles(df, "g", col("v"),
        Seq("got" -> p)).collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val exp = builtin(df, p).collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(got == exp, s"p=$p: got $got, builtin $exp")
      assert(got.contains("dead") && got("dead").isEmpty,
        "a group whose values are all null must surface with NULL")
    }
  }

  test("guards: empty percentile list and duplicate names are refused") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Scale.groupedExactPercentiles(df, "g", col("v"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Scale.groupedExactPercentiles(df, "g", col("v"),
        Seq("p" -> 0.5, "p" -> 0.9))
    }
  }

  test("aggregation state is the histogram, not a value buffer") {
    val df = (1 to 10000).map(i => ("g", (i % 5).toDouble)).toDF("g", "v")
    val plan = Scale.groupedExactPercentiles(df, "g", col("v"),
      Seq("p" -> 0.5)).queryExecution.executedPlan.toString
    // the builtin's value buffer shows up as ObjectHashAggregate over
    // percentile; the histogram path is plain hash aggregation + window
    assert(!plan.contains("ObjectHashAggregate"),
      "histogram path must not build per-group value buffers")
  }
}
