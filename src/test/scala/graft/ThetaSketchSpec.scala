package graft

import graft.functions.ThetaSketchOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Theta sketch exactness below the nominal budget, partition-
  * independence of the distributed union, and the bounded-error
  * regime past the budget. The hash gate against DuckDB is
  * `q_theta_sketch`. */
class ThetaSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("exact mode: estimates and set ops are exact integers below 2^LgK") {
    val a = spark.createDataset((1L to 3000L) ++ (1L to 1000L)) // dups
    val b = spark.createDataset(2001L to 5000L)
    val (skA, skB) = (ThetaSketchOps.sketch(a), ThetaSketchOps.sketch(b))
    assert(ThetaSketchOps.estimate(skA) == 3000.0)
    assert(ThetaSketchOps.estimate(skB) == 3000.0)
    val (un, in, anb) = ThetaSketchOps.setOps(skA, skB)
    assert(un == 5000.0, "union |1..5000|")
    assert(in == 1000.0, "intersection |2001..3000|")
    assert(anb == 2000.0, "a-not-b |1..2000|")
  }

  test("partition-independence: any partitioning unions to the same sketch") {
    val keys = (1L to 4000L).map(k => k % 1357)
    val s2 = ThetaSketchOps.sketch(
      spark.createDataset(keys).repartition(2))
    val s7 = ThetaSketchOps.sketch(
      spark.createDataset(keys).repartition(7))
    assert(ThetaSketchOps.estimate(s2) == 1357.0)
    assert(java.util.Arrays.equals(s2, s7),
      "exact-mode compacts are canonical: identical bytes")
  }

  test("past the budget: bounded-error estimation regime") {
    val n = 200000L
    val est = ThetaSketchOps.estimate(
      ThetaSketchOps.sketch(spark.createDataset(1L to n)))
    // k = 2^16 gives RSE ~0.39%; 2% is ~5 sigma
    assert(Math.abs(est - n) <= n * 0.02,
      s"estimate $est vs exact $n out of the published bound")
  }
}
