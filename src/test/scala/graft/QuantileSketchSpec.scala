package graft

import graft.functions.QuantileSketchOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** KLL exactness below the first compaction and the published
  * normalized-rank-error bound past it. The hash gate against DuckDB
  * is `q_kll_quantiles`. */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("exact regime: quantiles equal percentile_disc, any partitioning") {
    // 8000 values < K: every item retained
    val values = (1L to 8000L).map(v => (v * 7919) % 10007)
    val sorted = values.sorted
    def disc(p: Double): Long =
      sorted(Math.ceil(p * sorted.size).toInt - 1)
    val sk = QuantileSketchOps.sketch(
      spark.createDataset(values).repartition(5))
    assert(QuantileSketchOps.retainedAll(sk), "must be pre-compaction")
    Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      assert(QuantileSketchOps.quantile(sk, p) == disc(p), s"p=$p")
    }
  }

  test("past capacity: normalized rank error bound holds") {
    val n = 500000L
    val sk = QuantileSketchOps.sketch(
      spark.createDataset(1L to n).repartition(8))
    assert(!QuantileSketchOps.retainedAll(sk), "estimation regime reached")
    val eps = QuantileSketchOps.rankError(sk)
    assert(eps < 0.001, s"k=32768 must carry sub-0.1% rank error, got $eps")
    Seq(0.25, 0.5, 0.9).foreach { p =>
      val q = QuantileSketchOps.quantile(sk, p)
      val trueRank = q.toDouble / n
      // allow 3x the one-sided bound for the randomized compactor
      assert(Math.abs(trueRank - p) <= 3 * eps,
        s"p=$p quantile $q implies rank $trueRank")
    }
  }
}
