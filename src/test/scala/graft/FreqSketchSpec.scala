package graft

import graft.functions.FreqSketchOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Frequency sketch exactness below map capacity and the published
  * no-false-negatives/bounds contract past it. The hash gate against
  * DuckDB is `corpus_heavy_hitters`. */
class FreqSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("exact regime: the sketch IS the frequency table, any partitioning") {
    val items = Seq.tabulate(5000)(i => s"w${i % 40}")
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
    val sk = FreqSketchOps.sketch(
      spark.createDataset(items).repartition(7))
    assert(FreqSketchOps.maxError(sk) == 0L)
    val got = FreqSketchOps.heavyHitters(sk)
    assert(got.map(r => r._1 -> r._2).toMap == expected.toMap)
    assert(got.forall { case (_, est, lb, ub) => lb == est && est == ub })
  }

  test("past capacity: heavy keys survive with bounds containing truth") {
    // 5 planted heavy keys (2000 each) in a 60k-distinct tail
    val heavy = (1 to 5).flatMap(k => Seq.fill(2000)(s"heavy$k"))
    val tail = (1 to 60000).map(i => s"tail$i")
    val sk = FreqSketchOps.sketch(
      spark.createDataset(heavy ++ tail).repartition(5))
    assert(FreqSketchOps.maxError(sk) > 0L, "estimation regime reached")
    val got = FreqSketchOps.heavyHitters(sk)
      .map(r => r._1 -> r).toMap
    (1 to 5).foreach { k =>
      val r = got.get(s"heavy$k")
      assert(r.isDefined, s"no false negatives: heavy$k must survive")
      val (_, _, lb, ub) = r.get
      assert(lb <= 2000L && 2000L <= ub, s"bounds must contain truth: $r")
    }
  }
}
