package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hits

/** HITS structural properties on known graphs, plus ranking agreement
  * with an independent in-memory float implementation (normalization
  * differs — integer shrink vs L2 — so SCORES differ by design and
  * the cross-check is on the induced ranking). */
class HitsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 3)
      : Map[Long, (Long, Long)] =
    Hits.run(nodes.toDF("node"), edges.toDF("src", "dst"),
        "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("bipartite: pure hubs score hub only, pure auths auth only") {
    val r = run(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L), (2L, 5L)))
    assert(r(1)._1 === r(2)._1 && r(1)._1 > 0)
    assert(r(3)._2 === r(4)._2 && r(4)._2 === r(5)._2 && r(3)._2 > 0)
    assert(Seq(1L, 2L).forall(n => r(n)._2 === 0L))
    assert(Seq(3L, 4L, 5L).forall(n => r(n)._1 === 0L))
  }

  test("more in-links from the same hubs => strictly higher authority") {
    // 1 and 2 both point at 4; only 1 points at 3; 5 is isolated
    val r = run(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 3L), (1L, 4L), (2L, 4L)))
    assert(r(4)._2 > r(3)._2)
    assert(r(5) === ((0L, 0L)))
    // 1 links to the stronger authority set {3,4} vs 2's {4} alone
    assert(r(1)._1 > r(2)._1)
  }

  test("ranking agrees with an independent float HITS") {
    val nodes = (0L to 19L).toSeq
    val edges = nodes.flatMap { i =>
      Seq(i -> ((i + 1) % 20), i -> ((i * 3 + 1) % 20))
    }.filter { case (a, b) => a != b }.distinct
    val got = run(nodes, edges, iters = 3)

    // reference: the same fixed-iteration loop in doubles with L1
    // normalization (scale-free ranking comparison)
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double].withDefaultValue(0.0)
    for (_ <- 1 to 3) {
      val ar = nodes.map(n =>
        n -> edges.collect { case (s, d) if d == n => hub(s) }.sum).toMap
      val asum = ar.values.sum
      auth = ar.map { case (k, v) => k -> v / asum }.withDefaultValue(0.0)
      val hr = nodes.map(n =>
        n -> edges.collect { case (s, d) if s == n => auth(d) }.sum).toMap
      val hsum = hr.values.sum
      hub = hr.map { case (k, v) => k -> v / hsum }.withDefaultValue(0.0)
    }
    // compare induced orderings on nodes whose float scores are
    // well-separated (> 1e-9 apart)
    def rankPairsAgree(
        intScore: Long => Long, floatScore: Long => Double): Unit =
      for (a <- nodes; b <- nodes if a < b) {
        val (fa, fb) = (floatScore(a), floatScore(b))
        if (math.abs(fa - fb) > 1e-9) {
          // no STRICT inversion (integer truncation may introduce
          // ties the float scores separate, never a reversal)
          val inverted = (fa > fb && intScore(a) < intScore(b)) ||
            (fb > fa && intScore(b) < intScore(a))
          assert(!inverted,
            s"nodes $a vs $b: float ($fa, $fb) int " +
              s"(${intScore(a)}, ${intScore(b)})")
        }
      }
    rankPairsAgree(n => got(n)._1, n => hub(n))
    rankPairsAgree(n => got(n)._2, n => auth(n))
  }

  test("iteration count is respected and scores stay on the grid") {
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    // a symmetric ring: every node identical by symmetry
    val r = run(nodes, edges, iters = 2)
    assert(r(1) === r(2) && r(2) === r(3))
    assert(r(1)._1 > 0 && r(1)._2 > 0)
  }
}
