package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Graph operators on constructed graphs with hand-computed truth —
  * the corpus `graph_*` queries run the SAME code over the parse-
  * derived link graph (oracle-hash-checked there); here the ground
  * truth is analytic.
  *
  * Fixture: K4 on {1,2,3,4} ∪ triangle {5,6,7} with pendant 8 on 5 ∪
  * path 9—10.
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges: DataFrame = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L), (5L, 8L), (9L, 10L))
      .toDF("src", "dst")
  }

  test("undirected dedups reversed and duplicate directed edges") {
    import spark.implicits._
    val e = Seq((2L, 1L), (1L, 2L), (1L, 2L), (3L, 1L))
      .toDF("src", "dst")
    val u = GraphOps.undirected(e).orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(u === Seq((1L, 2L), (1L, 3L)))
  }

  test("triangleStats: K4, pendant triangle, path — analytic truth") {
    val got = GraphOps.triangleStats(GraphOps.undirected(edges))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // K4: deg 3, C(3,2)=3 triangles per node, cc = 3·2e6/6 = 1e6
    // n5: deg 3 (6,7,8), 1 triangle, cc = 2e6/6 = 333333
    // n6,n7: deg 2, 1 triangle, cc = 2e6/2 = 1e6
    // n8: deg 1; n9,n10: deg 1 — no triangles, cc 0
    val want = Seq(
      (1L, 3L, 3L, 1000000L), (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L), (4L, 3L, 3L, 1000000L),
      (5L, 3L, 1L, 333333L), (6L, 2L, 1L, 1000000L),
      (7L, 2L, 1L, 1000000L), (8L, 1L, 0L, 0L),
      (9L, 1L, 0L, 0L), (10L, 1L, 0L, 0L))
    assert(got === want)
  }

  test("kcore(2): pendant and path peel off, K4 and triangle survive") {
    val got = GraphOps.kcore(GraphOps.undirected(edges), k = 2,
        rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round 1 drops 8, 9, 10 (deg 1); n5 drops to deg 2 and stays
    val want = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
      (5L, 2L), (6L, 2L), (7L, 2L))
    assert(got === want)
  }

  test("labelPropagate: K4 and pendant-triangle converge, path 2-cycles") {
    import spark.implicits._
    val nodes = (1L to 10L).toDF("node")
    val got = GraphOps.labelPropagate(nodes, edges, iters = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // hand-run of 3 synchronous rounds (most-frequent, ties to min):
    // K4 → all label 1 (members 4); {5,6,7,8} → all label 5
    // (members 4); 9—10 oscillates: (10, 9) after round 3 — the
    // classic sync-LPA 2-cycle on a bipartite pair, deterministic
    val want = Seq(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (5L, 5L, 4L), (6L, 5L, 4L), (7L, 5L, 4L), (8L, 5L, 4L),
      (9L, 10L, 1L), (10L, 9L, 1L))
    assert(got === want)
  }

  test("labelPropagate: isolated node keeps its own label") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 99L).toDF("node")
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.labelPropagate(nodes, e, iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 1—2 swap then swap back: after 2 rounds each is back to itself;
    // 99 never moves
    assert(got === Seq((1L, 1L), (2L, 2L), (99L, 99L)))
  }
}
