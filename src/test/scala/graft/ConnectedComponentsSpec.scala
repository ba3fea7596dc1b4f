package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // every case runs BOTH paths: the bounded driver union-find (default
  // cap) and the distributed label rounds (cap forced to 0) must agree
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val fast = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents
      .run(edges.toDF("a", "b"), "a", "b", driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, s"driver union-find vs label rounds: $fast != $dist")
    fast
  }

  test("two disjoint components resolve to their min ids") {
    val got = components(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges (diameter > a couple of rounds)") {
    // 0-1-2-...-12 as a path: min label must walk the full diameter
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 13 && got.values.forall(_ == 0L))
  }

  test("a cycle plus a pendant edge is one component") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 7L)))
    assert(got.values.toSet == Set(1L))
  }
}
