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

  // every case runs ALL THREE paths: the bounded driver union-find
  // (default cap), the distributed label rounds (cap forced to 0), and
  // the large-star/small-star alternation — all must agree
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val fast = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents
      .run(edges.toDF("a", "b"), "a", "b", driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, s"driver union-find vs label rounds: $fast != $dist")
    val star = ConnectedComponents
      .runLogStar(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == star, s"driver union-find vs log-star: $fast != $star")
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

  test("log-star converges on a deep chain where min-label's budget fails") {
    // diameter 300: min-label needs ~300 rounds, so a 20-round budget
    // must REFUSE (the documented no-silent-partial-results contract)...
    val chain = (0L until 300L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      ConnectedComponents.run(
        chain.toDF("a", "b"), "a", "b", maxIter = 20, driverEdgeCap = 0L)
    }
    // ...while the same 20-round budget is ample for the log-rounds
    // alternation (Kiveris et al.: O(log^2 n) regardless of diameter)
    val star = ConnectedComponents
      .runLogStar(chain.toDF("a", "b"), "a", "b", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 301 && star.values.forall(_ == 0L))
  }

  test("log-star handles scattered ids and unordered input") {
    val got = ConnectedComponents
      .runLogStar(Seq((900L, 5L), (5L, 70L), (70L, 900L), (3L, 901L),
          (42L, 42L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pure self-loop node 42 keeps a row (its own component),
    // matching run() and the recursive-CTE oracle
    assert(got == Map(5L -> 5L, 70L -> 5L, 900L -> 5L, 3L -> 3L,
      901L -> 3L, 42L -> 42L))
  }
}
