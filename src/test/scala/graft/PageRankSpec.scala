package graft

import graft.operators.PageRank
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-integer PageRank vs a driver-side reference of the same
  * algebra on a small graph with hubs, leaves, and an isolated node;
  * the full pipeline is hash-checked by the `doc_pagerank` oracle. */
class PageRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // star 1-(2,3,4) plus chain 5-6, plus isolated 7
  private val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
  private val nodes = (1L to 7L).toSeq

  private def reference(iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val n = nodes.size.toLong
    val base = ((PageRank.Mass * 15L) / 100L) / n
    var pr = nodes.map(_ -> PageRank.Mass / n).toMap
    (1 to iters).foreach { _ =>
      val inc = sym.map { case (src, dst) =>
        dst -> ((pr(src) * 85L) / 100L) / deg(src)
      }.groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      pr = nodes.map(d => d -> (base + inc.getOrElse(d, 0L))).toMap
    }
    pr
  }

  test("run matches the integer reference; hub > leaf > isolated") {
    val nodesDf = nodes.toDF("node")
    val edgesDf = edges.toDF("da", "db")
    (1 to 3).foreach { iters =>
      val got = PageRank.run(nodesDf, edgesDf, "da", "db", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(iters), s"divergence at iters=$iters")
    }
    val pr = PageRank.run(nodesDf, edgesDf, "da", "db", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hub out-ranks its leaves; any connected node out-ranks the
    // isolated one, which scores exactly the teleport base
    assert(pr(1L) > pr(2L) && pr(2L) > pr(7L))
    assert(pr(7L) == ((PageRank.Mass * 15L) / 100L) / 7L)
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L)) // symmetric leaves
    intercept[IllegalArgumentException](
      PageRank.run(nodesDf, edgesDf, "da", "db", 0))
  }
}
