package graft

import graft.functions.CmsSketchOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Count-min determinism and the published error contract. The hash
  * gate against DuckDB is `q_cms_counts` (exact-count regime +
  * byte-equality merge probe); this spec pins the two claims the
  * oracle can't express: partition-order byte-equality as a law, and
  * the overcount bound on a deliberately undersized sketch. */
class CmsSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("counter table is byte-identical under any partitioning") {
    val keys = Seq.tabulate(20000)(i => (i % 500).toLong)
    val ds = spark.createDataset(keys)
    val a = CmsSketchOps.sketch(ds.repartition(2))
    val b = CmsSketchOps.sketch(ds.repartition(13))
    assert(java.util.Arrays.equals(a, b),
      "additive counters must be merge-order free")
  }

  test("exact regime: sparse keys vs wide table estimate exactly") {
    val keys = Seq.tabulate(10000)(i => (i % 100).toLong)
    val sk = CmsSketchOps.sketch(spark.createDataset(keys).repartition(6))
    (0L until 100L).foreach { k =>
      assert(CmsSketchOps.estimate(sk, k) == 100L, s"key $k")
    }
    assert(CmsSketchOps.totalCount(sk) == 10000L)
  }

  test("past capacity: never undercounts, overcount within 2N/width") {
    // 5k distinct keys forced through a width-64 table: collisions in
    // every row, so estimates exceed truth — but never fall below it,
    // and the classic eps*N bound (eps = 2/width) holds for the probes
    val n = 20000
    val keys = Seq.tabulate(n)(i => (i % 5000).toLong)
    val sk = CmsSketchOps.sketch(
      spark.createDataset(keys).repartition(4), depth = 5, width = 64)
    val truth = 4L // 20000 / 5000
    val bound = truth + 2L * n / 64
    (0L until 50L).foreach { k =>
      val est = CmsSketchOps.estimate(sk, k)
      assert(est >= truth, s"CMS must never undercount (key $k: $est)")
      assert(est <= bound, s"overcount bound blown (key $k: $est > $bound)")
    }
  }
}
