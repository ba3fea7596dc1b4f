package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — the sketches a 100 TB engine reaches for
  * when exact answers cost a full shuffle of distinct values. These are
  * approximate by design, so they're bounded-error spec checks, not
  * hash-matched oracle queries. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val li =
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct lands within the configured rsd") {
    val exact = li.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .collect()(0).getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"HLL err $err (exact=$exact approx=$approx)")
  }

  test("percentile_approx brackets the exact percentile") {
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .collect()(0).getDouble(0)
    val approx = li.select(
        expr("percentile_approx(l_extendedprice, 0.5, 1000)"))
      .collect()(0).getDouble(0)
    // with accuracy=1000 the rank error is ~0.1% -> value error small on
    // a smooth distribution
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median $approx vs exact $exact")
  }

  test("count_min_sketch estimates hot-key frequencies within tolerance") {
    val cms = li.stat.countMinSketch(col("l_suppkey"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val exact = li.groupBy(col("l_suppkey")).count()
      .orderBy(col("count").desc).limit(5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = li.count()
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, "CMS never underestimates")
      assert(est <= c + (0.001 * n).toLong + 1,
        s"CMS overshoot for key $k: est=$est exact=$c")
    }
  }

  test("HLL datasketches union is partition-independent (mergeability)") {
    // the algebraic property that lets sketches work as partial
    // aggregates at 100 TB: union register state is the item-wise max,
    // independent of how rows were split — two different groupings must
    // union to BIT-EQUAL estimates. (Union-vs-direct is NOT the claim:
    // the direct sketch answers with HIP, which a union invalidates.)
    def unionEst(subKey: org.apache.spark.sql.Column) =
      li.groupBy(col("l_returnflag"), subKey.as("__sub"))
        .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
        .groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
    val a = unionEst(col("l_linestatus"))
    val b = unionEst(col("l_suppkey") % 7)
    val joined = a.join(b.withColumnRenamed("e", "e2"),
      Seq("l_returnflag")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getLong(1) == r.getLong(2),
        s"partitioning changed the union estimate for ${r.getString(0)}"))
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val bf = li.stat.bloomFilter(col("l_orderkey"), expectedNumItems = 20000,
      fpp = 0.01)
    val present = li.select(col("l_orderkey")).distinct()
      .limit(1000).collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain), "bloom filters cannot miss")
    val absent = (1 to 10000).map(i => 1000000000L + i)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.03, s"false-positive rate $fp far above configured 0.01")
  }
}
