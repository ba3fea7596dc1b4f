package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IvfPq, KMeans}

/** IVFADC re-rank + recall-eval structural properties (the value-level
  * proofs are the ann_topk_ivfpq_rerank / ann_recall_eval oracles):
  * the re-ranked top-k is contained in the ADC shortlist, its
  * distances are the EXACT integer distances, and exact re-ranking
  * never loses recall against pure ADC at the same k. */
class IvfPqRerankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dir = "/root/testdata/sf0.001"
  private val NQ = 5
  private val K = 5
  private val R = 15

  private lazy val emb = spark.read.parquet(s"$Dir/embeddings.parquet")

  test("re-ranked top-k is a subset of the ADC shortlist") {
    val short = IvfPq.topK(emb, NQ, R)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer = IvfPq.topKRerank(emb, NQ, K, R)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rer.nonEmpty)
    assert(rer.forall(short.contains))
  }

  test("re-rank distances are the exact integer L2 distances") {
    val q = KMeans.quantized(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rer = IvfPq.topKRerank(emb, NQ, K, R).collect()
    assert(rer.nonEmpty)
    rer.foreach { r =>
      val (qid, cid, dist) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val want = q(qid).zip(q(cid))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(dist === want, s"qid=$qid cid=$cid")
    }
  }

  test("exact re-ranking never loses recall vs pure ADC at the same k") {
    def hits(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]) =
      exact.map { case (qid, ids) =>
        qid -> approx.getOrElse(qid, Set.empty).intersect(ids).size
      }
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    // exact ground truth via the recall evaluator's own oracle-proven
    // ranking: rerank with shortlist = corpus is exact, but cheaper is
    // reusing recallEval on both rankings' hit counts
    val exact = topSet(IvfPq.topKRerank(emb, NQ, K, 1000000))
    val adc = hits(topSet(IvfPq.topK(emb, NQ, K)), exact)
    val rer = hits(topSet(IvfPq.topKRerank(emb, NQ, K, R)), exact)
    assert(exact.nonEmpty)
    exact.keys.foreach { qid =>
      assert(rer(qid) >= adc(qid), s"qid=$qid")
    }
  }

  test("recallEval lands on the exact ppm grid with hits in [0, k]") {
    val rows = IvfPq.recallEval(emb, NQ, K).collect()
    assert(rows.length === NQ)
    rows.foreach { r =>
      val (hits, ppm) = (r.getLong(1), r.getLong(2))
      assert(hits >= 0 && hits <= K)
      assert(ppm === hits * (1000000L / K))
    }
  }

  test("non-default geometry: corpus-wide shortlist is exact at any " +
      "shape; defaults reproduce the constants; bad shapes refuse") {
    // a rerank whose probes cover every list and whose shortlist
    // covers the corpus is the exact ranking whatever the codes looked
    // like — so any two geometries must agree there (the structural
    // proof that Geom changes the approximation, never the ranking
    // contract)
    val g = IvfPq.Geom(segments = 2, codes = 8, nProbe = 8)
    val a = IvfPq.topKRerank(emb, NQ, K, 1000000, g)
    val b = IvfPq.topKRerank(emb, NQ, K, 1000000, IvfPq.Geom(nProbe = 8))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // the default Geom IS the constant geometry, value for value
    val viaGeom = IvfPq.topK(emb, NQ, K, IvfPq.Geom())
    val viaConsts = IvfPq.topK(emb, NQ, K)
    assert(viaGeom.except(viaConsts).isEmpty &&
      viaConsts.except(viaGeom).isEmpty)
    // non-default ADC output is well-formed: dense ranks per query
    val adc = IvfPq.topK(emb, NQ, K, g)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    adc.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // a geometry the dimension cannot host refuses at construction
    val ex = intercept[IllegalArgumentException] {
      IvfPq.Geom(segments = 3)
    }
    assert(ex.getMessage.contains("divide into 3"))
  }

  test("filtered re-rank is dense within the allowlist; full list = unfiltered") {
    val allowed = emb.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val got = IvfPq.topKRerankAmong(emb, NQ, K, R, allowed)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, cid) => cid % 2 == 0 },
      "only allowlisted ids may appear")
    // ranks dense 1..k within the filtered set, not holes
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // an everything-allowlist reproduces the unfiltered re-rank exactly
    val all = IvfPq.topKRerankAmong(emb, NQ, K, R,
      emb.select(col("vec_id")))
    val plain = IvfPq.topKRerank(emb, NQ, K, R)
    assert(all.except(plain).isEmpty && plain.except(all).isEmpty)
  }
}
