package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r11 redesign of `lsh_recall_eval`'s ground-truth side: the
  * df-capped exact generator at [[Dedup.defaultDfCap]] must reproduce
  * the UNCAPPED inverted-index truth on the gate corpus (the cap's
  * floor keeps it slack there — the documented contract the oracle
  * hash-check then rides), and the one-sided-miss semantics must hold
  * when the cap is made to bind. */
class LshRecallCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("capped truth == uncapped truth on the gate corpus") {
    val th = Dedup.JaccardThreshold
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", th)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Dedup.docShingleSets(docs, "doc_id", "text").localCheckpoint()
    val cap = Dedup.defaultDfCap(sets.count())
    val capped = Dedup.ngramJaccardPairsCapped(docs, "doc_id", "text", cap, th)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.nonEmpty, "gate corpus must exercise the truth side")
    assert(capped == uncapped,
      s"cap=$cap must be slack on the gate corpus: " +
        s"missing=${(uncapped -- capped).take(5)} extra=${(capped -- uncapped).take(5)}")
  }

  test("recall eval emits one exact-integer row with full-range ppm fields") {
    val row = Dedup.lshRecallEval(docs, "doc_id", "text").collect()
    assert(row.length == 1)
    val r = row.head
    val nTruth = r.getAs[Long]("n_truth")
    val nCand = r.getAs[Long]("n_cand")
    val nFound = r.getAs[Long]("n_found")
    assert(nTruth > 0 && nCand > 0 && nFound <= math.min(nTruth, nCand))
    assert(r.getAs[Long]("recall_ppm") == nFound * 1000000L / nTruth)
    assert(r.getAs[Long]("cand_precision_ppm") == nFound * 1000000L / nCand)
  }
}
