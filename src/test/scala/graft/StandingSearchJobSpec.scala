package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.relational.TrainingDataQueries
import graft.search.HybridSearch
import graft.streaming.StandingSearchJob

/** The standing-query hybrid-search stream: per-batch index evolution
  * must converge on the batch `search_rrf_hybrid` EXACTLY after every
  * drain, redelivery must be a no-op, and crash-orphan postings must
  * stay invisible until their doc commits to the lens. */
class StandingSearchJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dir = "/root/testdata/sf0.001"
  private val Terms = TrainingDataQueries.Bm25Terms

  private lazy val docsAll =
    spark.read.parquet(s"$Dir/documents.parquet").select("doc_id", "text")
  private lazy val embAll =
    spark.read.parquet(s"$Dir/embeddings.parquet")

  private def joined(mod: Int): DataFrame =
    docsAll.filter(col("doc_id") % 3 === mod)
      .join(embAll.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"),
        col("embedding").cast("array<double>").as("embedding"))

  private def fused(df: DataFrame): Seq[(Long, Any, Any, Long)] =
    df.collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.getLong(3)))
      .toSeq

  private def batchExpected(mods: Seq[Int]): Seq[(Long, Any, Any, Long)] = {
    val d = docsAll.filter((col("doc_id") % 3).isin(mods.map(Integer.valueOf): _*))
    val e = embAll.join(
      d.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    fused(HybridSearch.rrf(d, e, Terms))
  }

  test("three-batch evolution converges on the batch fusion each drain") {
    val base = Files.createTempDirectory("standing").toString
    val in = s"$base/in"; val store = s"$base/store"
    for ((mod, i) <- Seq(0, 1, 2).zipWithIndex) {
      joined(mod).coalesce(1).write.mode("append").parquet(in)
      val s = StandingSearchJob.runOnce(spark, in, store,
        s"$base/ckpt", Terms)
      assert(s.skippedRedelivered == 0 && s.indexed == s.arrived,
        s"drain $i: $s")
      val got = fused(StandingSearchJob.results(spark, store))
      val want = batchExpected((0 to i).map(identity))
      assert(got == want,
        s"drain $i diverged from batch fusion:\ngot  $got\nwant $want")
    }
    // replay: a fresh checkpoint re-reads every file; state must skip
    // all of it and the standing result must not move
    val before = fused(StandingSearchJob.results(spark, store))
    val s = StandingSearchJob.runOnce(spark, in, store,
      s"$base/ckpt2", Terms)
    assert(s.skippedRedelivered == s.arrived && s.indexed == 0,
      s"replay must be a no-op: $s")
    assert(fused(StandingSearchJob.results(spark, store)) == before)
  }

  test("crash-orphan postings are invisible; duplicate postings collapse") {
    import spark.implicits._
    val base = Files.createTempDirectory("standing-orphan").toString
    val in = s"$base/in"; val store = s"$base/store"
    joined(0).coalesce(1).write.parquet(in)
    StandingSearchJob.runOnce(spark, in, store, s"$base/ckpt", Terms)
    val before = fused(StandingSearchJob.results(spark, store))
    // crash window: postings landed but the lens append never did —
    // doc 999999 must not influence scores or corpus stats
    Seq((999999L, 50L, Terms.head, 40L))
      .toDF("doc_id", "dl", "term", "tf")
      .write.mode("append").parquet(s"$store/tfs")
    Seq((999999L, Seq.fill(8)(0.5d)))
      .toDF("doc_id", "v")
      .write.mode("append").parquet(s"$store/emb")
    assert(fused(StandingSearchJob.results(spark, store)) == before,
      "orphan postings leaked into the standing result")
    // redelivery after the crash recomputes identical postings rows;
    // the exact-key collapse keeps them single-counted
    val tfsDup = spark.read.parquet(s"$store/tfs")
      .filter(col("doc_id") =!= 999999L).limit(1)
    tfsDup.write.mode("append").parquet(s"$store/tfs")
    assert(fused(StandingSearchJob.results(spark, store)) == before,
      "duplicate posting double-counted")
  }
}
