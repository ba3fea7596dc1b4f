package graft

import java.nio.file.Files

import graft.streaming.CrawlIngestJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming crawl funnel evolves state across batches: URL
  * winners persist (a later variant of a won page is rejected),
  * domain reputation accumulates and sticks, admission coins are
  * deterministic, and a replay of already-archived doc_ids is a
  * no-op. */
class CrawlIngestJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val noisy =
    "spam page !!!*** ### %%% @@@ $$$ ^^^ &&& ((( ))) ??? !!!***"
  private val clean =
    "a perfectly reasonable sentence about the weather today"

  private def land(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "url", "text")
      .coalesce(1).write.mode("append").parquet(dir)

  test("three-batch evolution: scope, URL index, domain reputation") {
    val base = Files.createTempDirectory("crawl").toString
    val in = s"$base/in"; val store = s"$base/store"
    val ckpt = s"$base/ckpt"
    def drain() = CrawlIngestJob.runOnce(spark, in, store, ckpt,
      sampleRatePpm = Some(1000000L)) // always-pass coin: isolate gates

    // batch 1: a clean page, its tracking-param duplicate (same batch,
    // same norm URL -> one winner), an out-of-scope binary asset, and
    // the farm's first (clean) page
    land(in, Seq(
      (1L, "https://good.example/docs/1", clean),
      (2L, "https://good.example/docs/1?utm_source=x", clean),
      (3L, "https://good.example/assets/logo.png", clean),
      (4L, "https://farm.example/docs/4", clean)))
    val s1 = drain()
    assert(s1.arrived == 4 && s1.skippedRedelivered == 0, s"b1: $s1")
    assert(s1.outOfScope == 1, s"b1: $s1") // the .png
    assert(s1.urlDupRejected == 1, s"b1: $s1") // the utm variant
    assert(s1.domainRejected == 0 && s1.admitted == 2, s"b1: $s1")

    // batch 2: ANOTHER variant of the page won in b1 (persisted index
    // rejects it — cross-batch URL dedup), plus the farm's noisy wave
    // (cumulative stats cross the ceiling: the unmasking batch drops)
    land(in, Seq(
      (10L, "https://good.example/docs/1?utm_medium=y", clean),
      (11L, "https://farm.example/docs/11", noisy),
      (12L, "https://farm.example/docs/12", noisy),
      (13L, "https://good.example/docs/13", clean)))
    val s2 = drain()
    assert(s2.urlDupRejected == 1, s"b2: $s2") // doc 10 vs the index
    assert(s2.domainRejected == 2, s"b2: $s2") // the noisy wave
    assert(s2.admitted == 1, s"b2: $s2") // doc 13

    // batch 3: a CLEAN page from the condemned farm still drops
    // (reputation sticks to the domain), good domain admits
    land(in, Seq(
      (20L, "https://farm.example/docs/20", clean),
      (21L, "https://good.example/docs/21", clean)))
    val s3 = drain()
    assert(s3.domainRejected == 1 && s3.admitted == 1, s"b3: $s3")

    val corpus = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus.toSeq == Seq(1L, 4L, 13L, 21L), s"corpus: ${corpus.toSeq}")

    // replay shape: same doc_ids as a "new" file under a FRESH
    // checkpoint — archive skip makes it a no-op
    land(in, Seq(
      (1L, "https://good.example/docs/1", clean),
      (20L, "https://farm.example/docs/20", clean)))
    val s4 = CrawlIngestJob.runOnce(spark, in, store, s"$base/ckpt2",
      sampleRatePpm = Some(1000000L))
    assert(s4.skippedRedelivered >= 2, s"replay: $s4")
    assert(s4.admitted == 0, s"replay: $s4")
    val corpus2 = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus2.toSeq == Seq(1L, 4L, 13L, 21L), "corpus unchanged")
  }

  test("admission coin is deterministic and rate-bounded") {
    val base = Files.createTempDirectory("crawl-coin").toString
    val in = s"$base/in"; val store = s"$base/store"
    // rate 0: everything that reaches the coin is sampled OUT
    land(in, (0 until 20).map(i =>
      (100L + i, s"https://ok.example/docs/${100 + i}", clean)))
    val s1 = CrawlIngestJob.runOnce(spark, in, store, s"$base/ckpt",
      sampleRatePpm = Some(0L))
    assert(s1.admitted == 0 && s1.sampledOut == 20, s"rate0: $s1")
    // the archive still recorded every decision (idempotence holds
    // even for sampled-out docs: they are not re-flipped on replay)
    land(in, (0 until 20).map(i =>
      (100L + i, s"https://ok.example/docs/${100 + i}", clean)))
    val s2 = CrawlIngestJob.runOnce(spark, in, store, s"$base/ckpt2",
      sampleRatePpm = Some(1000000L)) // rate change cannot resurrect
    // fresh checkpoint re-reads BOTH landed files (40 rows), and every
    // one is archive-skipped — no coin is ever re-flipped
    assert(s2.skippedRedelivered == 40 && s2.admitted == 0, s"replay: $s2")
  }
}
