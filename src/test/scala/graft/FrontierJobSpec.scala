package graft

import java.nio.file.Files

import graft.streaming.FrontierJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming frontier evolves across batches: links from fetched
  * pages become pending work exactly once (first discovery wins),
  * already-crawled and already-discovered URLs never re-enter,
  * multi-host pages resolve against their OWN origin, redelivery is a
  * no-op, and the politeness budget caps per-host fetches. */
class FrontierJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def land(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "url", "html")
      .coalesce(1).write.mode("append").parquet(dir)

  private def a(href: String) = s"""<a href="$href">x</a>"""

  test("frontier evolution, multi-host resolution, replay no-op") {
    val base = Files.createTempDirectory("frontier").toString
    val in = s"$base/in"; val store = s"$base/store"
    def drain() = FrontierJob.runOnce(spark, in, store, s"$base/ckpt")

    // batch 1: two pages on two hosts; links include a same-batch
    // duplicate target (b/x from both pages), a self-link, and an
    // out-of-scope asset
    land(in, Seq(
      (1L, "https://a.example/p1",
        s"<p>${a("/p2")} ${a("/p3")} ${a("https://b.example/x")} " +
          s"${a("/logo.png")} ${a("/p1")}</p>"),
      (2L, "https://b.example/home",
        s"<p>${a("/x")} ${a("/y")}</p>")))
    val s1 = drain()
    assert(s1.arrived == 2 && s1.skippedRedelivered == 0, s"b1: $s1")
    assert(s1.linksExtracted == 7, s"b1: $s1")
    assert(s1.outOfScope == 1, s"b1: $s1") // the .png
    // 6 in-scope links -> 4 new URLs (b/x collapsed, /p1 is own page)
    assert(s1.discovered == 4 && s1.alreadyKnown == 2, s"b1: $s1")

    val f1 = spark.read.parquet(s"$store/frontier")
      .as[(String, Long)].collect().toMap
    assert(f1 == Map(
      "https://a.example/p2" -> 1L,
      "https://a.example/p3" -> 1L,
      "https://b.example/x" -> 1L, // min src: page 1's absolute link
      "https://b.example/y" -> 2L), s"frontier: $f1")

    // batch 2: a frontier URL gets fetched; its links resolve against
    // b.example (its own origin), and only /z is genuinely new
    land(in, Seq(
      (3L, "https://b.example/x",
        s"<p>${a("/z")} ${a("https://a.example/p2")} ${a("/home")}</p>")))
    val s2 = drain()
    assert(s2.discovered == 1 && s2.alreadyKnown == 2, s"b2: $s2")

    // pending = frontier minus crawled: b/x was just crawled
    val pending = FrontierJob.pending(spark, store)
      .select("norm_url").as[String].collect().toSet
    assert(pending == Set(
      "https://a.example/p2", "https://a.example/p3",
      "https://b.example/y", "https://b.example/z"), s"pending: $pending")

    // politeness: one fetch per host, deterministic (src_doc, url)
    val budget = FrontierJob.pendingBudget(spark, store, perHost = 1)
      .select("norm_url").as[String].collect().toSet
    assert(budget == Set(
      "https://a.example/p2", "https://b.example/y"), s"budget: $budget")

    // replay: same doc_ids under a fresh checkpoint — crawled skip
    // makes the whole drain a no-op
    land(in, Seq(
      (1L, "https://a.example/p1", s"<p>${a("/p2")}</p>"),
      (3L, "https://b.example/x", s"<p>${a("/z")}</p>")))
    val s3 = FrontierJob.runOnce(spark, in, store, s"$base/ckpt2")
    assert(s3.skippedRedelivered >= 2 && s3.discovered == 0, s"replay: $s3")
    val f2 = spark.read.parquet(s"$store/frontier").count()
    assert(f2 == 5L, s"frontier rows after replay: $f2")
  }
}
