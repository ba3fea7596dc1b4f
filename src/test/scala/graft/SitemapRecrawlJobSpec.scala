package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SitemapRecrawlJob

/** Sitemap-recrawl evolution across drains: new-URL seeding, lastmod
  * advance detection, null-lastmod conservatism, monotone state, and
  * the replay no-op through the (url, lastmod) task key. */
class SitemapRecrawlJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sm(entries: (String, Option[String], Option[String])*)
      : String =
    "<urlset>" + entries.map { case (loc, lm, pr) =>
      "<url><loc>" + loc + "</loc>" +
        lm.map(d => s"<lastmod>$d</lastmod>").getOrElse("") +
        pr.map(p => s"<priority>$p</priority>").getOrElse("") +
        "</url>"
    }.mkString + "</urlset>"

  private def writeBatch(dir: String, rows: (String, String, String)*)
      : Unit =
    rows.toSeq.toDF("host", "sm_url", "xml")
      .coalesce(1).write.mode("append").parquet(dir)

  private def taskSet(store: String): Set[(String, String, String)] =
    SitemapRecrawlJob.tasks(spark, store)
      .collect().map(r => (r.getString(0),
        Option(r.getDate(1)).map(_.toString).getOrElse("-"),
        r.getString(2))).toSet

  test("three-drain evolution: new, updated, unchanged, null-lastmod") {
    val base = Files.createTempDirectory("smrecrawl").toString
    val (in, store, ckpt) = (s"$base/in", s"$base/store", s"$base/ckpt")

    // drain 1: two URLs with lastmod, one without, one cross-host
    writeBatch(in, ("h.example", "https://h.example/sitemap.xml", sm(
      ("https://h.example/a", Some("2024-01-10"), Some("0.8")),
      ("https://h.example/b", Some("2024-01-10"), None),
      ("https://h.example/c", None, None),
      ("https://evil.example/x", Some("2024-01-10"), None))))
    val s1 = SitemapRecrawlJob.runOnce(spark, in, store, ckpt)
    assert(s1.newUrls === 3 && s1.updated === 0)
    assert(s1.droppedGuards === 1) // the cross-host entry
    assert(taskSet(store) === Set(
      ("https://h.example/a", "2024-01-10", "new"),
      ("https://h.example/b", "2024-01-10", "new"),
      ("https://h.example/c", "-", "new")))

    // drain 2: a advances (-> updated), b same (silent), c still
    // null (silent — the sitemap proves nothing), d appears (new)
    writeBatch(in, ("h.example", "https://h.example/sitemap.xml", sm(
      ("https://h.example/a", Some("2024-02-01"), Some("1.0")),
      ("https://h.example/b", Some("2024-01-10"), None),
      ("https://h.example/c", None, None),
      ("https://h.example/d", Some("2024-02-01"), None))))
    val s2 = SitemapRecrawlJob.runOnce(spark, in, store, s"$base/ckpt2")
    assert(s2.newUrls === 1 && s2.updated === 1 && s2.unchanged === 2)
    assert(taskSet(store).contains(
      ("https://h.example/a", "2024-02-01", "updated")))
    assert(taskSet(store).contains(
      ("https://h.example/d", "2024-02-01", "new")))

    // drain 3: an OLDER lastmod for a must NOT regress (monotone
    // state), same snapshot otherwise -> zero emissions
    writeBatch(in, ("h.example", "https://h.example/sitemap.xml", sm(
      ("https://h.example/a", Some("2024-01-15"), None),
      ("https://h.example/b", Some("2024-01-10"), None))))
    val before = taskSet(store)
    val s3 = SitemapRecrawlJob.runOnce(spark, in, store, s"$base/ckpt3")
    assert(s3.newUrls === 0 && s3.updated === 0)
    assert(taskSet(store) === before)
  }

  test("replay of the same input is a task no-op (key dedup)") {
    val base = Files.createTempDirectory("smreplay").toString
    val (in, store) = (s"$base/in", s"$base/store")
    writeBatch(in, ("h.example", "https://h.example/sitemap.xml", sm(
      ("https://h.example/a", Some("2024-03-01"), Some("0.5")))))
    SitemapRecrawlJob.runOnce(spark, in, store, s"$base/ckpt1")
    val first = taskSet(store)
    // fresh checkpoint = full redelivery of the same snapshot files
    SitemapRecrawlJob.runOnce(spark, in, store, s"$base/ckpt2")
    assert(taskSet(store) === first)
    assert(SitemapRecrawlJob.tasks(spark, store).count() === 1L)
  }

  test("same-batch duplicates collapse; ordering uses protocol default") {
    val base = Files.createTempDirectory("smdup").toString
    val (in, store) = (s"$base/in", s"$base/store")
    // two sitemaps of one host list the same URL with different
    // lastmod/priority — freshest lastmod wins, one task emitted
    writeBatch(in,
      ("h.example", "https://h.example/s1.xml", sm(
        ("https://h.example/a", Some("2024-01-01"), Some("0.2")),
        ("https://h.example/z", None, Some("0.9")))),
      ("h.example", "https://h.example/s2.xml", sm(
        ("https://h.example/a", Some("2024-01-05"), Some("0.4")))))
    SitemapRecrawlJob.runOnce(spark, in, store, s"$base/ckpt")
    val tasks = SitemapRecrawlJob.orderedTasks(spark, store)
      .collect().map(r => (r.getString(0), r.getLong(4))).toSeq
    // z (900pm) before a (400pm); a carries the freshest lastmod
    assert(tasks.map(_._1) ===
      Seq("https://h.example/z", "https://h.example/a"))
    assert(taskSet(store).contains(
      ("https://h.example/a", "2024-01-05", "new")))
  }
}
