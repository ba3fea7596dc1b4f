package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Sitemap

/** Sitemap grammar edges beyond the oracle fixture: entity-decoded
  * locs, optional-field NULLs, priority's exact per-mille grid,
  * loc-less blocks, whitespace/newlines inside tags, the W3C-datetime
  * lastmod date prefix, index recursion, and the cross-host guard. */
class SitemapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def entriesOf(xml: String): Seq[(String, Date, String, Any)] =
    Seq(xml).toDF("xml")
      .select(explode(Sitemap.entries(col("xml"))).as("e"))
      .select("e.loc", "e.lastmod", "e.changefreq", "e.priority_pm")
      .collect().toSeq
      .map(r => (r.getString(0), r.getDate(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3)))

  test("full entry parses; lastmod keeps the W3C datetime's date") {
    assert(entriesOf(
      "<urlset><url><loc>https://h.example/a</loc>" +
        "<lastmod>2024-03-05T08:30:00+00:00</lastmod>" +
        "<changefreq>weekly</changefreq>" +
        "<priority>0.8</priority></url></urlset>") ===
      Seq(("https://h.example/a", Date.valueOf("2024-03-05"),
        "weekly", 800L)))
  }

  test("optional fields absent parse to NULL") {
    assert(entriesOf(
      "<urlset><url><loc>https://h.example/b</loc></url></urlset>") ===
      Seq(("https://h.example/b", null, null, null)))
  }

  test("locs entity-decode; double-escaped stays single-escaped") {
    assert(entriesOf(
      "<urlset><url><loc>https://h.example/p?a=1&amp;b=2</loc>" +
        "</url></urlset>").head._1 === "https://h.example/p?a=1&b=2")
    assert(entriesOf(
      "<urlset><url><loc>https://h.example/&amp;lt;x</loc>" +
        "</url></urlset>").head._1 === "https://h.example/&lt;x")
  }

  test("priority grid is exact: 1 and 1.0 -> 1000, 0.85 -> 850") {
    def pm(p: String) = entriesOf(
      s"<urlset><url><loc>https://h/x</loc><priority>$p</priority>" +
        "</url></urlset>").head._4
    assert(pm("1") === 1000L)
    assert(pm("1.0") === 1000L)
    assert(pm("0.85") === 850L)
    assert(pm("0.5") === 500L)
  }

  test("a url block without loc yields the empty loc (caller filters)") {
    assert(entriesOf(
      "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>")
      .head._1 === "")
  }

  test("whitespace and newlines inside tags are tolerated") {
    assert(entriesOf(
      "<urlset>\n <url>\n  <loc>\n   https://h.example/c\n  </loc>\n" +
        "  <priority> 0.3 </priority>\n </url>\n</urlset>") ===
      Seq(("https://h.example/c", null, null, 300L)))
  }

  test("index documents list sub-sitemap locs in order, decoded") {
    val locs = Seq(
      "<sitemapindex><sitemap><loc>https://h/s1.xml</loc></sitemap>" +
        "<sitemap><loc>https://h/s2.xml?a=1&amp;b=2</loc></sitemap>" +
        "</sitemapindex>").toDF("xml")
      .select(Sitemap.indexLocs(col("xml")).as("l"))
      .collect().head.getSeq[String](0)
    assert(locs === Seq("https://h/s1.xml", "https://h/s2.xml?a=1&b=2"))
  }

  test("cross-host guard: only the sitemap's own host passes") {
    val df = Seq(
      ("https://h.example/ok", "h.example"),
      ("https://evil.example/x", "h.example"),
      ("http://h.example:8080/p", "h.example"))
      .toDF("loc", "host")
      .filter(Sitemap.sameHost(col("loc"), col("host")))
    // the :8080 authority differs from the bare host — dropped too
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("https://h.example/ok"))
  }
}
