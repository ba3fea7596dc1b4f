package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Robots

/** robots.txt edge grammar beyond the oracle fixture: directive and
  * agent-name case-insensitivity, mid-line comments, whitespace
  * tolerance, and rules preceding any User-agent line (dropped). */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def rulesOf(lines: String*): Seq[(String, String, String)] =
    Robots.rules(Seq(("h.example", lines.mkString("\n"))).toDF(
        "host", "robots"))
      .orderBy(col("line_no"))
      .select("ua", "rule", "prefix")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("directives and agent names match case-insensitively") {
    assert(rulesOf(
      "USER-AGENT: GraftBot",
      "DISALLOW: /a",
      "allow: /a/b") ===
      Seq(("graftbot", "disallow", "/a"), ("graftbot", "allow", "/a/b")))
  }

  test("mid-line comments strip; surrounding whitespace tolerated") {
    assert(rulesOf(
      "  User-agent :  *   # our bot group",
      "\tDisallow:\t/x\t# keep out") ===
      Seq(("*", "disallow", "/x")))
  }

  test("rules before any User-agent line are dropped") {
    assert(rulesOf(
      "Disallow: /orphan",
      "User-agent: *",
      "Disallow: /real") ===
      Seq(("*", "disallow", "/real")))
  }

  test("agent group fully suppresses the * group") {
    assert(rulesOf(
      "User-agent: *",
      "Disallow: /",
      "User-agent: graftbot",
      "Disallow: /only-this") ===
      Seq(("graftbot", "disallow", "/only-this")))
  }

  test("crawl-delay: governing group, last numeric line, junk drops") {
    def delayOf(hostLines: (String, Seq[String])*): Map[String, Long] =
      Robots.delays(hostLines.toSeq
          .map { case (h, ls) => (h, ls.mkString("\n")) }
          .toDF("host", "robots"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = delayOf(
      // agent group (2) overrides the * group (10)
      "a.x" -> Seq("User-agent: graftbot", "Crawl-delay: 2",
        "User-agent: *", "Crawl-delay: 10"),
      // junk value drops; LAST numeric line of the group wins
      "b.x" -> Seq("User-agent: *", "Crawl-delay: soon",
        "Crawl-delay: 3", "Crawl-delay: 7"),
      // no delay declared -> absent from the relation
      "c.x" -> Seq("User-agent: *", "Disallow: /tmp/"),
      // a delay before any User-agent line is unattributed -> drops
      "d.x" -> Seq("Crawl-delay: 9"))
    assert(d === Map("a.x" -> 2L, "b.x" -> 7L))
  }

  test("fetchPlan: per-host slots offset by delay, default elsewhere") {
    val plan = Robots.fetchPlan(
        Seq(("https://a.x/1", 1L), ("https://a.x/2", 2L),
          ("https://z.x/1", 3L)).toDF("norm_url", "src_doc"),
        Robots.delays(Seq(("a.x", "User-agent: *\nCrawl-delay: 4"))
          .toDF("host", "robots")),
        defaultDelayMs = 250L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(plan === Set(
      ("https://a.x/1", 1L, 0L), ("https://a.x/2", 2L, 4000L),
      ("https://z.x/1", 1L, 0L)))
  }

  test("gate: no-rules host allows everything, with null match") {
    val out = Robots.gate(
        Seq("https://nowhere.example/x").toDF("url"),
        Robots.rules(Seq(("h.example", "User-agent: *\nDisallow: /"))
          .toDF("host", "robots")))
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Boolean]("allowed"))
    assert(out(0).isNullAt(out(0).fieldIndex("matched")))
  }
}
