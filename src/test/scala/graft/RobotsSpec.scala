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
