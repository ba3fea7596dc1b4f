package graft

import graft.analysis.C4Rules
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C4 rule semantics on crafted pages (the published thresholds as API
  * defaults, line retention rule-by-rule, page gates). The corpus-level
  * hash gate against DuckDB is `c4_rules`. */
class C4RulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("published thresholds are the API defaults") {
    assert(C4Rules.MinWordsPerLine == 5L)
    assert(C4Rules.MinSentences == 3L)
  }

  private def keptLines(page: String): Seq[String] = {
    val df = Seq(page).toDF("text")
      .select(C4Rules.retained(col("text")).as("r"))
    val r = df.head().getString(0)
    if (r.isEmpty) Seq.empty else r.split("\n").toSeq
  }

  test("line retention: terminal punctuation, word floor, javascript") {
    val page = Seq(
      "This sentence ends with a period and stays.",
      "Does this question with six words stay?",
      "He said \"it works well enough.\"",   // end-quote after period stays
      "A headline with no punctuation",       // dropped: no terminal punct
      "Too short here.",                      // dropped: 3 words < 5
      "Please enable JavaScript to continue.", // dropped: javascript
      "Final line has five words total.").mkString("\n")
    assert(keptLines(page) == Seq(
      "This sentence ends with a period and stays.",
      "Does this question with six words stay?",
      "He said \"it works well enough.\"",
      "Final line has five words total."))
  }

  private def flagMap(page: String): Map[String, Boolean] = {
    val fs = C4Rules.flags(col("text"), Seq("badword1"))
    val row = Seq(page).toDF("text")
      .select(fs.map { case (n, c) => c.as(n) }: _*).head()
    fs.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }
      .toMap
  }

  test("page gates: sentence floor, lorem ipsum, brace, badwords") {
    val clean = Seq(
      "The first sentence is long enough to stay.",
      "The second sentence also clears every line rule.",
      "The third sentence completes the page floor.").mkString("\n")
    assert(flagMap(clean).values.forall(identity))
    // two retained sentences only -> sentence floor fails
    val short = Seq(
      "The first sentence is long enough to stay.",
      "The second sentence also clears every line rule.").mkString("\n")
    assert(flagMap(short) == Map("sentences_ok" -> false,
      "lorem_ok" -> true, "brace_ok" -> true, "badwords_ok" -> true))
    // page-level gates fire on RAW text even when the line is dropped
    assert(!flagMap(clean + "\nlorem ipsum dolor")("lorem_ok"))
    assert(!flagMap(clean + "\nvar x = {")("brace_ok"))
    assert(!flagMap(clean + "\nBADWORD1 appears")("badwords_ok"))
  }

  test("badword match is whole-token, not substring") {
    val page = Seq(
      "The word badword1ish is not an exact token match.",
      "The second sentence also clears every line rule.",
      "The third sentence completes the page floor.").mkString("\n")
    assert(flagMap(page)("badwords_ok"))
  }
}
