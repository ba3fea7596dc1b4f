package graft

import graft.analysis.GopherRules
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Each Gopher rule fires on a crafted violator and passes on a clean
  * document. The hash gate against DuckDB is `gopher_rules`. */
class GopherRulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def flagsOf(text: String): Map[String, Boolean] = {
    val df = Seq(text).toDF("text")
    val fs = GopherRules.flags(org.apache.spark.sql.functions.col("text"))
    val row = df.select(fs.map { case (n, c) => c.as(n) }: _*).head()
    fs.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  // clean: >50 words (the paper's floor) of sane length, stopwords
  // present, no symbols
  private val clean = ("the quick brown fox jumps over the lazy dog " +
    "and runs to town with that same old friend every single " +
    "morning before anyone else wakes up properly and then they " +
    "walk back along the river while other people start their day " +
    "and the town slowly fills with noise from shops that open " +
    "early for trade").trim

  test("a clean document passes every rule") {
    val f = flagsOf(clean)
    assert(f.values.forall(identity), s"failed flags: ${f.filterNot(_._2)}")
  }

  test("word-count floor") {
    assert(!flagsOf("too few words here")("wc_ok"))
    assert(flagsOf(clean)("wc_ok"))
  }

  test("the default floor is the paper's published 50") {
    assert(GopherRules.MinWords == 50L)
    // 27 words: below the published floor, above a fixture override
    val short = ("the quick brown fox jumps over the lazy dog and " +
      "runs to town with that same old friend every single morning " +
      "before anyone else wakes up properly").trim
    val df = Seq(short).toDF("text")
    import org.apache.spark.sql.functions.col
    def wcOk(minWords: Long): Boolean = {
      val fs = GopherRules.flags(col("text"), minWords)
      val row = df.select(fs.map { case (n, c) => c.as(n) }: _*).head()
      row.getBoolean(fs.indexWhere(_._1 == "wc_ok"))
    }
    assert(!wcOk(GopherRules.MinWords)) // paper default gates it
    assert(wcOk(20L))                   // fixture-scaled override passes
  }

  test("mean word length bounds") {
    val shouty = Seq.fill(30)("supercalifragilistic").mkString(" ")
    assert(!flagsOf(shouty)("wlen_ok"))
    val terse = Seq.fill(30)("a b").mkString(" ")
    assert(!flagsOf(terse)("wlen_ok"))
  }

  test("symbol-to-word ratio") {
    val hashy = clean + " " + Seq.fill(10)("#tag").mkString(" ")
    assert(!flagsOf(hashy)("sym_ok"))
  }

  test("bullet and ellipsis line ratios") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(!flagsOf(bullets)("bullet_ok"))
    val dots = (1 to 10).map(i => s"line $i goes on...").mkString("\n")
    assert(!flagsOf(dots)("ellipsis_ok"))
    assert(flagsOf(clean)("bullet_ok") && flagsOf(clean)("ellipsis_ok"))
  }

  test("alphabetic-word ratio") {
    val numeric = Seq.fill(30)("12345 67890 54321 98765 alpha").mkString(" ")
    assert(!flagsOf(numeric)("alpha_ok"))
  }

  test("stop-word kinds") {
    val noStops = Seq.fill(30)("lorem ipsum dolor sit amet").mkString(" ")
    assert(!flagsOf(noStops)("stop_ok"))
    assert(flagsOf(clean)("stop_ok"))
  }

  test("the default stop-kinds floor is the paper's 2; override works") {
    assert(GopherRules.MinStopwordKinds == 2)
    // "the" alone: one stop kind — below the published floor, above a
    // fixture override of 1 (the synthetic corpus carries ONLY "the")
    val oneKind = Seq.fill(30)("somewhere over the rainbow skies").mkString(" ")
    import org.apache.spark.sql.functions.col
    val df = Seq(oneKind).toDF("text")
    def stopOk(k: Int): Boolean = {
      val fs = GopherRules.flags(col("text"), minStopKinds = k)
      val row = df.select(fs.map { case (n, c) => c.as(n) }: _*).head()
      row.getBoolean(fs.indexWhere(_._1 == "stop_ok"))
    }
    assert(!stopOk(GopherRules.MinStopwordKinds))
    assert(stopOk(1))
  }

  test("empty text fails the zero-guarded rules, not with an error") {
    val f = flagsOf("")
    assert(!f("wc_ok") && !f("wlen_ok") && !f("sym_ok") && !f("alpha_ok"))
  }
}
