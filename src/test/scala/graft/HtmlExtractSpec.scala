package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.HtmlExtract

/** HTML main-content extraction: boilerplate classification by block
  * length + link density, entity round-trip, noise stripping, link
  * extraction and resolution — each boundary pinned on handcrafted
  * pages (the corpus-scale behavior is oracle-checked by the
  * html_extract / crawl_frontier queries). */
class HtmlExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extract(html: String): (Long, Long, String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h")).as("x"))
      .select("x.n_blocks", "x.n_kept", "x.content")
      .first()
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  private def links(html: String): Seq[String] = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(HtmlExtract.links(col("h")).as("l"))
      .first().getSeq[String](0)
  }

  private val Prose =
    "The committee reviewed the quarterly findings in detail today."

  test("content paragraphs survive; nav/footer boilerplate dies") {
    val page =
      s"""<html><body><nav><a href="/">Home</a> <a href="/a">A</a></nav>
         |<p>$Prose</p>
         |<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> (c)</footer>
         |</body></html>""".stripMargin.replace("\n", "")
    val (_, kept, content) = extract(page)
    assert(kept === 1L)
    assert(content === Prose)
  }

  test("script, style and comments never contribute text") {
    val page =
      s"""<html><head><style>p { color: red; }</style>
         |<script>var longEnoughToKeep = "$Prose$Prose";</script>
         |</head><body><!-- $Prose --><p>$Prose</p></body></html>"""
        .stripMargin.replace("\n", "")
    val (_, kept, content) = extract(page)
    assert(kept === 1L)
    assert(content === Prose)
  }

  test("MinChars boundary: 24-char block dies, 25-char block lives") {
    val t24 = "x" * 24
    val t25 = "y" * 25
    val (_, kept, content) = extract(s"<p>$t24</p><p>$t25</p>")
    assert(kept === 1L)
    assert(content === t25)
  }

  test("link-density boundary: exactly 1/3 dies, just under lives") {
    // plain = 30 chars; anchor 10 chars -> 10*3 == 30 NOT < 30: dies
    val dense = "<p><a href=\"/x\">" + "a" * 10 + "</a>" + "b" * 19 +
      " </p>"
    // plain = 31 chars; anchor 10 -> 30 < 31: lives
    val sparse = "<p><a href=\"/x\">" + "a" * 10 + "</a>" + "b" * 20 +
      " </p>"
    assert(extract(dense)._2 === 0L)
    assert(extract(sparse)._2 === 1L)
  }

  test("entities decode after tag stripping (escaped markup is text)") {
    val page = "<p>1 &lt; 2 &amp;&amp; x &gt; 0, &quot;q&#39;s&quot;" +
      " padding padding</p>"
    val (_, _, content) = extract(page)
    assert(content === "1 < 2 && x > 0, \"q's\" padding padding")
  }

  test("all-boilerplate page extracts to the empty string") {
    val (blocks, kept, content) =
      extract("<nav><a href=\"/\">Home</a></nav><h1>Hi</h1>")
    assert(blocks === 2L)
    assert(kept === 0L)
    assert(content === "")
  }

  test("inline markup stays within its block") {
    val page = s"<p>one <b>two</b> three $Prose</p>"
    val (blocks, kept, content) = extract(page)
    assert(blocks === 1L)
    assert(kept === 1L)
    assert(content === s"one two three $Prose")
  }

  test("links extract in page order; resolve handles all three shapes") {
    import spark.implicits._
    val page = """<a href="https://other.example/x">abs</a>
      |<a href="/root">root</a><a href="rel">rel</a>
      |<a href="mailto:a@b.c">mail</a>""".stripMargin.replace("\n", "")
    assert(links(page) ===
      Seq("https://other.example/x", "/root", "rel", "mailto:a@b.c"))
    val resolved = Seq("https://other.example/x", "/root", "rel",
        "mailto:a@b.c").toDF("href")
      .select(HtmlExtract.resolve(col("href"), "https://base.example")
        .as("u"))
      .as[String].collect().toSeq
    assert(resolved === Seq(
      "https://other.example/x",
      "https://base.example/root",
      "https://base.example/rel",
      "mailto:a@b.c"))
  }

  test("fixture page round-trips its document text as two paragraphs") {
    import spark.implicits._
    val text = "alpha beta & gamma <delta> epsilon zeta eta theta " +
      "iota kappa lambda mu"
    val r = Seq((7L, text)).toDF("doc_id", "text")
      .select(HtmlExtract.extract(
        HtmlExtract.page(col("doc_id"), col("text"))).as("x"))
      .select("x.n_kept", "x.content")
      .first()
    assert(r.getLong(0) === 2L)
    // the two halves, joined with \n, reproduce the text byte-exactly
    assert(r.getString(1).replace("\n", " ") === text)
  }
}
