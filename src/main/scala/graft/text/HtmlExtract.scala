package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the parse step between a crawl's
  * fetched bytes and every text operator downstream. The published
  * practice (Kohlschütter et al., "Boilerplate Detection Using Shallow
  * Text Features", WSDM 2010; jusText; trafilatura) classifies
  * BLOCKS, not characters: split the page at block-level tag
  * boundaries, then keep a block when it reads like prose —
  * sufficiently long and not dominated by anchor text. The two
  * features that carry almost all of Boilerpipe's signal are exactly
  * the two used here: text length and link density.
  *
  * Pipeline (all row-local, codegen'd builtins — no UDF, no shuffle;
  * every regex is shared verbatim with the DuckDB twin, so the whole
  * extraction hash-checks):
  *
  *  1. strip non-content elements: `<script>`/`<style>` subtrees and
  *     HTML comments (their text is never prose);
  *  2. split into blocks on block-level tags (`p`, `div`, `nav`,
  *     `footer`, headings, list/table elements, `br`, ...) — inline
  *     markup (`<a>`, `<b>`, `<span>`) stays inside its block;
  *  3. per block: anchor-chars = total length of `<a>...</a>` inner
  *     text; plain = tags stripped, entities decoded, whitespace
  *     collapsed;
  *  4. keep a block iff `length(plain) >= MinChars` and
  *     `anchor_chars * LinkDensityDen < length(plain)` — the integer
  *     form of link-density < 1/3 (no float division anywhere);
  *  5. content = kept blocks joined with '\n', in document order.
  *
  * Scale shape: pure projection — the 100 TB case is embarrassingly
  * parallel and the filter runs before any text ever shuffles. The
  * deliberate non-goals of a regex-lite extractor (malformed-nesting
  * recovery, CDATA, conditional comments) fail DETERMINISTICALLY and
  * identically in both engines — the operator contract is a fixed
  * computable mapping, not a browser.
  */
object HtmlExtract {

  /** Minimum plain-text length for a content block (jusText's
    * length-low boundary is 70 for full pages; 25 suits the
    * sentence-scale fixture while exercising the same rule). */
  val MinChars = 25

  /** Keep iff anchor_chars * LinkDensityDen < plain length, i.e.
    * link density strictly below 1/3. */
  val LinkDensityDen = 3

  private val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  private val StyleRe = "(?is)<style[^>]*>.*?</style>"
  private val CommentRe = "(?s)<!--.*?-->"

  /** Block-level boundary tags; inline tags are intentionally absent. */
  private val BlockRe =
    "(?i)</?(p|div|nav|footer|header|aside|section|article|main|" +
      "h[1-6]|ul|ol|li|table|tr|td|th|blockquote|pre|form|" +
      "body|html|head|title|br|hr)[^>]*>"

  private val TagRe = "<[^>]*>"
  private val AnchorRe = "(?is)<a[^>]*>(.*?)</a>"
  private val HrefRe = "(?i)<a[^>]+href=\"([^\"]*)\""

  // ---- shared column/SQL pieces -------------------------------------

  /** Script/style/comment removal (the one stateful-looking step —
    * still a pure regex because the fixture grammar never nests
    * script inside script, the published-extractor assumption too). */
  def stripNoise(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      ScriptRe, " "), StyleRe, " "), CommentRe, " ")

  def stripNoiseSql(c: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($c,
       |  '$ScriptRe', ' ', 'g'), '$StyleRe', ' ', 'g'),
       |  '$CommentRe', ' ', 'g')""".stripMargin.replace("\n", "")

  /** Tag-stripped, entity-decoded, whitespace-collapsed block text. */
  def plain(b: Column): Column = {
    val noTags = regexp_replace(b, TagRe, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        // literal (non-regex) entity spelling; replacement backslash
        // / dollar never occur in the entities above
        regexp_replace(c, java.util.regex.Pattern.quote(e), r)
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def plainSql(c: String): String = {
    val noTags = s"regexp_replace($c, '$TagRe', ' ', 'g')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (s, (e, r)) => s"replace($s, '$e', '$r')" }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Total inner-text length of the block's anchors (the link-density
    * numerator), as BIGINT. */
  def anchorChars(b: Column): Column =
    aggregate(
      transform(regexp_extract_all(b, lit(AnchorRe), lit(1)),
        a => length(plain(a)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def anchorCharsSql(c: String): String =
    s"""coalesce(list_sum(list_transform(
       |  regexp_extract_all($c, '$AnchorRe', 1),
       |  a -> length(${plainSql("a")}))), 0)""".stripMargin
      .replace("\n", "")

  // ---- extraction ---------------------------------------------------

  /** (n_blocks, n_kept, content) struct for one HTML document:
    * n_blocks counts non-empty blocks, n_kept the prose survivors,
    * content the kept plain texts joined with '\n' in page order. */
  def extract(html: Column): Column = {
    val raw = split(stripNoise(html), BlockRe)
    val nonEmpty = filter(raw, b => length(plain(b)) > lit(0))
    val kept = filter(nonEmpty, b =>
      length(plain(b)) >= lit(MinChars) &&
        anchorChars(b) * lit(LinkDensityDen) < length(plain(b)))
    struct(
      size(nonEmpty).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      array_join(transform(kept, plain(_)), "\n").as("content"))
  }

  /** DuckDB twins of the three [[extract]] fields over expression
    * `c` (list lambdas mirror the Spark higher-order functions). */
  def nBlocksSql(c: String): String =
    s"""len(list_filter(regexp_split_to_array(${stripNoiseSql(c)},
       |  '$BlockRe'), b -> length(${plainSql("b")}) > 0))"""
      .stripMargin.replace("\n", "")

  private def keptSql(c: String): String =
    s"""list_filter(regexp_split_to_array(${stripNoiseSql(c)},
       |  '$BlockRe'), b -> length(${plainSql("b")}) >= $MinChars
       |  AND ${anchorCharsSql("b")} * $LinkDensityDen
       |      < length(${plainSql("b")}))""".stripMargin.replace("\n", "")

  def nKeptSql(c: String): String = s"len(${keptSql(c)})"

  /** coalesce: DuckDB's array_to_string is NULL on an empty list
    * where Spark's array_join is '' — an all-boilerplate page must
    * extract to the SAME empty string in both engines. */
  def contentSql(c: String): String =
    s"""coalesce(array_to_string(list_transform(${keptSql(c)},
       |  b -> ${plainSql("b")}), chr(10)), '')""".stripMargin
      .replace("\n", "")

  // ---- link extraction ----------------------------------------------

  /** All href values of the page's anchors, in page order. */
  def links(html: Column): Column =
    regexp_extract_all(stripNoise(html), lit(HrefRe), lit(1))

  def linksSql(c: String): String =
    s"regexp_extract_all(${stripNoiseSql(c)}, '$HrefRe', 1)"

  /** Resolve an href against a page's base origin: absolute URIs (any
    * scheme) pass through, root-relative paths join the origin,
    * bare-relative paths join origin + '/'. (Directory-relative
    * resolution against the page PATH is a documented non-goal — the
    * fixtures and most crawl frontiers use root-relative links.) */
  def resolve(href: Column, origin: String): Column =
    when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
      .when(href.startsWith("/"), concat(lit(origin), href))
      .otherwise(concat(lit(origin), lit("/"), href))

  /** [[resolve]] with a per-row origin column (a multi-host crawl
    * resolves each page's links against that page's own origin). */
  def resolveCol(href: Column, origin: Column): Column =
    when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
      .when(href.startsWith("/"), concat(origin, href))
      .otherwise(concat(origin, lit("/"), href))

  def resolveSql(c: String, origin: String): String =
    s"""CASE WHEN regexp_matches($c, '^[A-Za-z][A-Za-z0-9+.-]*:')
       |  THEN $c
       |  WHEN $c LIKE '/%' THEN '$origin' || $c
       |  ELSE '$origin' || '/' || $c END""".stripMargin.replace("\n", "")

  // ---- deterministic page fixture -----------------------------------

  /** A synthetic page for document (docId, text): real boilerplate
    * shapes (nav/aside/footer dominated by anchors, a short heading,
    * script+style+comment noise) around the document text as two
    * `<p>` paragraphs, entity-escaped exactly as a server would.
    * Extraction must return the two paragraphs and nothing else. */
  def page(docId: Column, text: Column): Column = {
    val esc = regexp_replace(regexp_replace(regexp_replace(text,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val w = split(esc, " ")
    val n = size(w)
    val h = floor(n.cast("double") / lit(2.0)).cast("int")
    val p1 = array_join(slice(w, lit(1), h), " ")
    val p2 = array_join(slice(w, h + lit(1), n), " ")
    val id = docId.cast("string")
    concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><style>p { margin: 1em; }</style>" +
        "<script>if (1 < 2) { track(\"&\"); }</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/doc/"), (docId + lit(1)).cast("string"),
      lit("\">Next</a> <a href=\"/doc/"),
      (docId * lit(2)).cast("string"),
      lit("?utm_source=feed&utm_campaign=mirror\">Mirror</a></nav>" +
        "<h1>Doc "), id,
      lit("</h1><div id=\"main\"><p>"), p1,
      lit("</p><!-- render marker --><p>"), p2,
      lit("</p></div><aside><a href=\"/tag/alpha\">alpha</a> " +
        "<a href=\"/tag/beta\">beta</a></aside>" +
        "<footer>(c) 2024 Example Corp " +
        "<a href=\"/privacy\">Privacy</a> " +
        "<a href=\"mailto:crawl@example.com\">Contact</a> " +
        "<a href=\"/assets/logo.png\">Logo</a></footer></body></html>"))
  }

  /** DuckDB twin of [[page]] over (idExpr, textExpr). */
  def pageSql(idExpr: String, textExpr: String): String = {
    val esc = s"replace(replace(replace($textExpr, " +
      "'&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val w = s"string_split($esc, ' ')"
    val p1 = s"array_to_string(array_slice($w, 1, len($w) // 2), ' ')"
    val p2 =
      s"array_to_string(array_slice($w, len($w) // 2 + 1, len($w)), ' ')"
    s"""'<html><head><title>Doc ' || $idExpr ||
       |'</title><style>p { margin: 1em; }</style>' ||
       |'<script>if (1 < 2) { track("&"); }</script></head><body>' ||
       |'<nav><a href="/">Home</a> <a href="/about">About</a> ' ||
       |'<a href="/doc/' || ($idExpr + 1) ||
       |'">Next</a> <a href="/doc/' || ($idExpr * 2) ||
       |'?utm_source=feed&utm_campaign=mirror">Mirror</a></nav>' ||
       |'<h1>Doc ' || $idExpr ||
       |'</h1><div id="main"><p>' || $p1 ||
       |'</p><!-- render marker --><p>' || $p2 ||
       |'</p></div><aside><a href="/tag/alpha">alpha</a> ' ||
       |'<a href="/tag/beta">beta</a></aside>' ||
       |'<footer>(c) 2024 Example Corp ' ||
       |'<a href="/privacy">Privacy</a> ' ||
       |'<a href="mailto:crawl@example.com">Contact</a> ' ||
       |'<a href="/assets/logo.png">Logo</a></footer></body></html>'"""
      .stripMargin.replace("\n", " ")
  }
}
