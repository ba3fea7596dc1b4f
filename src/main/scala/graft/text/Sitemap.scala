package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap parsing (the sitemaps.org XML protocol, 2008) — the OTHER
  * crawl-control file next to robots.txt: where robots says what a
  * crawler may NOT fetch, the sitemap says what the site WANTS fetched,
  * with per-URL freshness (`lastmod`), cadence (`changefreq`) and
  * weight (`priority`) hints. Production crawlers seed and re-prioritize
  * their frontiers from exactly these fields, so a corpus-scale engine
  * needs the parse + the protocol's validity rules as first-class
  * operators.
  *
  * Grammar handled (all row-local regexp/array builtins, shared
  * verbatim with the DuckDB twin, so the whole parse hash-checks):
  *
  *  - `<urlset>` documents: one entry per `<url>` block; `<loc>` is
  *    required, `lastmod`/`changefreq`/`priority` optional (NULL when
  *    absent);
  *  - `<sitemapindex>` documents: `<sitemap><loc>` references to
  *    sub-sitemaps ([[indexLocs]]) — the one-level recursion the
  *    protocol defines (an index must not reference another index);
  *  - locs are XML entity-escaped per the protocol ("you must...
  *    entity-escape" ampersands) — [[xmlDecode]] reverses the five
  *    predefined entities;
  *  - `lastmod` is W3C datetime; the DATE prefix is what frontier
  *    scheduling consumes (time-of-day is parsed out but not kept);
  *  - `priority` is a 0.0–1.0 decimal; it is parsed to an exact
  *    INTEGER per-mille grid ([[priorityPm]]) — no float anywhere, so
  *    both engines agree bit-for-bit. The protocol default 0.5 (500pm)
  *    is applied by the CONSUMER (frontier ordering), not the parser:
  *    absent stays NULL so "unstated" remains observable.
  *
  * Protocol validity rule enforced by consumers via [[sameHost]]: a
  * sitemap may only name URLs on its own host — cross-host entries are
  * ignored (the spec's cross-submission guard). Malformed entries
  * (no `<loc>`) surface as empty locs and are filtered the same way.
  *
  * Scale shape: pure projection — sitemap bodies explode to entry rows
  * at the scan with no shuffle; a 50k-URL sitemap (the protocol's own
  * per-file cap) is one row in, 50k narrow rows out.
  */
object Sitemap {

  private val UrlBlockRe = "(?is)<url>(.*?)</url>"
  private val SmBlockRe = "(?is)<sitemap>(.*?)</sitemap>"
  private val LocRe = "(?is)<loc>\\s*(.*?)\\s*</loc>"
  private val LastmodDateRe = "(?is)<lastmod>\\s*(\\d{4}-\\d{2}-\\d{2})"
  private val ChangefreqRe = "(?is)<changefreq>\\s*(.*?)\\s*</changefreq>"
  private val PriorityRe = "(?is)<priority>\\s*(.*?)\\s*</priority>"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Reverse the five predefined XML entities. `&lt;`/`&gt;`/`&quot;`/
    * `&#39;` first, `&amp;` LAST — so a double-escaped `&amp;lt;`
    * decodes to the literal `&lt;` and not to `<` (same ordering as
    * [[HtmlExtract.plain]]). */
  def xmlDecode(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (x, (e, r)) =>
        regexp_replace(x, java.util.regex.Pattern.quote(e), r)
      }

  def xmlDecodeSql(c: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(c) { case (s, (e, r)) => s"replace($s, '$e', '$r')" }

  /** `priority` text ("0.5", "1", "1.0", "0.85") → exact per-mille
    * BIGINT (500, 1000, 1000, 850); empty/absent → NULL. Integer
    * digit-parse only: ipart*1000 + first-3-fraction-digits
    * zero-padded. */
  private def priorityPm(p: Column): Column = {
    val ipart = nullif(regexp_extract(p, "^(\\d+)", 1), lit(""))
    val frac = rpad(regexp_extract(p, "^\\d+\\.(\\d{0,3})", 1), 3, "0")
    (ipart.cast("long") * 1000 + frac.cast("long")).as("priority_pm")
  }

  private def priorityPmSql(p: String): String = {
    val ipart = s"nullif(regexp_extract($p, '^(\\d+)', 1), '')"
    val frac = s"rpad(regexp_extract($p, '^\\d+\\.(\\d{0,3})', 1), 3, '0')"
    s"CAST($ipart AS BIGINT) * 1000 + CAST($frac AS BIGINT)"
  }

  /** Parse one `<urlset>` document into
    * `array<struct<loc, lastmod DATE, changefreq, priority_pm>>`.
    * Entries keep page order; a `<url>` block with no `<loc>` yields
    * loc = '' (callers filter). */
  def entries(xml: Column): Column =
    transform(regexp_extract_all(xml, lit(UrlBlockRe), lit(1)), b =>
      struct(
        xmlDecode(regexp_extract(b, LocRe, 1)).as("loc"),
        to_date(nullif(regexp_extract(b, LastmodDateRe, 1), lit("")))
          .as("lastmod"),
        nullif(regexp_extract(b, ChangefreqRe, 1), lit(""))
          .as("changefreq"),
        priorityPm(regexp_extract(b, PriorityRe, 1))))

  /** DuckDB twin of [[entries]] over expression `c`. */
  def entriesSql(c: String): String =
    s"""list_transform(regexp_extract_all($c, '$UrlBlockRe', 1),
       |  b -> {'loc': ${xmlDecodeSql(s"regexp_extract(b, '$LocRe', 1)")},
       |        'lastmod': CAST(nullif(
       |            regexp_extract(b, '$LastmodDateRe', 1), '') AS DATE),
       |        'changefreq': nullif(
       |            regexp_extract(b, '$ChangefreqRe', 1), ''),
       |        'priority_pm': ${priorityPmSql(
                  s"regexp_extract(b, '$PriorityRe', 1)")}})"""
      .stripMargin.replace("\n", " ")

  /** Sub-sitemap locs of one `<sitemapindex>` document (decoded), in
    * page order. */
  def indexLocs(xml: Column): Column =
    transform(regexp_extract_all(xml, lit(SmBlockRe), lit(1)), b =>
      xmlDecode(regexp_extract(b, LocRe, 1)))

  def indexLocsSql(c: String): String =
    s"""list_transform(regexp_extract_all($c, '$SmBlockRe', 1),
       |  b -> ${xmlDecodeSql(s"regexp_extract(b, '$LocRe', 1)")})"""
      .stripMargin.replace("\n", " ")

  /** The protocol's cross-submission guard: an entry counts only when
    * its loc's host equals the host the sitemap was fetched from. */
  def sameHost(loc: Column, host: Column): Column =
    regexp_extract(loc, HostRe, 1) === host

  def sameHostSql(loc: String, host: String): String =
    s"regexp_extract($loc, '$HostRe', 1) = $host"
}
