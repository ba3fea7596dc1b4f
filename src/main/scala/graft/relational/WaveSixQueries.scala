package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.text.{HtmlExtract, UrlNormalize, UrlScope}

/** Sixth-wave surface: the PARSE layer of the crawl pipeline — HTML
  * main-content extraction (the boilerplate classifier between fetched
  * bytes and every text operator) and crawl-frontier discovery (link
  * extraction → resolution → normalization → scope gate → seen-set
  * anti-join, the loop that makes a crawler a crawler). Pages are a
  * deterministic fixture built from the documents table (real
  * boilerplate shapes around entity-escaped document text), so both
  * engines construct byte-identical inputs and the whole parse stack
  * hash-checks end to end.
  */
object WaveSixQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(s.read.parquet(t(dir, "documents")))

  /** The fixture origin every page and root-relative link resolves
    * against. */
  val Origin = "https://corpus.example"

  private def pages(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      HtmlExtract.page(col("doc_id"), col("text")).as("html"))

  private val pagesSql =
    s"""(SELECT doc_id, ${HtmlExtract.pageSql("doc_id", "text")} AS html
       | FROM documents)""".stripMargin

  /** robots.txt fixture: agent-specific group overriding `*`
    * (a.example), `*`-only with an empty-pattern no-op rule
    * (b.example), and an Allow/Disallow length tie (d.example);
    * c.example has NO robots at all. Quote-free lines so each embeds
    * verbatim in the oracle's VALUES list. */
  val RobotsFixture: Seq[(String, Seq[String])] = Seq(
    "a.example" -> Seq(
      "# robots for a.example",
      "User-agent: graftbot",
      "Disallow: /private/",
      "Allow: /private/pub",
      "User-agent: *",
      "Disallow: /"),
    "b.example" -> Seq(
      "User-agent: *",
      "Disallow: /tmp/",
      "Disallow:",
      "Allow: /tmp/ok"),
    "d.example" -> Seq(
      "User-agent: *",
      "Allow: /dir",
      "Disallow: /dir"))

  /** URL fixture pinning every [[graft.text.Robots]] boundary: group
    * override, longest-match, tie-break, default-allow, no-robots. */
  val RobotsUrlFixture: Seq[String] = Seq(
    "https://a.example/private/x",
    "https://a.example/private/pub/1",
    "https://a.example/other",
    "https://b.example/tmp/x",
    "https://b.example/tmp/ok/f",
    "https://b.example/home",
    "https://c.example/anything",
    "https://d.example/dir/sub",
    "https://d.example/di")

  private def robotsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    RobotsFixture.map { case (h, ls) => (h, ls.mkString("\n")) }
      .toDF("host", "robots")
  }

  private val robotsValuesSql = RobotsFixture.map { case (h, ls) =>
    s"('$h', concat_ws(chr(10), ${ls.map(l => s"'$l'").mkString(", ")}))"
  }.mkString(",\n  ")

  val all: Seq[Q] = Seq(

    // HTML main-content extraction (Kohlschütter 2010 / jusText):
    // strip script/style/comments, split at block-tag boundaries,
    // keep blocks that read like prose (length >= 25, link density
    // < 1/3 — both integer tests), reassemble in page order. The
    // nav/aside/footer/heading boilerplate must vanish; the two
    // entity-escaped content paragraphs must survive byte-exactly.
    // Row-local codegen'd builtins only — the 100 TB case is a pure
    // projection ahead of every shuffle.
    Q("html_extract", (s, dir) => {
      pages(s, dir)
        .select(col("doc_id"), HtmlExtract.extract(col("html")).as("x"))
        .select(col("doc_id"),
          col("x.n_blocks").as("n_blocks"),
          col("x.n_kept").as("n_kept"),
          length(col("x.content")).cast("long").as("content_chars"),
          col("x.content").as("content"))
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH pages AS $pagesSql
         |SELECT doc_id,
         |  ${HtmlExtract.nBlocksSql("html")} AS n_blocks,
         |  ${HtmlExtract.nKeptSql("html")} AS n_kept,
         |  length(${HtmlExtract.contentSql("html")}) AS content_chars,
         |  ${HtmlExtract.contentSql("html")} AS content
         |FROM pages ORDER BY doc_id""".stripMargin)),

    // Crawl-frontier discovery — the composition that closes the
    // crawl loop: extract hrefs, resolve against the page origin,
    // canonicalize (UrlNormalize strips the utm_* params, so Mirror
    // links collapse onto already-crawled pages), gate by crawl scope
    // (mailto: and .png links die here), then anti-join the seen set
    // to leave only genuinely NEW work. Only narrow (url, doc_id)
    // rows ever shuffle — bodies stay columnar at the scan.
    Q("crawl_frontier", (s, dir) => {
      val resolved = pages(s, dir)
        .select(col("doc_id"),
          explode(HtmlExtract.links(col("html"))).as("href"))
        .select(col("doc_id"),
          UrlNormalize.norm(
            HtmlExtract.resolve(col("href"), Origin)).as("url"))
      val scoped = resolved
        .filter(UrlScope.classify(col("url")).getField("in_scope"))
      val seen = docs(s, dir).select(
        concat(lit(Origin + "/doc/"), col("doc_id").cast("string"))
          .as("url"))
      scoped.join(seen, Seq("url"), "left_anti")
        .groupBy(col("url"))
        .agg(countDistinct(col("doc_id")).as("n_refs"))
        .orderBy(col("url"))
    }, Some(
      s"""WITH pages AS $pagesSql,
         |hrefs AS (
         |  SELECT doc_id, unnest(${HtmlExtract.linksSql("html")}) AS href
         |  FROM pages),
         |resolved AS (
         |  SELECT doc_id, ${HtmlExtract.resolveSql("href", Origin)} AS u
         |  FROM hrefs),
         |normed AS (
         |  SELECT doc_id, ${UrlNormalize.normSql("u")} AS url
         |  FROM resolved),
         |scoped AS (
         |  SELECT doc_id, url FROM normed
         |  WHERE ${UrlScope.reasonSql("url")} = 'ok'),
         |seen AS (
         |  SELECT 'https://corpus.example/doc/' || doc_id AS url
         |  FROM documents)
         |SELECT url, count(DISTINCT doc_id) AS n_refs
         |FROM scoped WHERE url NOT IN (SELECT url FROM seen)
         |GROUP BY url ORDER BY url""".stripMargin)),

    // The TRUE crawl end-to-end: WARC archives whose HTTP payloads are
    // text/html pages, parsed by the splittable WARC reader, the HTML
    // boilerplate classifier, and the language/token gates in ONE
    // query. The oracle never sees WARC or HTML container bytes — it
    // applies the extraction SQL to pages built directly from the
    // documents table, so a hash match proves the gzip + HTTP +
    // charset + HTML round trip is byte-perfect THROUGH the parse.
    Q("warc_html_corpus", (s, dir) => {
      import graft.sources.WarcSource
      import graft.analysis.TextAnalysis
      import s.implicits._
      val pages0 = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          HtmlExtract.page(col("doc_id"), col("text")).as("html"))
      val archives = pages0
        .groupBy((col("doc_id") % 4).as("archive_id"))
        .agg(sort_array(collect_list(struct(col("doc_id"),
          col("html")))).as("ds"))
        .as[(Long, Seq[(Long, String)])]
        .map { case (aid, ds) =>
          (aid, WarcSource.gzipMembers(ds.map { case (id, h) =>
            ("response", s"https://corpus.example/doc/$id",
              "2024-04-01T00:00:00Z",
              WarcSource.httpPayload(h, "text/html; charset=utf-8",
                java.nio.charset.StandardCharsets.UTF_8))
          }))
        }
      val c = col("content")
      WarcSource.recordsSplit(archives, targetSplitBytes = 8192L)
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 &&
          col("mime").startsWith("text/html"))
        .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          HtmlExtract.extract(col("body_text")).as("x"))
        .select(col("doc_id"), col("x.n_kept").as("n_kept"),
          col("x.content").as("content"))
        .filter(TextAnalysis.langId(c) === "en" &&
          TextAnalysis.tokenCount(c).between(30, 400))
        .select(col("doc_id"), col("n_kept"),
          TextAnalysis.tokenCount(c).as("n_tokens"), c)
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.TextAnalysis
      s"""WITH pages AS (
         |  SELECT doc_id, ${HtmlExtract.pageSql("doc_id", "text")} AS html
         |  FROM documents WHERE doc_id < 200),
         |ext AS (
         |  SELECT doc_id, ${HtmlExtract.nKeptSql("html")} AS n_kept,
         |    ${HtmlExtract.contentSql("html")} AS content
         |  FROM pages),
         |gated AS (
         |  SELECT * FROM ext
         |  WHERE ${TextAnalysis.langIdSql("content")} = 'en'
         |    AND ${TextAnalysis.tokenCountSql("content")}
         |        BETWEEN 30 AND 400)
         |SELECT doc_id, n_kept,
         |  ${TextAnalysis.tokenCountSql("content")} AS n_tokens, content
         |FROM gated ORDER BY doc_id""".stripMargin
    }),

    // Anchor-text index — the IR-classic inverted signal (anchor text
    // describes the TARGET page better than the page itself; used for
    // retrieval and for labeling crawl frontiers): pair each href with
    // its anchor's inner text, resolve + canonicalize the target,
    // aggregate per target URL. Pairing alignment is by-construction:
    // both captures come from the SAME regex pass, in page order.
    Q("anchor_text_index", (s, dir) => {
      val pairRe = "(?is)<a[^>]+href=\"([^\"]*)\"[^>]*>(.*?)</a>"
      // ONE noise-strip + ONE whole-document regex pass (group 0);
      // groups re-extract per MATCH (short strings) — the pre-r10 form
      // ran the strip chain and the full-document pair regex twice
      val pairs = pages(s, dir)
        .select(col("doc_id"),
          HtmlExtract.stripNoise(col("html")).as("nn"))
        .select(col("doc_id"),
          explode(transform(
            regexp_extract_all(col("nn"), lit(pairRe), lit(0)),
            m => struct(regexp_extract(m, pairRe, 1).as("href"),
              regexp_extract(m, pairRe, 2).as("atext")))).as("p"))
        .select(col("doc_id"),
          UrlNormalize.norm(
            HtmlExtract.resolve(col("p.href"), Origin)).as("url"),
          HtmlExtract.plain(col("p.atext")).as("anchor"))
      pairs
        .filter(UrlScope.classify(col("url")).getField("in_scope"))
        .groupBy(col("url"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_anchors"),
          countDistinct(col("anchor")).as("n_texts"),
          min(col("anchor")).as("sample"))
        .orderBy(col("url"))
    }, Some {
      val pairRe = "(?is)<a[^>]+href=\"([^\"]*)\"[^>]*>(.*?)</a>"
      s"""WITH pages AS $pagesSql,
         |pr AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all(${HtmlExtract.stripNoiseSql("html")},
         |      '$pairRe', 1)) AS href,
         |    unnest(regexp_extract_all(${HtmlExtract.stripNoiseSql("html")},
         |      '$pairRe', 2)) AS atext
         |  FROM pages),
         |resolved AS (
         |  SELECT doc_id, ${HtmlExtract.resolveSql("href", Origin)} AS u,
         |    ${HtmlExtract.plainSql("atext")} AS anchor
         |  FROM pr),
         |normed AS (
         |  SELECT doc_id, ${UrlNormalize.normSql("u")} AS url, anchor
         |  FROM resolved)
         |SELECT url, count(DISTINCT doc_id) AS n_docs,
         |  count(*) AS n_anchors, count(DISTINCT anchor) AS n_texts,
         |  min(anchor) AS sample
         |FROM normed WHERE ${UrlScope.reasonSql("url")} = 'ok'
         |GROUP BY url ORDER BY url""".stripMargin
    }),

    // robots.txt parsing (RFC 9309): line attribution is a window
    // last(ignoreNulls) over line order, agent-group selection a
    // per-host flag — the whole parse is declarative and shared with
    // the twin. The agent-specific group SUPPRESSES the * group
    // (a.example), empty-pattern rules drop (b.example).
    Q("robots_rules", (s, _) => {
      graft.text.Robots.rules(robotsDf(s))
        .orderBy(col("host"), col("line_no"))
    }, Some(
      s"""WITH robots(host, robots) AS (VALUES
         |  $robotsValuesSql)
         |SELECT * FROM (${graft.text.Robots.rulesSql("robots")}) __r
         |ORDER BY host, line_no""".stripMargin)),

    // The fetch gate: longest matching prefix wins, Allow beats
    // Disallow on length ties, no match (or no robots at all) means
    // allowed. Rules broadcast; the URL side never shuffles — the
    // politeness gate costs one broadcast join at any crawl scale.
    Q("robots_gate", (s, _) => {
      import s.implicits._
      graft.text.Robots.gate(
          RobotsUrlFixture.toDF("url"), graft.text.Robots.rules(robotsDf(s)))
        .orderBy(col("url"))
    }, Some(
      s"""WITH robots(host, robots) AS (VALUES
         |  $robotsValuesSql),
         |urls(url) AS (VALUES
         |  ${RobotsUrlFixture.map(u => s"('$u')").mkString(",\n  ")}),
         |rules AS (
         |  SELECT * FROM (${graft.text.Robots.rulesSql("robots")}) __r)
         |SELECT * FROM (${graft.text.Robots.gateSql("urls")}) __g
         |ORDER BY url""".stripMargin)))
}
