package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Hits
import graft.relational.RelationalQueries.Q
import graft.text.{HtmlExtract, Robots, Sitemap, UrlNormalize, UrlScope}

/** Seventh-wave surface: sitemap-driven frontier seeding — the
  * crawl-control file robots.txt's complement (sitemaps.org protocol).
  * The fixture sitemaps are built deterministically from the documents
  * table in BOTH engines (the [[graft.text.HtmlExtract.page]]
  * discipline), so the whole parse + protocol-rule + prioritization
  * stack hash-checks end to end and scales with the SF.
  */
object WaveSevenQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(s.read.parquet(s"$dir/documents.parquet"))

  // ---- deterministic sitemap fixture --------------------------------
  // Each doc lands on host s<doc_id%4>.example, shard sitemap_<doc_id%2>.
  // Field boundaries pinned: %17 → cross-host loc (protocol guard must
  // drop it), %13 → entity-escaped query with tracking params (decode +
  // normalize), %7 → no lastmod, %11 → no priority, changefreq only on
  // %3 (optional fields NULL), lastmod carries a time-of-day suffix
  // (the parser keeps the DATE prefix).

  private def entryCol(extraDays: Column = lit(0)): Column = {
    val id = col("doc_id")
    val host = concat(lit("s"), (id % 4).cast("string"), lit(".example"))
    val loc0 = concat(lit("https://"), host, lit("/doc/"), id.cast("string"))
    val loc = when(id % 17 === 0,
        concat(lit("https://other.example/doc/"), id.cast("string")))
      .when(id % 13 === 0,
        concat(loc0, lit("?b=2&amp;utm_source=feed&amp;a=1")))
      .otherwise(loc0)
    val lastmod = date_format(
      date_add(to_date(lit("2024-01-01")),
        (id % 365 + extraDays).cast("int")),
      "yyyy-MM-dd")
    val cf = element_at(array(lit("daily"), lit("weekly"), lit("monthly")),
      ((id % 3) + 1).cast("int"))
    val pr = element_at(
      array(lit("1.0"), lit("0.8"), lit("0.5"), lit("0.3"), lit("0.1")),
      ((id % 5) + 1).cast("int"))
    concat(lit("<url><loc>"), loc, lit("</loc>"),
      when(id % 7 === 0, lit("")).otherwise(concat(
        lit("<lastmod>"), lastmod, lit("T08:30:00+00:00</lastmod>"))),
      when(id % 3 === 0, concat(
        lit("<changefreq>"), cf, lit("</changefreq>"))).otherwise(lit("")),
      when(id % 11 === 0, lit("")).otherwise(concat(
        lit("<priority>"), pr, lit("</priority>"))),
      lit("</url>"))
  }

  /** (host, sm_url, xml) — one `<urlset>` per (host, shard). */
  private def shardSitemaps(
      s: SparkSession, dir: String,
      docFilter: Column = lit(true),
      extraDays: Column = lit(0)): DataFrame =
    docs(s, dir).filter(docFilter)
      .select(col("doc_id"),
        concat(lit("s"), (col("doc_id") % 4).cast("string"),
          lit(".example")).as("host"),
        (col("doc_id") % 2).cast("string").as("shard"),
        entryCol(extraDays).as("entry"))
      .groupBy(col("host"), col("shard"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))
      .select(col("host"),
        concat(lit("https://"), col("host"), lit("/sitemap_"),
          col("shard"), lit(".xml")).as("sm_url"),
        col("xml"))

  private def entrySql(extraDays: String = "0"): String = {
    val host = "'s' || (doc_id % 4) || '.example'"
    val loc0 = s"'https://' || $host || '/doc/' || doc_id"
    s"""'<url><loc>' ||
       |CASE WHEN doc_id % 17 = 0
       |    THEN 'https://other.example/doc/' || doc_id
       |  WHEN doc_id % 13 = 0
       |    THEN $loc0 || '?b=2&amp;utm_source=feed&amp;a=1'
       |  ELSE $loc0 END
       ||| '</loc>' ||
       |CASE WHEN doc_id % 7 = 0 THEN '' ELSE '<lastmod>' ||
       |  strftime(DATE '2024-01-01'
       |      + CAST(doc_id % 365 + ($extraDays) AS INT),
       |    '%Y-%m-%d') || 'T08:30:00+00:00</lastmod>' END ||
       |CASE WHEN doc_id % 3 = 0 THEN '<changefreq>' ||
       |  ['daily','weekly','monthly'][CAST(doc_id % 3 AS INT) + 1] ||
       |  '</changefreq>' ELSE '' END ||
       |CASE WHEN doc_id % 11 = 0 THEN '' ELSE '<priority>' ||
       |  ['1.0','0.8','0.5','0.3','0.1'][CAST(doc_id % 5 AS INT) + 1] ||
       |  '</priority>' END ||
       |'</url>'""".stripMargin.replace("\n", " ")
  }

  private def shardsCtesNamed(prefix: String, whereSql: String,
      extraDays: String): String =
    s"""${prefix}smdocs AS (
       |  SELECT doc_id, 's' || (doc_id % 4) || '.example' AS host,
       |    CAST(doc_id % 2 AS VARCHAR) AS shard,
       |    ${entrySql(extraDays)} AS entry
       |  FROM documents WHERE $whereSql),
       |${prefix}shards AS (
       |  SELECT host,
       |    'https://' || host || '/sitemap_' || shard || '.xml' AS sm_url,
       |    '<urlset>' || string_agg(entry, '' ORDER BY doc_id) ||
       |      '</urlset>' AS xml
       |  FROM ${prefix}smdocs GROUP BY host, shard)""".stripMargin

  private val shardsCtes = shardsCtesNamed("", "TRUE", "0")

  // ---- robots fixture for the sitemap hosts -------------------------
  // s0: `*` group with one path-prefix block; s1: agent group overrides
  // a block-everything `*` group; s2/s3: no robots (default allow).
  private val SitemapRobots: Seq[(String, Seq[String])] = Seq(
    "s0.example" -> Seq("User-agent: *", "Disallow: /doc/2"),
    "s1.example" -> Seq(
      "User-agent: graftbot", "Disallow: /doc/1", "Allow: /doc/12",
      "User-agent: *", "Disallow: /"))

  private def robotsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    SitemapRobots.map { case (h, ls) => (h, ls.mkString("\n")) }
      .toDF("host", "robots")
  }

  private val robotsValuesSql = SitemapRobots.map { case (h, ls) =>
    s"('$h', concat_ws(chr(10), ${ls.map(l => s"'$l'").mkString(", ")}))"
  }.mkString(",\n  ")

  // ---- crawl-delay fixture ------------------------------------------
  private val DelayRobots: Seq[(String, Seq[String])] = Seq(
    "a.example" -> Seq(
      "User-agent: graftbot", "Crawl-delay: 2", "Disallow: /x",
      "User-agent: *", "Crawl-delay: 10"),
    "b.example" -> Seq(
      "User-agent: *", "Crawl-delay: soon", "Crawl-delay: 5"),
    "d.example" -> Seq("User-agent: *", "Disallow: /tmp/"))

  private val DelayPending: Seq[(String, Long)] = Seq(
    ("https://a.example/1", 1L), ("https://a.example/2", 2L),
    ("https://a.example/3", 3L),
    ("https://b.example/1", 1L), ("https://b.example/2", 2L),
    ("https://c.example/1", 7L), ("https://c.example/2", 5L),
    ("https://d.example/1", 4L))

  private val delayRobotsValuesSql = DelayRobots.map { case (h, ls) =>
    s"('$h', concat_ws(chr(10), ${ls.map(l => s"'$l'").mkString(", ")}))"
  }.mkString(",\n  ")

  // ---- parse-derived intra-corpus link graph ------------------------
  // Shared by link_hits (this file) and graph_label_prop (wave eight):
  // page fixture → href extraction → resolve → canonicalize →
  // '/doc/N' target → in-corpus semi join → distinct (src, dst) longs.

  private[relational] def linkEdges(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pages = d.select(col("doc_id"),
      HtmlExtract.page(col("doc_id"), col("text")).as("html"))
    val tgt = regexp_extract(col("url"), "/doc/(\\d+)$", 1)
    pages
      .select(col("doc_id").as("src"),
        explode(HtmlExtract.links(col("html"))).as("href"))
      .select(col("src"), UrlNormalize.norm(
        HtmlExtract.resolve(col("href"), WaveSixQueries.Origin))
        .as("url"))
      .filter(tgt =!= "")
      .select(col("src"), tgt.cast("long").as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** WITH-body fragment ending in `edges(src, dst)` and `nodes(node)`,
    * both MATERIALIZED (multiply referenced by the iterative oracles —
    * the BENCH_NOTES CTE-inlining lesson). */
  private[relational] def linkGraphCtes: String = {
    val pageSql = HtmlExtract.pageSql("doc_id", "text")
    s"""pages AS MATERIALIZED (
       |  SELECT doc_id, $pageSql AS html FROM documents),
       |hrefs AS (
       |  SELECT doc_id AS src, unnest(${HtmlExtract.linksSql("html")})
       |    AS href
       |  FROM pages),
       |resolved AS (
       |  SELECT src, ${HtmlExtract.resolveSql("href",
            WaveSixQueries.Origin)} AS u
       |  FROM hrefs),
       |normed AS (
       |  SELECT src, ${UrlNormalize.normSql("u")} AS url
       |  FROM resolved),
       |tg AS (
       |  SELECT src, TRY_CAST(regexp_extract(url, '/doc/(\\d+)$$', 1)
       |    AS BIGINT) AS dst
       |  FROM normed),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM tg
       |  WHERE dst IS NOT NULL
       |    AND dst IN (SELECT doc_id FROM documents)
       |    AND src <> dst),
       |nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents)"""
      .stripMargin
  }

  val all: Seq[Q] = Seq(

    // Sitemap parse + protocol rules: explode <url> entries, drop
    // loc-less and cross-host entries (the spec's cross-submission
    // guard), entity-decode and canonicalize locs, surface the
    // optional fields (lastmod DATE prefix, changefreq, priority on
    // the exact per-mille grid; absent → NULL). Pure projection: one
    // sitemap row in, narrow URL rows out, no shuffle before the
    // ORDER BY (driver-compare only).
    Q("sitemap_urls", (s, dir) => {
      shardSitemaps(s, dir)
        .select(col("host"), explode(Sitemap.entries(col("xml"))).as("e"))
        .filter(col("e.loc") =!= "" &&
          Sitemap.sameHost(col("e.loc"), col("host")))
        .select(col("host"),
          UrlNormalize.norm(col("e.loc")).as("url"),
          date_format(col("e.lastmod"), "yyyy-MM-dd").as("lastmod"),
          col("e.changefreq").as("changefreq"),
          col("e.priority_pm").as("priority_pm"))
        .orderBy(col("host"), col("url"))
    }, Some(
      s"""WITH $shardsCtes,
         |ent AS (
         |  SELECT host, unnest(${Sitemap.entriesSql("xml")}) AS e
         |  FROM shards),
         |flat AS (
         |  SELECT host, e.loc AS loc, e.lastmod AS lastmod,
         |    e.changefreq AS changefreq, e.priority_pm AS priority_pm
         |  FROM ent)
         |SELECT host, ${UrlNormalize.normSql("loc")} AS url,
         |  strftime(lastmod, '%Y-%m-%d') AS lastmod,
         |  changefreq, priority_pm
         |FROM flat
         |WHERE loc <> '' AND ${Sitemap.sameHostSql("loc", "host")}
         |ORDER BY host, url""".stripMargin)),

    // Sitemap-driven frontier seeding END TO END: index hop
    // (<sitemapindex> → sub-sitemaps), entry parse, protocol guards,
    // URL canonicalization, crawl-scope gate, robots fetch gate
    // (agent-group override binds on s1), seen-set anti-join, and the
    // fetch ordering production crawlers use — priority (protocol
    // default 500pm when unstated) desc. Bodies never shuffle: every
    // exchanged relation is (url, attrs)-narrow, robots rules
    // broadcast.
    Q("sitemap_frontier", (s, dir) => {
      val shards = shardSitemaps(s, dir)
      val index = shards
        .groupBy(col("host"))
        .agg(concat(lit("<sitemapindex>"),
          array_join(transform(array_sort(collect_list(col("sm_url"))),
            u => concat(lit("<sitemap><loc>"), u,
              lit("</loc></sitemap>"))), ""),
          lit("</sitemapindex>")).as("xml"))
      val subs = index
        .select(col("host"),
          explode(Sitemap.indexLocs(col("xml"))).as("sm_url"))
      val flat = subs.join(shards, Seq("host", "sm_url"))
        .select(col("host"), explode(Sitemap.entries(col("xml"))).as("e"))
        .filter(col("e.loc") =!= "" &&
          Sitemap.sameHost(col("e.loc"), col("host")))
        .select(col("host"), UrlNormalize.norm(col("e.loc")).as("url"),
          date_format(col("e.lastmod"), "yyyy-MM-dd").as("lastmod"),
          col("e.priority_pm").as("priority_pm"))
      val scoped = flat
        .filter(UrlScope.classify(col("url")).getField("in_scope"))
      val gated = Robots.gate(
        scoped.select(col("url")).distinct(), Robots.rules(robotsDf(s)))
        .filter(col("allowed"))
        .select(col("url"))
      val seen = docs(s, dir).filter(col("doc_id") % 3 === 0)
        .select(concat(lit("https://s"), (col("doc_id") % 4).cast("string"),
          lit(".example/doc/"), col("doc_id").cast("string")).as("url"))
      scoped
        .join(gated, Seq("url"), "left_semi")
        .join(seen, Seq("url"), "left_anti")
        .select(col("host"), col("url"), col("priority_pm"),
          coalesce(col("priority_pm"), lit(500L)).as("sort_pm"),
          col("lastmod"))
        .orderBy(col("sort_pm").desc, col("url"))
    }, Some(
      s"""WITH $shardsCtes,
         |idx AS (
         |  SELECT host, '<sitemapindex>' ||
         |    string_agg('<sitemap><loc>' || sm_url || '</loc></sitemap>',
         |      '' ORDER BY sm_url) || '</sitemapindex>' AS xml
         |  FROM shards GROUP BY host),
         |subs AS (
         |  SELECT host, unnest(${Sitemap.indexLocsSql("xml")}) AS sm_url
         |  FROM idx),
         |joined AS (
         |  SELECT s.host AS host, sh.xml AS xml
         |  FROM subs s JOIN shards sh
         |    ON sh.host = s.host AND sh.sm_url = s.sm_url),
         |ent AS (
         |  SELECT host, unnest(${Sitemap.entriesSql("xml")}) AS e
         |  FROM joined),
         |flat AS (
         |  SELECT host, e.loc AS loc,
         |    strftime(e.lastmod, '%Y-%m-%d') AS lastmod,
         |    e.priority_pm AS priority_pm
         |  FROM ent),
         |cand AS (
         |  SELECT host, ${UrlNormalize.normSql("loc")} AS url,
         |    lastmod, priority_pm
         |  FROM flat
         |  WHERE loc <> '' AND ${Sitemap.sameHostSql("loc", "host")}),
         |scoped AS (
         |  SELECT * FROM cand WHERE ${UrlScope.reasonSql("url")} = 'ok'),
         |robots(host, robots) AS (VALUES
         |  $robotsValuesSql),
         |rules AS (SELECT * FROM (${Robots.rulesSql("robots")}) __r),
         |urls AS (SELECT DISTINCT url FROM scoped),
         |gated AS (${Robots.gateSql("urls")}),
         |seen AS (
         |  SELECT 'https://s' || (doc_id % 4) || '.example/doc/' || doc_id
         |    AS url
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT c.host, c.url, c.priority_pm,
         |  coalesce(c.priority_pm, 500) AS sort_pm, c.lastmod
         |FROM scoped c JOIN gated g ON g.url = c.url
         |WHERE g.allowed AND c.url NOT IN (SELECT url FROM seen)
         |ORDER BY sort_pm DESC, c.url""".stripMargin)),

    // Recursive CTE (SQL:1999 WITH RECURSIVE, first usable in Spark 4):
    // BFS transitive closure with min-depth over the +1/x2 successor
    // graph — the iterative-query shape (org charts, BOM explosions,
    // graph reachability) that previously REQUIRED the driver-side
    // loop operators (ConnectedComponents/PageRank/Hits); here the
    // whole fixpoint stays inside one declarative statement in both
    // engines. Monotone successors bound the recursion (node strictly
    // grows, capped at 64), min-depth aggregates AFTER the fixpoint.
    // Successors ×2 / ×3 capped at 10000: the reachable set is the
    // 3-smooth numbers, depth = a+b of 2^a·3^b (unique factorization)
    // and n_paths = C(a+b, a) — real path counting, with the fixpoint
    // reached in ~13 rounds (an earlier +1/×2 lattice needed 63
    // UnionLoop rounds and paid ~7s of pure per-round scheduling; each
    // Spark recursion round is a job, so recursion DEPTH, not row
    // count, is the cost at any scale). COALESCE(1) keeps each tiny
    // round from shuffling into 32 partitions.
    Q("q_recursive_closure", (s, _) => {
      s.sql(
        """WITH RECURSIVE r(node, d) AS (
          |  SELECT 1, 0
          |  UNION ALL
          |  SELECT /*+ COALESCE(1) */
          |    CASE WHEN x = 0 THEN node * 2 ELSE node * 3 END,
          |    d + 1
          |  FROM r, (SELECT explode(array(0, 1)) AS x)
          |  WHERE (CASE WHEN x = 0 THEN node * 2 ELSE node * 3 END)
          |    <= 10000
          |)
          |SELECT CAST(node AS BIGINT) AS node,
          |  CAST(min(d) AS BIGINT) AS depth,
          |  CAST(count(*) AS BIGINT) AS n_paths
          |FROM r GROUP BY node ORDER BY node""".stripMargin)
    }, Some(
      """WITH RECURSIVE r(node, d) AS (
        |  SELECT 1, 0
        |  UNION ALL
        |  SELECT CASE WHEN x = 0 THEN node * 2 ELSE node * 3 END,
        |    d + 1
        |  FROM r, (SELECT unnest([0, 1]) AS x) t
        |  WHERE (CASE WHEN x = 0 THEN node * 2 ELSE node * 3 END)
        |    <= 10000
        |)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(min(d) AS BIGINT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM r GROUP BY node ORDER BY node""".stripMargin)),

    // Cross-snapshot sitemap diff — the BATCH hash-checked twin of
    // SitemapRecrawlJob's classification: two sitemap snapshots of the
    // same sites (B advances lastmod for %5 docs, adds the %9 docs A
    // lacked, drops the %6 docs) parse through the full protocol
    // chain, then one full-outer join on the canonical URL classifies
    // new / updated / gone / unchanged (null lastmods prove nothing →
    // unchanged, the recrawl job's conservatism). Only (url, date)
    // rows join — snapshot bodies never shuffle.
    Q("sitemap_recrawl_diff", (s, dir) => {
      def snap(docFilter: Column, extra: Column): DataFrame =
        shardSitemaps(s, dir, docFilter, extra)
          .select(col("host"),
            explode(Sitemap.entries(col("xml"))).as("e"))
          .filter(col("e.loc") =!= "" &&
            Sitemap.sameHost(col("e.loc"), col("host")))
          .select(UrlNormalize.norm(col("e.loc")).as("url"),
            col("e.lastmod").as("lm"))
      val a = snap(col("doc_id") % 9 =!= 0, lit(0))
        .select(col("url"), col("lm").as("lm_a"), lit(true).as("in_a"))
      val b = snap(col("doc_id") % 6 =!= 0,
          when(col("doc_id") % 5 === 0, 30).otherwise(0))
        .select(col("url"), col("lm").as("lm_b"), lit(true).as("in_b"))
      a.join(b, Seq("url"), "full_outer")
        .withColumn("status",
          when(col("in_a").isNull, "new")
            .when(col("in_b").isNull, "gone")
            .when(col("lm_a").isNotNull && col("lm_b").isNotNull &&
              col("lm_b") > col("lm_a"), "updated")
            .otherwise("unchanged"))
        .select(col("url"), col("status"),
          date_format(col("lm_a"), "yyyy-MM-dd").as("lastmod_a"),
          date_format(col("lm_b"), "yyyy-MM-dd").as("lastmod_b"))
        .orderBy(col("url"))
    }, Some {
      def snapSql(p: String) =
        s"""${p}flat AS (
           |  SELECT host, e.loc AS loc, e.lastmod AS lm
           |  FROM (SELECT host, unnest(${Sitemap.entriesSql("xml")}) AS e
           |    FROM ${p}shards) __${p}e),
           |${p}cand AS (
           |  SELECT ${UrlNormalize.normSql("loc")} AS url, lm
           |  FROM ${p}flat
           |  WHERE loc <> '' AND ${Sitemap.sameHostSql("loc", "host")})"""
          .stripMargin
      s"""WITH ${shardsCtesNamed("a_", "doc_id % 9 <> 0", "0")},
         |${shardsCtesNamed("b_", "doc_id % 6 <> 0",
              "CASE WHEN doc_id % 5 = 0 THEN 30 ELSE 0 END")},
         |${snapSql("a_")},
         |${snapSql("b_")}
         |SELECT coalesce(a.url, b.url) AS url,
         |  CASE WHEN a.url IS NULL THEN 'new'
         |    WHEN b.url IS NULL THEN 'gone'
         |    WHEN a.lm IS NOT NULL AND b.lm IS NOT NULL AND b.lm > a.lm
         |      THEN 'updated'
         |    ELSE 'unchanged' END AS status,
         |  strftime(a.lm, '%Y-%m-%d') AS lastmod_a,
         |  strftime(b.lm, '%Y-%m-%d') AS lastmod_b
         |FROM a_cand a FULL OUTER JOIN b_cand b ON b.url = a.url
         |ORDER BY url""".stripMargin
    }),

    // Crawl-delay politeness plan (the de-facto robots.txt extension):
    // per-host delay extraction under the same group-attribution /
    // agent-override logic as the rules parse (last numeric line of
    // the governing group wins; junk values drop), composed into the
    // per-host FIFO fetch plan — slot i fetches at (i-1)*delay. The
    // delay relation is host-sized and broadcast; the slot window is
    // per-host. Fixture pins: agent override (a: graftbot 2s beats *
    // 10s), junk + last-wins (b: 'soon' drops, 5s stands), no-robots
    // default (c), robots-without-delay default (d).
    Q("robots_delays", (s, _) => {
      import s.implicits._
      val robots = DelayRobots
        .map { case (h, ls) => (h, ls.mkString("\n")) }
        .toDF("host", "robots")
      Robots.fetchPlan(
          DelayPending.toDF("norm_url", "src_doc"),
          Robots.delays(robots), defaultDelayMs = 1000L)
        .orderBy(col("host"), col("slot"))
    }, Some(
      s"""WITH robots(host, robots) AS (VALUES
         |  $delayRobotsValuesSql),
         |pending(norm_url, src_doc) AS (VALUES
         |  ${DelayPending.map { case (u, d) => s"('$u', ${d}::BIGINT)" }
                .mkString(",\n  ")}),
         |numbered AS (
         |  SELECT regexp_extract(norm_url, '^[a-z]+://([^/]+)', 1)
         |      AS host,
         |    norm_url,
         |    CAST(row_number() OVER (
         |      PARTITION BY regexp_extract(norm_url,
         |        '^[a-z]+://([^/]+)', 1)
         |      ORDER BY src_doc, norm_url) AS BIGINT) AS slot
         |  FROM pending)
         |SELECT n.host, n.norm_url, n.slot,
         |  (n.slot - 1) * coalesce(d.delay_s * 1000, 1000) AS offset_ms
         |FROM numbered n
         |LEFT JOIN (${Robots.delaysSql("robots")}) d ON d.host = n.host
         |ORDER BY n.host, n.slot""".stripMargin)),

    // HITS hubs/authorities over the intra-corpus link graph — the
    // link graph is DERIVED by the real parse chain (page fixture →
    // href extraction → resolve → canonicalize → '/doc/N' target →
    // in-corpus semi join), then [[graft.operators.Hits]] runs 3
    // exact-integer mutual-reinforcement iterations. Only narrow
    // (src, dst) longs ever shuffle; each half-iteration is one
    // key-partitioned join + sum and a broadcast one-row shrink.
    Q("link_hits", (s, dir) => {
      val d = docs(s, dir)
      Hits.run(d.select(col("doc_id").as("node")), linkEdges(s, dir),
          "src", "dst", iters = 3)
        .orderBy(col("node"))
    }, Some(
      s"""WITH $linkGraphCtes,
         |${Hits.oracleCtes("nodes", "edges", 3)}
         |${Hits.oracleSelect("nodes", 3)}""".stripMargin)))
}
