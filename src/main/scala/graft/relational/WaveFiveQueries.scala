package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q

/** Fifth-wave surface: temperature-scaled source mixing (the
  * multilingual-LM sampling curve on the exact-integer grid),
  * domain-level quality gating (the FineWeb-style per-domain signal —
  * a document is dropped for the company it keeps, not just its own
  * content), and the Z-order layout key (multi-dimension min-max
  * data-skipping at write time). Every entry carries a DuckDB oracle.
  */
object WaveFiveQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(s.read.parquet(t(dir, "documents")))

  // ---- domain-gate fixture -------------------------------------------
  // The synthetic corpus is quality-uniform across sources, so a
  // per-domain mean gate would never separate (the degeneracy trap).
  // The fixture plants the separation the operator exists to detect:
  // every third source is a "content farm" whose pages carry a
  // punctuation-noise footer (tanking the punct-ratio term of the
  // quality score), the rest get a clean closing sentence. Keyed off
  // the source NAME so the same domains are dirty at every SF.
  private val DirtyFooter =
    " !!!*** ### %%% @@@ $$$ ^^^ &&& ((( ))) ??? !!!*** ### %%% @@@"
  private val CleanFooter =
    " The committee reviewed the findings and approved the report."

  private def srcNum(c: org.apache.spark.sql.Column) =
    regexp_extract(c, "([0-9]+)", 1).cast("long")

  private def domainDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("source"),
      concat(col("text"),
        when(srcNum(col("source")) % 3 === 0, lit(DirtyFooter))
          .otherwise(lit(CleanFooter))).as("text"))

  private val domainDocsSql =
    s"""(SELECT doc_id, source,
       |  text || CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1)
       |                    AS BIGINT) % 3 = 0
       |    THEN '$DirtyFooter' ELSE '$CleanFooter' END AS text
       | FROM documents)""".stripMargin

  /** Domain punctuation-noise ceiling, in ppm of characters. Sits in
    * the band gap the fixture plants (clean sources carry ~1 period
    * per ~380 chars ≈ 3k ppm; noise-footer sources ~44 punct chars per
    * page ≈ 110k ppm), so the gate BINDS at every SF. */
  val DomainPunctPpmCeiling = 50000L

  /** url_scope_filter fixture: one URL per rule (and per near-miss, so
    * every boundary is pinned: depth 8 passes / 9 fails, 5 params pass
    * / 6 fail, two repeats pass / three trap). ASCII and quote-free so
    * each embeds verbatim in the oracle's VALUES list. */
  val ScopeFixture: Seq[String] = Seq(
    "https://example.com/articles/2024/ai-report",
    "http://example.com/",
    "ftp://files.example.org/pub/data.csv",
    "mailto:someone@example.com",
    "not a url at all",
    "https://cdn.example.com/assets/logo.PNG",
    "https://example.com/downloads/archive.tar",
    "https://example.com/player.js",
    "https://example.com/a/b/c/d/e/f/g/h",
    "https://example.com/a/b/c/d/e/f/g/h/i",
    "https://example.com/cal/2024/01/02/2024/01/03/2024/x",
    "https://example.com/loop/x/loop/y/loop",
    "https://example.com/a/b/a/b",
    "https://shop.example.com/list?a=1&b=2&c=3&d=4&e=5",
    "https://shop.example.com/list?a=1&b=2&c=3&d=4&e=5&f=6",
    "https://example.com/search?q=term&page=2")

  val all: Seq[Q] = Seq(

    // crawl-scope URL gate: the ingest-side filter that keeps media
    // assets, crawler traps, and URL-family explosions out of the
    // fetch/parse queue entirely — at 100 TB the cheapest byte is the
    // one never read. Row-local regexp/array rules with a fixed
    // reason priority (graft.text.UrlScope has the rule-by-rule
    // derivation, including why the trap test is an array count and
    // not a backreference regex).
    Q("url_scope_filter", (s, _) => {
      import s.implicits._
      import graft.text.UrlScope
      ScopeFixture.toDF("url")
        .withColumn("c", UrlScope.classify(col("url")))
        .select(col("url"), col("c.in_scope").as("in_scope"),
          col("c.reason").as("reason"))
        .orderBy(col("url"))
    }, Some {
      import graft.text.UrlScope
      val values = ScopeFixture.map(u => s"('$u')").mkString(",\n  ")
      s"""WITH urls(url) AS (VALUES
         |  $values)
         |SELECT url,
         |  ${UrlScope.reasonSql("url")} = 'ok' AS in_scope,
         |  ${UrlScope.reasonSql("url")} AS reason
         |FROM urls ORDER BY url""".stripMargin
    }),

    // temperature-scaled mixing (alpha = 1/2, arXiv:1911.02116 §3.1):
    // weights DERIVED from per-source token mass via exact integer
    // isqrt instead of caller-supplied — flattens the natural source
    // distribution the way multilingual LM training samples languages.
    // Cost on top of corpus_mix: one isqrt per SOURCE (model-sized).
    Q("corpus_mix_temperature", (s, dir) => {
      import graft.analysis.CorpusMix
      CorpusMix.temperatureSummary(docs(s, dir),
        "doc_id", "text", "source", budgetPpm = 600000L)
    }, Some {
      import graft.analysis.CorpusMix
      CorpusMix.temperatureSummarySql("documents", budgetPpm = 600000L)
    }),

    // FineWeb-style domain-level gate: a domain whose AGGREGATE noise
    // is over the ceiling drops wholesale — boilerplate/spam farms
    // emit individually-passable pages, and the domain aggregate is
    // the published signal that catches them. The signals are raw
    // integer counts (punct chars, total chars, tokens) summed in
    // int64 and combined by integer div — the composite quality score
    // is a rounded-double surface whose last-ulp behavior the engines
    // need not share, so the EXACT domain mean deliberately never
    // touches it. Domain-stats relation is domain-cardinality sized
    // and broadcast back; the corpus side never shuffles bodies.
    Q("domain_quality_filter", (s, dir) => {
      import graft.analysis.DomainQuality
      DomainQuality.gate(domainDocs(s, dir), "doc_id", "text", "source",
          DomainPunctPpmCeiling)
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.TextAnalysis
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |    ${TextAnalysis.tokenCountSql("text")} AS ntok,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
         |      AS BIGINT) AS npunct,
         |    CAST(length(text) AS BIGINT) AS nchars
         |  FROM $domainDocsSql),
         |d AS (
         |  SELECT source,
         |    CAST(sum(npunct) AS BIGINT) * 1000000
         |      // CAST(sum(nchars) AS BIGINT) AS domain_punct_ppm,
         |    CAST(sum(ntok) AS BIGINT) // count(*) AS domain_mean_tok
         |  FROM s GROUP BY 1)
         |SELECT s.doc_id, s.source, s.ntok, d.domain_punct_ppm,
         |  d.domain_mean_tok,
         |  d.domain_punct_ppm < $DomainPunctPpmCeiling AS domain_pass
         |FROM s JOIN d USING (source)
         |ORDER BY s.doc_id""".stripMargin
    }),

    // DCLM-style quality-WEIGHTED sampling: instead of a hard
    // keep/drop at a score threshold, each document survives with
    // probability proportional to its classifier score — soft
    // selection keeps some mid-quality mass and diversifies the
    // corpus (what DataComp-LM found beats hard filtering). The curve
    // is a hard-sigmoid on the exact integer grid: QualityModel's
    // int64 milli-log-odds raw score maps to a keep-rate in ppm by
    // integer clamp (500000 + raw * 250, clamped to [0, 1e6] — the
    // piecewise-linear sigmoid), and the keep test is the engine's
    // deterministic md5 coin. Zero floats end to end; row-local
    // scoring, no shuffle beyond the ordering.
    Q("quality_weighted_sample", (s, dir) => {
      import graft.analysis.QualityModel
      import graft.dedup.Dedup
      docs(s, dir)
        .select(col("doc_id"),
          QualityModel.rawScore(col("text")).as("q_raw"))
        .withColumn("rate_ppm",
          least(lit(1000000L),
            greatest(lit(0L), lit(500000L) + col("q_raw") * 250)))
        .withColumn("kept",
          Dedup.md5Hash32(col("doc_id").cast("string"), "qws:")
            % 1000000L < col("rate_ppm"))
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.QualityModel
      import graft.dedup.Dedup
      s"""WITH ${QualityModel.oracleCte("documents")}
         |SELECT doc_id, q_score AS q_raw,
         |  least(1000000, greatest(0, 500000 + q_score * 250))
         |    AS rate_ppm,
         |  ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "qws:")}
         |    % 1000000 <
         |    least(1000000, greatest(0, 500000 + q_score * 250)) AS kept
         |FROM qs ORDER BY doc_id""".stripMargin
    }),

    // cross-snapshot crawl diff: yesterday's corpus vs today's crawl,
    // classified added/removed/changed/unchanged — the delta step an
    // incremental crawl pipeline runs before re-processing ONLY what
    // moved. Bodies reduce to md5 fingerprints BEFORE the join, so the
    // full-outer shuffle carries (key, 32-char fp), never text; at
    // 100 TB both sides scan once and exchange narrow rows. The "new
    // snapshot" is a deterministic mutation of the corpus (docs %7=3
    // removed, %5=0 rewritten, fresh ids added) so every status is
    // present at every SF.
    Q("crawl_diff", (s, dir) => {
      val prev = docs(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fp_prev"))
      val next = docs(s, dir)
        .filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" [updated]")))
            .otherwise(col("text"))).as("fp_next"))
        .unionByName(docs(s, dir).filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            md5(col("text")).as("fp_next")))
      prev.join(next, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("fp_prev").isNull, "added")
            .when(col("fp_next").isNull, "removed")
            .when(col("fp_prev") === col("fp_next"), "unchanged")
            .otherwise("changed").as("status"))
        .orderBy(col("doc_id"))
    }, Some(
      """WITH prev AS (
        |  SELECT doc_id, md5(text) AS fp_prev FROM documents),
        |next AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [updated]'
        |        ELSE text END) AS fp_next
        |  FROM documents WHERE doc_id % 7 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000000, md5(text) FROM documents
        |  WHERE doc_id % 11 = 0),
        |j AS (
        |  SELECT coalesce(prev.doc_id, next.doc_id) AS doc_id,
        |    fp_prev, fp_next
        |  FROM prev FULL OUTER JOIN next ON prev.doc_id = next.doc_id)
        |SELECT doc_id,
        |  CASE WHEN fp_prev IS NULL THEN 'added'
        |       WHEN fp_next IS NULL THEN 'removed'
        |       WHEN fp_prev = fp_next THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM j ORDER BY doc_id""".stripMargin)),

    // the WHOLE crawl-side ingestion funnel end-to-end (the WEB-facing
    // twin of corpus_curate_full's content funnel): URL scope gate ->
    // URL-canonicalization dedup (tracking-param variants collapse to
    // one min-id winner) -> domain-level noise gate over the reaching
    // population -> quality-weighted sampling of what's left. Flags
    // are PROGRESSIVE (each implies the previous), so the row set is
    // the funnel's complete audit trail. One checkpointed crawl
    // snapshot feeds all stages; domain stats and URL winners are the
    // only exchanges, and both are narrow.
    Q("crawl_curate", (s, dir) => {
      import graft.analysis.QualityModel
      import graft.dedup.Dedup
      import graft.text.{UrlNormalize, UrlScope}
      val base = domainDocs(s, dir)
      val stem = concat(lit("https://"), col("source"),
        lit(".example.com"))
      val url =
        when(col("doc_id") % 13 === 1,
            concat(stem, lit("/assets/img.png")))
          .when(col("doc_id") % 13 === 2,
            concat(stem, lit("/a/b/c/d/e/f/g/h/i")))
          .when(col("doc_id") % 13 === 3,
            concat(stem, lit("/loop/x/loop/y/loop")))
          .when(col("doc_id") % 13 === 4,
            concat(stem, lit("/list?a=1&b=2&c=3&d=4&e=5&f=6")))
          .when(col("doc_id") % 13 === 5,
            concat(lit("ftp://"), col("source"),
              lit(".example.com/docs/"), col("doc_id").cast("string")))
          .otherwise(concat(stem, lit("/docs/"),
            col("doc_id").cast("string")))
      val crawl = base.select(col("doc_id"), col("source"), col("text"),
          url.as("url"))
        .unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 2000000000L).as("doc_id"),
            col("source"), col("text"),
            concat(stem, lit("/docs/"), col("doc_id").cast("string"),
              lit("?utm_source=dup")).as("url")))
        .localCheckpoint()
      val scoped = crawl
        .withColumn("in_scope",
          UrlScope.classify(col("url")).getField("in_scope"))
        .withColumn("norm_url", UrlNormalize.norm(col("url")))
      val winners = scoped.filter(col("in_scope"))
        .groupBy(col("norm_url")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).withColumn("win", lit(true))
      val flagged = scoped.join(winners, Seq("doc_id"), "left")
        .withColumn("url_dup_winner",
          col("in_scope") && coalesce(col("win"), lit(false)))
      val dstats = flagged.filter(col("url_dup_winner"))
        .groupBy(col("source"))
        .agg(expr("sum(CAST(regexp_count(text, '[^A-Za-z0-9\\\\s]')" +
          " AS BIGINT)) * 1000000 div sum(length(text))").as("dppm"))
      flagged.join(broadcast(dstats), Seq("source"), "left")
        .withColumn("domain_pass", col("url_dup_winner") &&
          coalesce(col("dppm") < DomainPunctPpmCeiling, lit(false)))
        // the model evaluation (the funnel's priciest expression) is
        // gated BEHIND domain_pass: rows already dropped by an earlier
        // stage never pay for scoring (conditional evaluation — ~60%
        // of rows at the gate SFs), and sampled is false for them
        // either way
        .withColumn("rate_ppm",
          when(col("domain_pass"),
            least(lit(1000000L), greatest(lit(0L),
              lit(500000L) + QualityModel.rawScore(col("text")) * 250))))
        .withColumn("sampled", col("domain_pass") &&
          Dedup.md5Hash32(col("doc_id").cast("string"), "cc:")
            % 1000000L < col("rate_ppm"))
        .select(col("doc_id"), col("in_scope"), col("url_dup_winner"),
          col("domain_pass"), col("sampled"))
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.QualityModel
      import graft.dedup.Dedup
      import graft.text.{UrlNormalize, UrlScope}
      val stem = "'https://' || source || '.example.com'"
      s"""WITH crawl AS (
         |  SELECT doc_id, source, text,
         |    CASE WHEN doc_id % 13 = 1 THEN $stem || '/assets/img.png'
         |      WHEN doc_id % 13 = 2 THEN $stem || '/a/b/c/d/e/f/g/h/i'
         |      WHEN doc_id % 13 = 3 THEN $stem || '/loop/x/loop/y/loop'
         |      WHEN doc_id % 13 = 4
         |        THEN $stem || '/list?a=1&b=2&c=3&d=4&e=5&f=6'
         |      WHEN doc_id % 13 = 5 THEN 'ftp://' || source ||
         |        '.example.com/docs/' || CAST(doc_id AS VARCHAR)
         |      ELSE $stem || '/docs/' || CAST(doc_id AS VARCHAR)
         |    END AS url
         |  FROM $domainDocsSql
         |  UNION ALL
         |  SELECT doc_id + 2000000000, source, text,
         |    $stem || '/docs/' || CAST(doc_id AS VARCHAR)
         |      || '?utm_source=dup'
         |  FROM $domainDocsSql WHERE doc_id % 9 = 0),
         |${QualityModel.oracleCte("crawl")},
         |scoped AS (
         |  SELECT doc_id, source, text,
         |    ${UrlScope.reasonSql("url")} = 'ok' AS in_scope,
         |    ${UrlNormalize.normSql("url")} AS norm_url
         |  FROM crawl),
         |w AS (
         |  SELECT min(doc_id) AS doc_id FROM scoped
         |  WHERE in_scope GROUP BY norm_url),
         |flagged AS (
         |  SELECT s.doc_id, s.source, s.text, s.in_scope,
         |    s.in_scope AND w.doc_id IS NOT NULL AS url_dup_winner
         |  FROM scoped s LEFT JOIN w ON s.doc_id = w.doc_id),
         |d AS (
         |  SELECT source,
         |    CAST(sum(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')))
         |        AS BIGINT) * 1000000
         |      // CAST(sum(length(text)) AS BIGINT) AS dppm
         |  FROM flagged WHERE url_dup_winner GROUP BY 1)
         |SELECT f.doc_id, f.in_scope, f.url_dup_winner,
         |  f.url_dup_winner AND coalesce(d.dppm < $DomainPunctPpmCeiling,
         |    false) AS domain_pass,
         |  f.url_dup_winner AND coalesce(d.dppm < $DomainPunctPpmCeiling,
         |    false) AND
         |    ${Dedup.md5Hash32Sql("CAST(f.doc_id AS VARCHAR)", "cc:")}
         |      % 1000000 <
         |    least(1000000, greatest(0, 500000 + qs.q_score * 250))
         |    AS sampled
         |FROM flagged f
         |LEFT JOIN d ON f.source = d.source
         |JOIN qs ON f.doc_id = qs.doc_id
         |ORDER BY f.doc_id""".stripMargin
    }),

    // Z-order layout key: per-bucket bounding rectangles of the Morton
    // key over (l_partkey, l_suppkey) — each bucket's min-max spans a
    // tight sub-rectangle of the key space, which IS the data-skipping
    // property a z-clustered write gives parquet file stats (the
    // physical proof — row groups actually skipped on the secondary
    // dimension — is ZOrderSpec over sinks.ZOrder.writeZOrdered; this
    // query pins the curve ARITHMETIC against an independent engine).
    // Bounds: one tiny min/max aggregate broadcast back; the key
    // itself is row-local codegen'd bit arithmetic.
    Q("q_zorder_layout", (s, dir) => {
      import graft.sinks.ZOrder
      val li = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
        .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
      val bounds = li.agg(
        min(col("a")).as("mna"), max(col("a")).as("mxa"),
        min(col("b")).as("mnb"), max(col("b")).as("mxb"))
      li.crossJoin(broadcast(bounds))
        .withColumn("na", expr("(a - mna) * 65535 div greatest(mxa - mna, 1)"))
        .withColumn("nb", expr("(b - mnb) * 65535 div greatest(mxb - mnb, 1)"))
        .withColumn("zbucket",
          shiftright(ZOrder.zValue(col("na"), col("nb"), 16), 26))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("min_a"), max(col("a")).as("max_a"),
          min(col("b")).as("min_b"), max(col("b")).as("max_b"))
        .orderBy(col("zbucket"))
    }, Some {
      import graft.sinks.ZOrder
      val na = ZOrder.normalize16Sql("a", "mna", "mxa")
      val nb = ZOrder.normalize16Sql("b", "mnb", "mxb")
      s"""WITH li AS (
         |  SELECT l_partkey AS a, l_suppkey AS b FROM lineitem),
         |bounds AS (
         |  SELECT min(a) AS mna, max(a) AS mxa,
         |         min(b) AS mnb, max(b) AS mxb FROM li),
         |keyed AS (
         |  SELECT a, b,
         |    ${ZOrder.zValue16Sql(na, nb)} >> 26 AS zbucket
         |  FROM li, bounds)
         |SELECT zbucket, count(*) AS n,
         |  min(a) AS min_a, max(a) AS max_a,
         |  min(b) AS min_b, max(b) AS max_b
         |FROM keyed GROUP BY 1 ORDER BY 1""".stripMargin
    }),
  )
}
