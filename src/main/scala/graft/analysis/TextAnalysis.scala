package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. Everything is a composition of codegen'd built-ins —
  * no UDFs — so the whole stage stays inside whole-stage codegen and
  * scales as a narrow map over the corpus (zero shuffle).
  */
object TextAnalysis {

  /** Whitespace token count (empty/blank text counts 0).
    *
    * regexp_count of non-space RUNS, not size(split(...)): counting
    * matches never materializes a match array (split allocated one
    * string per token per evaluation), and blank text yields 0 with no
    * conditional. Counts are identical. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).cast("long")

  /** BPE-ish subword proxy: alpha runs, digit runs, and single
    * punctuation marks each count as one token. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** Punctuation-to-character ratio, 4 decimals. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(regexp_count(text, lit("[^A-Za-z0-9\\s]"))
        .cast("double") / length(text), 4))

  /** Mean whitespace-token length, 4 decimals (0 for blank text). */
  def meanWordLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      round(length(regexp_replace(text, "\\s+", "")).cast("double")
        / tokenCount(text), 4))

  /** English stopword-token ratio, 4 decimals. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val pat = "(?i)\\b(" + EnStopwords.mkString("|") + ")\\b"
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      round(regexp_count(text, lit(pat)).cast("double")
        / tokenCount(text), 4))
  }

  /** Composite quality score in [0,1], 4 decimals: rewards mid-length
    * documents, low punctuation noise, and a sane stopword share —
    * the standard shape of heuristic corpus-quality filters. */
  def qualityScore(text: Column): Column = {
    // the four raw counts bind once (same single-evaluation discipline as
    // langId); arithmetic inside the lambda REPRODUCES punctRatio /
    // stopwordRatio / the composite bit-for-bit, rounding included
    val stopPat = "(?i)\\b(" + EnStopwords.mkString("|") + ")\\b"
    val raw = array(
      tokenCount(text).cast("double"),
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double"),
      regexp_count(text, lit(stopPat)).cast("double"),
      length(text).cast("double"))
    element_at(
      transform(array(raw), r => {
        val ntok = element_at(r, 1)
        val npunct = element_at(r, 2)
        val nstop = element_at(r, 3)
        val len = element_at(r, 4)
        val lenScore = least(ntok / 100.0, lit(1.0))
        val punctRatio = when(len === 0, lit(0.0))
          .otherwise(round(npunct / len, 4))
        val stopRatio = when(ntok === 0, lit(0.0))
          .otherwise(round(nstop / ntok, 4))
        val punctPenalty = least(punctRatio * 5.0, lit(1.0))
        val stopScore = least(stopRatio * 5.0, lit(1.0))
        round(lenScore * 0.5 + (lit(1.0) - punctPenalty) * 0.3 +
          stopScore * 0.2, 4)
      }), 1)
  }

  /** Marker-word language ID over {en, cs, de}: the language with the
    * most marker-token hits wins; ties resolve en > cs > de; zero hits
    * -> "und". A cheap n-gram-free heuristic that runs entirely in
    * codegen. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "with", "for"),
    "cs" -> Seq("je", "se", "na", "za", "do", "pro", "nebo"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "fur"))

  private def markerHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("(?i)\\b(" + words.mkString("|") + ")\\b"))

  /** The three marker counts bind ONCE into an array and the decision
    * runs inside a lambda over that array: the naive formulation
    * referenced each regex count up to 5 times across `when` branches,
    * and conditional branches defeat codegen subexpression elimination —
    * the regexes re-ran per reference (measured 4x the per-row cost of
    * this shape). Priority on ties: en > cs > de, zero hits -> "und",
    * exactly as before. */
  def langId(text: Column): Column = {
    val counts = array(LangMarkers.map { case (_, ws) =>
      markerHits(text, ws) }: _*)
    element_at(
      transform(array(counts), h => {
        val en = element_at(h, 1)
        val cs = element_at(h, 2)
        val de = element_at(h, 3)
        val best = greatest(en, cs, de)
        when(best === 0, lit("und")).when(en === best, lit("en"))
          .when(cs === best, lit("cs")).otherwise(lit("de"))
      }), 1)
  }

  /** Exact content fingerprint: md5 of the lowercased,
    * whitespace-collapsed, trimmed text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  // ---- PII scrub (C4/CCNet-style redaction) --------------------------

  /** Shared by the text_scrub query and the streaming corpus build;
    * RE2/Java-regex common subset so DuckDB oracles replicate exactly. */
  val UrlPat = "https?://[^\\s,]+"
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\b\\d{3}-\\d{3}-\\d{3,4}\\b"
  val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact URLs first (so addresses inside URLs are consumed whole),
    * then emails, phones, IPv4; collapse whitespace, trim. Pure
    * codegen'd regexp built-ins. */
  def scrubPii(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, UrlPat, "<URL>"),
            EmailPat, "<EMAIL>"),
          PhonePat, "<PHONE>"),
        IpPat, "<IP>"),
      "\\s+", " "))

  /** Winnowing (rolling-hash) fingerprints, MOSS-style: hash every
    * character k-gram of the normalized text, slide a window of `w`
    * consecutive hashes, keep each window's minimum — the classic
    * position-robust document fingerprint set. Runs as explode + window
    * min + distinct: narrow per-document work, one shuffle on doc_id. */
  val WinnowK = 8
  val WinnowW = 4

  /** Per-document fingerprint-set summary: (doc_id, n_fp, fp_min, fp_max).
    * Input column must be the document text; hashing is md5-based and
    * engine-neutral.
    *
    * Winnowing is row-local — every document's fingerprint set depends on
    * that document alone — so this runs as ONE narrow projection over
    * array columns: gram hashes, sliding-window minima, and the distinct
    * set are all per-row array ops. The r01 formulation (explode 300
    * grams/doc -> window min over a doc-partitioned sort -> distinct ->
    * groupBy) paid three shuffles of |corpus|*|grams| rows for work that
    * needs none; at 100 TB the shuffle-free shape is the only viable one.
    * Each stage is projected to an attribute before the next lambda uses
    * it (lambda bodies re-evaluate non-attribute references per element).
    * Docs with no full window (fewer than k+w-1 chars) are absent from
    * the output, matching the oracle. */
  def winnowSummary(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    // spread narrow inputs so the md5-heavy projection parallelizes even
    // when the corpus is a single parquet split (no-op otherwise).
    // Since r04 the gram-hash / window-min / distinct pipeline is ONE
    // codegen'd pass (graft.functions.WinnowSig); the lambda twin below
    // is the property-spec reference.
    graft.relational.Scale.spreadIfNarrow(docs)
      .select(col(idCol).as("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= WinnowK + WinnowW - 1) // >= 1 full window
      .select(col("doc_id"),
        graft.functions.WinnowSig
          .winnow_fps(col("t"), WinnowK, WinnowW).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))
  }

  /** Pure-built-ins twin of [[winnowSummary]] (interpreted lambdas) —
    * the semantic reference for the native expression, mirrored by the
    * DuckDB oracle. */
  def winnowSummaryLambda(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    graft.relational.Scale.spreadIfNarrow(docs)
      .select(col(idCol).as("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= WinnowK + WinnowW - 1) // >= 1 full window
      .select(col("doc_id"),
        transform(sequence(lit(1), length(col("t")) - (WinnowK - 1)),
          i => conv(substring(md5(col("t").substr(i, lit(WinnowK))), 1, 8),
            16, 10).cast("long")).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("hs")) - (WinnowW - 1)),
          i => least((0 until WinnowW)
            .map(o => element_at(col("hs"), i + o)): _*)).as("wmins"))
      .select(col("doc_id"), array_distinct(col("wmins")).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))
  }

  /** The winnowing CTE chain alone, ending in `fp(doc_id, wmin)` — the
    * per-document DISTINCT fingerprint set — so pair-level consumers
    * (winnow_span_dups) reuse the whole fingerprint derivation. */
  def winnowFpCtes(docsRel: String): String =
    s"""g AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'gram': substring(t, i, $WinnowK)}
       |            for i in range(1, length(t) - ${WinnowK - 2})]) AS pg,
       |    length(t) - ${WinnowK - 1} AS ngrams
       |  FROM (SELECT doc_id,
       |          regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
       |        FROM $docsRel) __n
       |  WHERE length(t) >= $WinnowK),
       |h AS (
       |  SELECT doc_id, pg.pos AS pos, ngrams,
       |    ('0x' || substr(md5(pg.gram), 1, 8))::BIGINT AS h
       |  FROM g),
       |wm AS (
       |  SELECT doc_id,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wmin,
       |    pos, ngrams
       |  FROM h),
       |fp AS (
       |  SELECT DISTINCT doc_id, wmin
       |  FROM wm WHERE pos <= ngrams - ${WinnowW - 1})""".stripMargin

  def winnowSummarySql(docsRel: String): String =
    s"""WITH ${winnowFpCtes(docsRel)}
       |SELECT doc_id, count(*) AS n_fp, min(wmin) AS fp_min,
       |  max(wmin) AS fp_max
       |FROM fp GROUP BY doc_id""".stripMargin

  /** Cross-document SUBSTRING duplication, MOSS-style: pairs of
    * documents sharing >= `minShared` winnowing fingerprints — the
    * span-level detector that catches copied passages Jaccard-over-
    * whole-doc misses (each fingerprint pins a concrete k-gram both
    * docs contain, position-independent).
    *
    * Scale shape mirrors ngram dedup's df cap: fingerprints occurring
    * in more than `maxDf` documents (boilerplate/common-phrase spans —
    * each contributes O(df^2) candidate pairs) are dropped BEFORE the
    * pair join, so posting lists stay bounded and misses are one-sided
    * (a dropped fp only lowers `shared`; it never invents a pair). One
    * shuffle on the 8-byte fp key, one on the (da, db) pair key. */
  def winnowSharedSpans(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      minShared: Int, maxDf: Long): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf < 2 drops every shareable fingerprint ($maxDf)")
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    // checkpoint: the df-count pass AND both join sides read the
    // exploded fingerprints (the ngram_jaccard 3x-recompute lesson)
    val fps = graft.relational.Scale.spreadIfNarrow(docs)
      .select(col(idCol).as("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= WinnowK + WinnowW - 1)
      .select(col("doc_id"),
        explode(graft.functions.WinnowSig
          .winnow_fps(col("t"), WinnowK, WinnowW)).as("fp"))
      .localCheckpoint()
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val admitted = fps.join(rare, Seq("fp"))
    val a = admitted.select(col("fp"), col("doc_id").as("da"))
    val b = admitted.select(col("fp"), col("doc_id").as("db"))
    a.join(b, Seq("fp")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  def winnowSharedSpansSql(
      docsRel: String, minShared: Int, maxDf: Long): String =
    s"""WITH ${winnowFpCtes(docsRel)},
       |rare AS (
       |  SELECT wmin FROM fp GROUP BY wmin HAVING count(*) <= $maxDf),
       |r AS (SELECT f.doc_id, f.wmin FROM fp f JOIN rare USING (wmin))
       |SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
       |FROM r a JOIN r b ON a.wmin = b.wmin AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared
       |ORDER BY da, db""".stripMargin

  // ---- DuckDB oracle twins (same semantics, SQL dialect) -------------

  def tokenCountSql(c: String): String =
    s"CASE WHEN length(trim($c)) = 0 THEN 0 ELSE CAST(len(regexp_split_to_array(trim($c), '\\s+')) AS BIGINT) END"

  def bpeTokenCountSql(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$BpeTokenPattern')) AS BIGINT)"

  def punctRatioSql(c: String): String =
    s"CASE WHEN length($c) = 0 THEN 0.0 ELSE round(len(regexp_extract_all($c, '[^A-Za-z0-9\\s]')) * 1.0 / length($c), 4) END"

  def meanWordLenSql(c: String): String =
    s"CASE WHEN ${tokenCountSql(c)} = 0 THEN 0.0 ELSE round(length(regexp_replace($c, '\\s+', '', 'g')) * 1.0 / ${tokenCountSql(c)}, 4) END"

  def stopwordRatioSql(c: String): String = {
    val pat = "(?i)\\b(" + EnStopwords.mkString("|") + ")\\b"
    s"CASE WHEN ${tokenCountSql(c)} = 0 THEN 0.0 ELSE round(len(regexp_extract_all($c, '$pat')) * 1.0 / ${tokenCountSql(c)}, 4) END"
  }

  def qualityScoreSql(c: String): String =
    s"""round(least(${tokenCountSql(c)} * 1.0 / 100.0, 1.0) * 0.5
       | + (1.0 - least(${punctRatioSql(c)} * 5.0, 1.0)) * 0.3
       | + least(${stopwordRatioSql(c)} * 5.0, 1.0) * 0.2, 4)""".stripMargin

  def langIdSql(c: String): String = {
    def hits(ws: Seq[String]) =
      s"len(regexp_extract_all(lower($c), '\\b(${ws.mkString("|")})\\b'))"
    val cases = LangMarkers.map { case (l, ws) => (l, hits(ws)) }
    val best = cases.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val whens = cases.map { case (l, h) =>
      s"WHEN $h = $best AND $best > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  def fingerprintSql(c: String): String =
    s"md5(regexp_replace(trim(lower($c)), '\\s+', ' ', 'g'))"
}
