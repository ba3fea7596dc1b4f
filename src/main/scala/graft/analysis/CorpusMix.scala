package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Source-weighted corpus MIXING (Pile/Dolma-style domain mixture):
  * given per-source mixture weights and an overall token budget, keep a
  * deterministic hash-sample of each source at the rate that lands its
  * token share on target. The rate, not a per-source top-N, is the
  * at-scale mechanism: no per-source global ordering (which would need
  * a corpus-wide prefix sum PER GROUP), no windows at all — one tiny
  * per-source aggregate, a broadcast of |sources| rates, and a
  * row-local md5 keep-filter. Reproducible across engines, retries, and
  * cluster sizes, like every sampler in this engine.
  *
  * All rate arithmetic is INTEGER (ppm domain, positive operands), so
  * Spark `div` and DuckDB `//` agree exactly and the whole operator is
  * hash-checkable:
  *
  *   budget      = totalTokens * budgetPpm div 10^6
  *   budget_s    = budget * w_s div 10^6
  *   rate_s(ppm) = min(10^6, budget_s * 10^6 div tokens_s)
  *   keep(doc)   = md5("mix:" + id) % 10^6 < rate_s
  *
  * Weights need not sum to 10^6 — each source's budget derives
  * independently (a weight set summing under/over one simply under- or
  * over-fills the total budget; rates clamp at 10^6, i.e. a source
  * cannot be up-sampled).
  */
object CorpusMix {

  val Ppm = 1000000L

  /** Per-source weight column from a (source -> ppm) map + default. */
  def weightCol(sourceCol: Column, weightsPpm: Map[String, Long],
      defaultPpm: Long): Column =
    weightsPpm.foldLeft(lit(defaultPpm)) { case (acc, (s, w)) =>
      when(sourceCol === s, lit(w)).otherwise(acc)
    }

  /** Kept rows: (doc_id, source, tokens, w_ppm, rate_ppm). */
  def sample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      weightsPpm: Map[String, Long],
      defaultPpm: Long,
      budgetPpm: Long): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).as("tokens"))
    val tot = tok.groupBy(col("source"))
      .agg(sum(col("tokens")).as("st"))
    val grand = tot.agg(sum(col("st")).as("t"))
    val rates = tot.crossJoin(broadcast(grand))
      .withColumn("w", weightCol(col("source"), weightsPpm, defaultPpm))
      .withColumn("rate",
        least(lit(Ppm),
          expr(s"((t * $budgetPpm div $Ppm) * w div $Ppm) * $Ppm div st")))
      .select(col("source"), col("w"), col("rate"))
    tok.join(broadcast(rates), Seq("source"))
      .filter(Dedup.md5Hash32(col("doc_id").cast("string"), "mix:")
        % Ppm < col("rate"))
  }

  /** Per-source mixture summary of the kept sample:
    * (source, w_ppm, rate_ppm, n_docs, tokens_kept). */
  def summary(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      weightsPpm: Map[String, Long],
      defaultPpm: Long,
      budgetPpm: Long): DataFrame =
    sample(docs, idCol, textCol, sourceCol, weightsPpm, defaultPpm,
        budgetPpm)
      .groupBy(col("source"))
      .agg(max(col("w")).as("w_ppm"),
        max(col("rate")).as("rate_ppm"),
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tokens_kept"))
      .orderBy(col("source"))

  /** Exact integer floor-sqrt. Double sqrt is correctly rounded, but
    * floor(sqrt(x)) can still land one off when the true root sits
    * within half an ulp of an integer; the two-sided correction pins
    * the exact value in both engines, so the temperature weights below
    * stay hash-checkable. */
  def isqrt(x: Column): Column = {
    // Upper-branch guard: for s0 >= 3037000499 (= isqrt(Long.MaxValue)),
    // (s0+1)^2 exceeds 2^63-1 — Spark would wrap negative and take the
    // <= x branch (off-by-one) where DuckDB raises instead. s0+1 can
    // never be the answer in that regime, so skip the probe entirely.
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    when(s0 * s0 > x, s0 - 1)
      .when(s0 < lit(3037000499L) && (s0 + 1) * (s0 + 1) <= x, s0 + 1)
      .otherwise(s0)
  }

  /** DuckDB twin of [[isqrt]] (same correction + overflow guard,
    * inline CASE). */
  def isqrtSql(x: String): String = {
    val s0 = s"CAST(floor(sqrt(CAST(($x) AS DOUBLE))) AS BIGINT)"
    s"""(CASE WHEN $s0 * $s0 > ($x) THEN $s0 - 1
       |  WHEN $s0 < 3037000499 AND ($s0 + 1) * ($s0 + 1) <= ($x) THEN $s0 + 1
       |  ELSE $s0 END)""".stripMargin.replace("\n", " ")
  }

  /** TEMPERATURE-scaled mixing (XLM-R / multilingual-LM style,
    * arXiv:1911.02116 §3.1): instead of caller-supplied weights, each
    * source's mixture weight derives from its own token share raised to
    * alpha = 1/2 — big sources are down-weighted, small sources
    * up-weighted, flattening the natural distribution. alpha = 1/2 is
    * the one exponent with an EXACT integer form ([[isqrt]]), so the
    * whole operator stays on the engine's integer-ppm grid:
    *
    *   u_s        = isqrt(tokens_s)
    *   w_s (ppm)  = u_s * 10^6 div sum(u)
    *
    * and the budget/rate/keep machinery is [[sample]]'s, unchanged.
    * The weight table is source-sized and broadcast; the corpus side
    * adds nothing beyond the per-source aggregate it already pays. */
  def temperatureSummary(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budgetPpm: Long): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).as("tokens"))
    val tot = tok.groupBy(col("source"))
      .agg(sum(col("tokens")).as("st"))
      .withColumn("u", isqrt(col("st")))
    val grand = tot.agg(sum(col("st")).as("t"), sum(col("u")).as("su"))
    val rates = tot.crossJoin(broadcast(grand))
      .withColumn("w", expr(s"u * $Ppm div su"))
      .withColumn("rate",
        least(lit(Ppm),
          expr(s"((t * $budgetPpm div $Ppm) * w div $Ppm) * $Ppm div st")))
      .select(col("source"), col("w"), col("rate"))
    tok.join(broadcast(rates), Seq("source"))
      .filter(Dedup.md5Hash32(col("doc_id").cast("string"), "mix:")
        % Ppm < col("rate"))
      .groupBy(col("source"))
      .agg(max(col("w")).as("w_ppm"),
        max(col("rate")).as("rate_ppm"),
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tokens_kept"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of [[temperatureSummary]]. */
  def temperatureSummarySql(docsRel: String, budgetPpm: Long): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    ${TextAnalysis.tokenCountSql("text")} AS tokens
       |  FROM $docsRel),
       |tot AS (
       |  SELECT source, sum(tokens) AS st,
       |    ${isqrtSql("sum(tokens)")} AS u
       |  FROM tok GROUP BY 1),
       |g AS (SELECT sum(st) AS t, sum(u) AS su FROM tot),
       |r AS (
       |  SELECT source, st, u * $Ppm // g.su AS w,
       |    least($Ppm,
       |      (((g.t * $budgetPpm) // $Ppm) * (u * $Ppm // g.su) // $Ppm)
       |        * $Ppm // st) AS rate
       |  FROM tot, g),
       |k AS (
       |  SELECT tok.source, tok.tokens, r.w, r.rate
       |  FROM tok JOIN r USING (source)
       |  WHERE ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "mix:")}
       |    % $Ppm < r.rate)
       |SELECT source, CAST(max(w) AS BIGINT) AS w_ppm,
       |  CAST(max(rate) AS BIGINT) AS rate_ppm,
       |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens_kept
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of [[summary]]. `weightCaseSql` must mirror the
    * weights map (CASE source ... END, BIGINT). */
  def summarySql(
      docsRel: String,
      weightCaseSql: String,
      budgetPpm: Long): String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    ${TextAnalysis.tokenCountSql("text")} AS tokens
       |  FROM $docsRel),
       |tot AS (SELECT source, sum(tokens) AS st FROM tok GROUP BY 1),
       |g AS (SELECT sum(st) AS t FROM tot),
       |r AS (
       |  SELECT source, st, $weightCaseSql AS w,
       |    least($Ppm,
       |      (((g.t * $budgetPpm) // $Ppm) * $weightCaseSql // $Ppm)
       |        * $Ppm // st) AS rate
       |  FROM tot, g),
       |k AS (
       |  SELECT tok.source, tok.tokens, r.w, r.rate
       |  FROM tok JOIN r USING (source)
       |  WHERE ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "mix:")}
       |    % $Ppm < r.rate)
       |SELECT source, CAST(max(w) AS BIGINT) AS w_ppm,
       |  CAST(max(rate) AS BIGINT) AS rate_ppm,
       |  count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens_kept
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** EPOCH-REPETITION mixing — the UP-sampling half of a mix recipe
    * ([[sample]] clamps rates at 1.0 by design). A Dolma/LLaMA-style
    * recipe names epochs per source ("wiki x2.5, web x0.4"): each doc
    * is emitted `floor(epochs)` times unconditionally, plus one more
    * copy admitted by the deterministic per-DOC hash draw
    * `md5("ep:" + id) % 10^6 < epochs_ppm % 10^6` — so a 2.5-epoch
    * source repeats every doc twice and half its docs (a fixed,
    * reproducible half) a third time. Epochs below 1.0 degenerate to a
    * plain hash-sample, 0 drops the source, and an integral epoch
    * count emits exactly that many copies (the fractional draw is
    * against 0 and never fires).
    *
    * Row-local end to end: one `sequence` fan-out per row, no shuffle,
    * no per-source state beyond the broadcast-free CASE on the weight
    * map. `copy_idx` rides along so downstream shuffling/packing can
    * distinguish copies ((id, copy_idx) is the unique row key) and so
    * repetition stays auditable in the published corpus. */
  def epochMix(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      epochsPpm: Map[String, Long],
      defaultPpm: Long): DataFrame = {
    // a negative epoch count would make `sequence` count DOWN (Spark
    // infers step -1) and emit phantom negative copy indexes before the
    // admission filter drops them — refuse it at the API instead
    require((epochsPpm.values.toSeq :+ defaultPpm).forall(_ >= 0L),
      s"epochs must be non-negative ppm (got $epochsPpm, " +
        s"default $defaultPpm)")
    val full = expr(s"__eps div $Ppm")
    docs
      .withColumn("__eps",
        weightCol(col(sourceCol), epochsPpm, defaultPpm))
      .withColumn("copy_idx", explode(sequence(lit(0L), full)))
      .filter(col("copy_idx") < full ||
        Dedup.md5Hash32(col(idCol).cast("string"), "ep:") % Ppm <
          col("__eps") % Ppm)
      .drop("__eps")
  }

  /** DuckDB twin of [[epochMix]] (projects id, source, copy_idx).
    * `epochsCaseSql` must mirror the epochs map. */
  def epochMixSql(docsRel: String, epochsCaseSql: String): String =
    s"""WITH e AS (
       |  SELECT doc_id, source, $epochsCaseSql AS eps FROM $docsRel),
       |x AS (
       |  SELECT doc_id, source, eps,
       |    unnest(range(0, eps // $Ppm + 1)) AS copy_idx
       |  FROM e)
       |SELECT doc_id, source, CAST(copy_idx AS BIGINT) AS copy_idx
       |FROM x
       |WHERE copy_idx < eps // $Ppm
       |   OR ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "ep:")}
       |     % $Ppm < eps % $Ppm""".stripMargin
}
