package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the overlap check every LLM training
  * pipeline runs before a corpus ships: flag training documents that
  * share word n-grams with an evaluation/benchmark set (the GPT-3
  * appendix-C / PaLM procedure, with the n-gram order as the knob).
  *
  * Scale shape: the asymmetry IS the design. A benchmark is MB-sized
  * against a 100 TB corpus, so its distinct-gram set broadcasts —
  * corpus-side work is a row-local split→gram→distinct projection, a
  * narrow explode, one BROADCAST hash join (no shuffle of the corpus),
  * and a single map-side-combined groupBy on doc_id whose shuffle
  * volume is one row per contaminated document. `n_grams` rides the
  * explode so no second doc-keyed join is needed.
  *
  * Gram order 4 here (the gate corpus is short synthetic docs); real
  * deployments use 8-13 — the plan shape is order-independent.
  */
object Decontaminate {

  val GramSize = 4

  /** Word 4-gram array of a single-space-tokenized text column; the
    * split binds once as a lambda variable (same non-quadratic pattern
    * as [[graft.dedup.Dedup.shingles]] — Catalyst does not CSE into
    * lambda bodies). */
  def grams(text: Column): Column =
    element_at(
      transform(array(split(text, " ")), ws =>
        when(size(ws) < GramSize, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(ws) - (GramSize - 1)),
            i => concat_ws("|", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2), element_at(ws, i + 3))))),
      1)

  /** Contamination report: (doc_id, n_overlap, n_grams,
    * contamination_ppm) for every corpus document sharing at least
    * one gram with the eval set. `evalDocs`/`corpusDocs` carry
    * (doc_id, text). The share ships as an exact integer —
    * floor(n_overlap * 1e6 / n_grams) parts-per-million — per the repo
    * rounding rule: n_grams is data-dependent, so a power-of-two gram
    * count makes `round(x, 4)` hit structural half-way ties where
    * Spark HALF_UP and another engine may legally diverge. */
  def report(corpusDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val ev = evalDocs
      .select(explode(array_distinct(grams(col("text")))).as("g"))
      .distinct()
    val cg = graft.relational.Scale.spreadIfNarrow(corpusDocs)
      .select(col("doc_id"), array_distinct(grams(col("text"))).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("g"))
    cg.join(broadcast(ev), Seq("g"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"), col("n_grams"),
        expr("(n_overlap * 1000000L) div n_grams")
          .as("contamination_ppm"))
  }

  /** Span-level contamination (the Lee et al. 2022 exact-substring
    * spirit applied to word grams): the maximal token spans of each
    * corpus document covered by eval-overlapping grams — WHERE the
    * contamination sits, not just how much. A hit at 1-based token
    * position p covers tokens [p, p+GramSize-1]; hits whose coverages
    * overlap or touch (next_pos - prev_pos <= GramSize) merge into one
    * span. Output (doc_id, span_start, span_end, span_tokens, n_hits),
    * inclusive 1-based token positions, all exact integers.
    *
    * Scale shape: identical broadcast asymmetry to [[report]] — the
    * position column rides the same corpus-side explode, and the only
    * new exchange is a doc_id-PARTITIONED window over HIT rows only
    * (contaminated docs' matching positions, a vanishing fraction of
    * the corpus; never a partitionless window).
    */
  def reportSpans(corpusDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val ev = evalDocs
      .select(explode(array_distinct(grams(col("text")))).as("g"))
      .distinct()
    val cp = graft.relational.Scale.spreadIfNarrow(corpusDocs)
      .select(col("doc_id"), posexplode(grams(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("g"))
    val hits = cp.join(broadcast(ev), Seq("g")).select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val islands = hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= GramSize, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("island", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (GramSize - 1)).as("span_end"),
        (max(col("pos")) - min(col("pos")) + GramSize).as("span_tokens"),
        count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_tokens"), col("n_hits"))
  }

  /** DuckDB twin of [[reportSpans]]: positions ride a parallel unnest
    * (DuckDB zips same-SELECT unnests; range is end-exclusive so both
    * lists have length len(ws)-GramSize+1), then the same
    * gaps-and-islands window. First row's lag is NULL, so the CASE
    * falls to ELSE 1 — matching Spark's when(...).otherwise(1). */
  def spansOracle(docsRel: String, evalPred: String, corpusPred: String): String = {
    val gram = (1 to GramSize).map(o => s"ws[i+${o - 1}]").mkString(" || '|' || ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT DISTINCT
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT string_split(text, ' ') AS ws
       |        FROM $docsRel WHERE $evalPred) __e
       |  WHERE len(ws) >= $GramSize),
       |cg AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(range(1, len(ws) - ${GramSize - 2})) AS pos,
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM $docsRel WHERE $corpusPred) __c
       |  WHERE len(ws) >= $GramSize),
       |hits AS MATERIALIZED (
       |  SELECT cg.doc_id, cg.pos FROM cg JOIN ev USING (g)),
       |brk AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              <= $GramSize THEN 0 ELSE 1 END AS brk
       |  FROM hits),
       |isl AS (
       |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS UNBOUNDED PRECEDING) AS island
       |  FROM brk)
       |SELECT doc_id, min(pos) AS span_start,
       |  max(pos) + ${GramSize - 1} AS span_end,
       |  max(pos) - min(pos) + $GramSize AS span_tokens,
       |  count(*) AS n_hits
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** The contaminated-doc-set CTE chain alone, over two ALREADY-BUILT
    * relations (each carrying doc_id, text) — the composable form the
    * corpus_ship funnel wires between its scrub and pack stages. CTE
    * names are dc_-prefixed so the chain coexists with the minhash/
    * simhash chains inside one WITH. Ends in `dc_cont(doc_id)`: every
    * corpus doc sharing >= 1 word GramSize-gram with the eval side —
    * the SQL twin of `report(corpus, eval).select("doc_id")`. */
  def contaminatedCtes(corpusRel: String, evalRel: String): String = {
    val gram = (1 to GramSize).map(o => s"ws[i+${o - 1}]").mkString(" || '|' || ")
    s"""dc_ev AS MATERIALIZED (
       |  SELECT DISTINCT
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT string_split(text, ' ') AS ws FROM $evalRel) __de
       |  WHERE len(ws) >= $GramSize),
       |dc_cg AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM $corpusRel) __dc
       |  WHERE len(ws) >= $GramSize),
       |dc_cont AS (
       |  SELECT DISTINCT dc_cg.doc_id FROM dc_cg JOIN dc_ev USING (g))"""
      .stripMargin
  }

  /** DuckDB twin: same tokenization (string_split on a single space),
    * same gram joiner, same distinct-set semantics. `evalPred` /
    * `corpusPred` partition the documents relation into the two sides.
    * Multiply-referenced CTEs are MATERIALIZED per the repo rule. */
  def oracle(docsRel: String, evalPred: String, corpusPred: String): String = {
    val gram = (1 to GramSize).map(o => s"ws[i+${o - 1}]").mkString(" || '|' || ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT DISTINCT
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT string_split(text, ' ') AS ws
       |        FROM $docsRel WHERE $evalPred) __e
       |  WHERE len(ws) >= $GramSize),
       |cg AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    unnest([$gram for i in range(1, len(ws) - ${GramSize - 2})]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM $docsRel WHERE $corpusPred) __c
       |  WHERE len(ws) >= $GramSize),
       |n AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id),
       |o AS (SELECT cg.doc_id, count(*) AS n_overlap
       |      FROM cg JOIN ev USING (g) GROUP BY cg.doc_id)
       |SELECT o.doc_id, n_overlap, n_grams,
       |  n_overlap * 1000000 // n_grams AS contamination_ppm
       |FROM o JOIN n ON o.doc_id = n.doc_id
       |ORDER BY o.doc_id""".stripMargin
  }
}
