package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q

/** Fourth-wave surface: the C4 cleaning battery (the second canonical
  * published corpus filter, next to gopher_rules), arbitrary-size
  * blocklist filtering as a broadcast inverted-gram join, count-min
  * point-frequency sketches (completing the mergeable-sketch family),
  * and a one-pass ANALYZE-style table profiler built on the sketch
  * surface. Every entry carries a DuckDB oracle.
  */
object WaveFourQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "documents"))

  // ---- C4 fixture ----------------------------------------------------
  // The synthetic corpus is single-line and punctuation-free, so every
  // C4 line rule would fire identically on every row (the degeneracy
  // trap: a flag that never varies gates nothing). The fixture wraps
  // each document in a deterministic page: a headline that always fails
  // the terminal-punctuation rule, the body as one proper sentence, and
  // residue lines keyed off doc_id so each C4 rule fires on a distinct,
  // overlapping subset (javascript %3, short-line %5, lorem ipsum %7,
  // curly brace %11, badword %13 — multiples of 15 lose enough lines to
  // fail the three-sentence floor).

  /** Badword stand-ins planted by the fixture (the published filter's
    * list is caller-supplied data, see [[graft.analysis.C4Rules]]). */
  val C4Badwords: Seq[String] = Seq("badword1", "badword2")

  private def c4Docs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(docs(s, dir)).select(col("doc_id"),
      concat_ws("\n",
        lit("Example Corp Daily Bulletin"),
        concat(col("text"), lit(".")),
        when(col("doc_id") % 3 === 0,
          lit("Please enable javascript to continue."))
          .otherwise(lit("The committee approved the final budget today.")),
        when(col("doc_id") % 5 === 0, lit("Buy now."))
          .otherwise(lit("We hope you enjoyed reading this report.")),
        when(col("doc_id") % 7 === 0,
          lit("It contains lorem ipsum filler text."))
          .otherwise(lit("All rights reserved")),
        when(col("doc_id") % 11 === 0, lit("return { }"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit("Unfortunately badword1 appears here today."))
          .otherwise(lit("Thank you for reading the bulletin."))).as("text"))

  // NOTE: interpolated into stripMargin'd oracle strings — no line may
  // begin with '|' (the outer stripMargin would eat the first pipe of
  // a leading '||'), so every concat operator ends its line instead
  private val c4DocsSql =
    """(SELECT doc_id,
      |  'Example Corp Daily Bulletin' || chr(10) ||
      |  text || '.' || chr(10) ||
      |  CASE WHEN doc_id % 3 = 0 THEN 'Please enable javascript to continue.'
      |       ELSE 'The committee approved the final budget today.' END ||
      |  chr(10) ||
      |  CASE WHEN doc_id % 5 = 0 THEN 'Buy now.'
      |       ELSE 'We hope you enjoyed reading this report.' END ||
      |  chr(10) ||
      |  CASE WHEN doc_id % 7 = 0 THEN 'It contains lorem ipsum filler text.'
      |       ELSE 'All rights reserved' END ||
      |  chr(10) ||
      |  CASE WHEN doc_id % 11 = 0 THEN 'return { }' ELSE '' END ||
      |  chr(10) ||
      |  CASE WHEN doc_id % 13 = 0
      |       THEN 'Unfortunately badword1 appears here today.'
      |       ELSE 'Thank you for reading the bulletin.' END AS text
      | FROM documents)""".stripMargin

  // ---- blocklist fixture ---------------------------------------------
  // Unigram and bigram phrase entries; suffixes planted on overlapping
  // doc_id classes (doc 0 carries all three — the multi-match case).

  /** The blocklist relation: word and two-word phrase entries. */
  val BlocklistTerms: Seq[String] =
    Seq("badword1", "paywall", "click here", "free casino")

  private def blockDocs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(docs(s, dir)).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 9 === 0, lit(" please click here now"))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 0, lit(" absolutely free casino tonight"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(" behind the paywall"))
          .otherwise(lit(""))).as("text"))

  // same no-leading-pipe rule as c4DocsSql (double-stripMargin hazard)
  private val blockDocsSql =
    """(SELECT doc_id, text ||
      |  CASE WHEN doc_id % 9 = 0 THEN ' please click here now'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 10 = 0 THEN ' absolutely free casino tonight'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0 THEN ' behind the paywall'
      |       ELSE '' END AS text
      | FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // the C4 cleaning battery (Raffel et al. 2020): line-level
    // retention + page-level gates as one whole-stage-codegen map —
    // zero shuffle, zero UDF, scan-speed at 100 TB (graft.analysis
    // .C4Rules has the rule-by-rule derivation notes)
    Q("c4_rules", (s, dir) => {
      import graft.analysis.C4Rules
      val fs = C4Rules.flags(col("text"), C4Badwords)
      c4Docs(s, dir).select(col("doc_id") +:
          C4Rules.retained(col("text")).as("retained_text") +:
          fs.map { case (n, c) => c.as(n) } :+
          C4Rules.pass(col("text"), C4Badwords).as("pass"): _*)
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.C4Rules
      val fs = C4Rules.oracleFlagsSql(C4Badwords)
      s"""SELECT doc_id,
         |  ${C4Rules.retainedSql} AS retained_text,
         |  ${fs.map { case (n, sql) => s"$sql AS $n" }.mkString(",\n  ")},
         |  ${fs.map(_._2).mkString("(", " AND ", ")")} AS pass
         |FROM $c4DocsSql
         |ORDER BY doc_id""".stripMargin
    }),

    // arbitrary-size blocklist filtering — the scale path for badword /
    // banned-phrase lists too large for a per-row literal: explode each
    // page's unigrams+bigrams once, broadcast-hash-join the blocklist
    // (model-sized build side, corpus side never shuffles), aggregate
    // the matched rows only (cardinality = matches, not corpus), then
    // join the match summary back. Phrase entries match as token
    // bigrams, so punctuation/whitespace variants canonicalize away.
    Q("blocklist_filter", (s, dir) => {
      import s.implicits._
      val bl = BlocklistTerms.toDF("term")
      val toks = blockDocs(s, dir).select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
          .as("w"))
      // w is a projected attribute, so lambda bodies may reference it
      // freely (no per-element re-evaluation — see Dedup.shingles)
      val bigrams = filter(
        zip_with(col("w"), slice(col("w"), lit(2), size(col("w"))),
          (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
        g => g.isNotNull)
      val matches = toks
        .select(col("doc_id"), explode(concat(col("w"), bigrams)).as("g"))
        .join(broadcast(bl), col("g") === col("term"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("term"))).as("terms"))
      blockDocs(s, dir).join(matches, Seq("doc_id"), "left")
        .select(col("doc_id"), col("terms").isNotNull.as("blocked"),
          coalesce(array_join(col("terms"), ","), lit(""))
            .as("blocked_terms"))
        .orderBy(col("doc_id"))
    }, Some {
      val bl = BlocklistTerms.map(t => s"('$t')").mkString(", ")
      s"""WITH b AS $blockDocsSql,
         |toks AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM b),
         |grams AS (
         |  SELECT doc_id, unnest(w) AS g FROM toks
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i + 1])) AS g FROM toks),
         |bl(term) AS (VALUES $bl),
         |m AS (SELECT doc_id,
         |    array_to_string(list_sort(list(DISTINCT term)), ',') AS terms
         |  FROM grams JOIN bl ON g = term GROUP BY doc_id)
         |SELECT b.doc_id, m.doc_id IS NOT NULL AS blocked,
         |  coalesce(m.terms, '') AS blocked_terms
         |FROM b LEFT JOIN m ON b.doc_id = m.doc_id
         |ORDER BY b.doc_id""".stripMargin
    }),

    // count-min point frequencies — the sketch-family member for "how
    // often did THIS key occur" without shuffling the key space: one
    // sketch per partition, byte-merge union, probe the model-sized
    // table. merge_consistent proves the counter table is IDENTICAL
    // (byte-for-byte) under two different partitionings — the
    // order-freedom HLL's HIP estimator lacks. Estimates are exact
    // unless a probe collides in all Depth rows (see CmsSketchOps
    // determinism contract); the exact-count oracle pins that regime.
    Q("q_cms_counts", (s, dir) => {
      import s.implicits._
      import graft.functions.CmsSketchOps
      val keys = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
        .select(col("l_partkey")).as[Long]
      val a = CmsSketchOps.sketch(keys)
      val b = CmsSketchOps.sketch(keys.repartition(7, col("l_partkey")))
      val consistent = java.util.Arrays.equals(a, b)
      (1L to 20L).map(k => (k, CmsSketchOps.estimate(a, k), consistent))
        .toDF("probe_key", "est_count", "merge_consistent")
        .orderBy(col("probe_key"))
    }, Some(
      """SELECT p.k AS probe_key,
        |  (SELECT count(*) FROM lineitem l WHERE l.l_partkey = p.k)
        |    AS est_count,
        |  true AS merge_consistent
        |FROM range(1, 21) p(k) ORDER BY probe_key""".stripMargin)),

    // one-pass ANALYZE-style table profile on the sketch surface: a
    // single wide aggregate computes count/nulls/min/max for EVERY
    // column at once (no expand — Spark's multi-count(DISTINCT) planner
    // rewrite multiplies rows by column count; theta NDV avoids it),
    // then one column-pruned scan per column feeds the mergeable theta
    // NDV (exact below 2^16 distinct — the test regime; published
    // bounded error past it). String/double keys enter the sketch via
    // xxhash64 — an engine-local collision trade on an internal key,
    // the substring-family precedent. Driver materializes ONE wide row
    // plus one model-sized sketch per column.
    Q("table_profile", (s, dir) => {
      import s.implicits._
      import graft.functions.ThetaSketchOps
      val cols = Seq("l_linestatus", "l_partkey", "l_quantity",
        "l_returnflag", "l_suppkey")
      val li = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c")))
      val row = li.groupBy().agg(count(lit(1)).as("n_rows"),
        aggs: _*).head()
      val nRows = row.getAs[Long]("n_rows")
      cols.map { c =>
        val keys = li.filter(col(c).isNotNull)
          .select(xxhash64(col(c))).as[Long]
        val ndv =
          Math.round(ThetaSketchOps.estimate(ThetaSketchOps.sketch(keys)))
        (c, nRows, nRows - row.getAs[Long](s"cnt_$c"), ndv,
          row.getAs[String](s"min_$c"), row.getAs[String](s"max_$c"))
      }.toDF("col_name", "n_rows", "n_nulls", "ndv", "min_value",
          "max_value")
        .orderBy(col("col_name"))
    }, Some {
      val cols = Seq("l_linestatus", "l_partkey", "l_quantity",
        "l_returnflag", "l_suppkey")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS ndv,
           |  min($c)::VARCHAR AS min_value,
           |  max($c)::VARCHAR AS max_value
           |FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }),
  )
}
