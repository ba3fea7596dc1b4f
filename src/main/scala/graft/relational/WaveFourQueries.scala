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

  /** The C4 page for a document: headline + body sentence + residue
    * lines keyed off `key` (normally doc_id; the dup-funnel corpus
    * keys on doc_id % 100000 so planted twins get IDENTICAL pages). */
  private def c4Page(text: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("\n",
      lit("Example Corp Daily Bulletin"),
      concat(text, lit(".")),
      when(key % 3 === 0,
        lit("Please enable javascript to continue."))
        .otherwise(lit("The committee approved the final budget today.")),
      when(key % 5 === 0, lit("Buy now."))
        .otherwise(lit("We hope you enjoyed reading this report.")),
      when(key % 7 === 0,
        lit("It contains lorem ipsum filler text."))
        .otherwise(lit("All rights reserved")),
      when(key % 11 === 0, lit("return { }"))
        .otherwise(lit("")),
      when(key % 13 === 0,
        lit("Unfortunately badword1 appears here today."))
        .otherwise(lit("Thank you for reading the bulletin.")))

  private def c4Docs(s: SparkSession, dir: String): DataFrame =
    Scale.spreadIfNarrow(docs(s, dir)).select(col("doc_id"),
      c4Page(col("text"), col("doc_id")).as("text"))

  // NOTE: interpolated into stripMargin'd oracle strings — no line may
  // begin with '|' (the outer stripMargin would eat the first pipe of
  // a leading '||'), so every concat operator ends its line instead
  private def c4PageSql(key: String): String =
    s"""'Example Corp Daily Bulletin' || chr(10) ||
       |  text || '.' || chr(10) ||
       |  CASE WHEN $key % 3 = 0 THEN 'Please enable javascript to continue.'
       |       ELSE 'The committee approved the final budget today.' END ||
       |  chr(10) ||
       |  CASE WHEN $key % 5 = 0 THEN 'Buy now.'
       |       ELSE 'We hope you enjoyed reading this report.' END ||
       |  chr(10) ||
       |  CASE WHEN $key % 7 = 0 THEN 'It contains lorem ipsum filler text.'
       |       ELSE 'All rights reserved' END ||
       |  chr(10) ||
       |  CASE WHEN $key % 11 = 0 THEN 'return { }' ELSE '' END ||
       |  chr(10) ||
       |  CASE WHEN $key % 13 = 0
       |       THEN 'Unfortunately badword1 appears here today.'
       |       ELSE 'Thank you for reading the bulletin.' END""".stripMargin

  private def c4DocsSql =
    s"""(SELECT doc_id,
       |  ${c4PageSql("doc_id")} AS text
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

  // ---- C4 funnel corpus ----------------------------------------------
  // docsWithDups-shaped (first 5 docs twinned at +100000), pages keyed
  // on doc_id % 100000 so each twin's page is byte-identical to its
  // original — the exact-dedup stage of the funnel has real prey.

  private def c4DupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val dd = d.unionAll(d.filter(col("doc_id") < 5)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    Scale.spreadIfNarrow(dd).select(col("doc_id"),
      c4Page(col("text"), col("doc_id") % 100000).as("text"))
  }

  private def c4DupDocsSql =
    s"""(SELECT doc_id,
       |  ${c4PageSql("(doc_id % 100000)")} AS text
       | FROM (SELECT doc_id, text FROM documents
       |       UNION ALL
       |       SELECT doc_id + 100000 AS doc_id, text FROM documents
       |       WHERE doc_id < 5) __dd)""".stripMargin

  /** join_skew_probe reporting floor: the structural per-key average of
    * the synthetic lineitem is 30 rows at EVERY SF (rows and keys scale
    * together), so 1.5x that is a fixed threshold that demonstrably
    * binds at each SF (2 / 16 / 138 keys at sf0.001/0.01/0.1). */
  val SkewMinCount = 45L

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
      val probe = CmsSketchOps.prober(a) // one deserialize, 20 probes
      (1L to 20L).map(k => (k, probe(k), consistent))
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
      // ALL columns' NDV sketches from ONE scan (the ANALYZE shape):
      // each row carries its 5 column hashes, every partition folds
      // them into 5 exact-mode sketches at once. A null cell maps to
      // the sentinel in-plan (xxhash64 of a null COLUMN returns the
      // seed, not null — the when() guard is load-bearing).
      val NullSentinel = Long.MinValue + 7
      val hashed = li.select(array(cols.map(c =>
          when(col(c).isNotNull, xxhash64(col(c)))
            .otherwise(lit(NullSentinel))): _*).as("hs"))
        .as[Seq[Long]]
      val sketches =
        ThetaSketchOps.sketchColumns(hashed, cols.size, NullSentinel)
      cols.zipWithIndex.map { case (c, i) =>
        val ndv = Math.round(ThetaSketchOps.estimate(sketches(i)))
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

    // pre-flight join-skew diagnostic — the two-sketch pattern: Misra-
    // Gries NOMINATES the keys that would concentrate a shuffle
    // partition (no-false-negatives guarantee), count-min CONFIRMS each
    // candidate's frequency — independent DERIVATIONS (different
    // algorithms + hash families) folded from ONE shared scan of the
    // fact keys (SkewProbe.sketchBoth; the old two-pass shape read the
    // fact table twice for the same pair of model-sized sketches).
    // Neither sketch shuffles the key space — the 100 TB alternative
    // to `GROUP BY key` over the fact table before deciding on salting
    // / skew-join hints. Both sketches sit in their exact regime at
    // the gate SFs (MG map sized to the 20k-key sf0.1 cardinality) —
    // requireExact enforces it, so the oracle is plain GROUP BY.
    Q("join_skew_probe", (s, dir) => {
      import s.implicits._
      import graft.functions.{CmsSketchOps, FreqSketchOps, SkewProbe}
      val li = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
      val keys = li.select(col("l_partkey")).as[Long]
      val (mgRaw, cms) = SkewProbe.sketchBoth(keys, lgMaxMapSize = 15)
      val mg = FreqSketchOps.requireExact(mgRaw, "join_skew_probe")
      val total = CmsSketchOps.totalCount(cms)
      val cmsProbe = CmsSketchOps.prober(cms) // one deserialize, n probes
      FreqSketchOps.heavyHitters(mg)
        .filter { case (_, est, _, _) => est >= SkewMinCount }
        .map { case (k, est, _, _) =>
          (k.toLong, est, cmsProbe(k.toLong),
            est * 1000000L / total)
        }
        .sortBy(_._1)
        .toDF("key", "mg_count", "cms_count", "share_ppm")
        .orderBy(col("key"))
    }, Some(
      s"""SELECT l_partkey AS key, count(*) AS mg_count,
         |  count(*) AS cms_count,
         |  CAST(count(*) * 1000000
         |    // (SELECT count(*) FROM lineitem) AS BIGINT) AS share_ppm
         |FROM lineitem GROUP BY 1 HAVING count(*) >= $SkewMinCount
         |ORDER BY key""".stripMargin)),

    // money aggregation at scale — the revenue-sum discipline: the
    // only float operation is the per-row product (IEEE-identical in
    // both engines), rounded ONCE onto the integer micro-currency grid
    // (the decimal product has <= 4dp, so x*1e4 sits ulps from an
    // integer — never on a rounding half); all aggregation is exact
    // bigint. Share-of-total is a broadcast one-row join (BNLJ) + an
    // integer basis-point quotient — no window, no second scan. At
    // 100 TB the micro-grid also sidesteps decimal-aggregate overflow
    // checks while staying exact (bounds documented: 1e18 << 2^63).
    Q("q_promo_revenue", (s, dir) => {
      val li = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
      val p = s.read.parquet(t(dir, "part"))
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 10000).cast("long")
      val byType = li.join(broadcast(p),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_type"), rev.as("rev_micro"))
        .groupBy(col("p_type"))
        .agg(sum(col("rev_micro")).as("revenue_micro"))
      val total = byType.agg(sum(col("revenue_micro")).as("total_micro"))
      byType.crossJoin(broadcast(total))
        .select(col("p_type"), col("revenue_micro"),
          expr("revenue_micro * 10000 div total_micro").as("share_bp"))
        .orderBy(col("p_type"))
    }, Some(
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT) AS rev_micro
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |bt AS (SELECT p_type, CAST(sum(rev_micro) AS BIGINT)
        |    AS revenue_micro FROM j GROUP BY 1)
        |SELECT p_type, revenue_micro,
        |  CAST(revenue_micro * 10000
        |    // (SELECT CAST(sum(revenue_micro) AS BIGINT) FROM bt)
        |    AS BIGINT) AS share_bp
        |FROM bt ORDER BY p_type""".stripMargin)),

    // the WHOLE published C4 recipe end-to-end over a twinned page
    // corpus: line filter -> page gates -> blocklist join -> exact
    // dedup among survivors (min-id winner per md5 fingerprint of the
    // RETAINED text — twins collapse because their pages are keyed on
    // doc_id % 100000). One checkpointed corpus feeds all stages; the
    // blocklist and dedup joins touch survivors only.
    Q("corpus_curate_c4", (s, dir) => {
      import s.implicits._
      import graft.analysis.{C4Rules, TextAnalysis}
      val pages = c4DupDocs(s, dir).localCheckpoint()
      val base = pages.select(col("doc_id"),
        C4Rules.retained(col("text")).as("retained"),
        C4Rules.pass(col("text"), C4Badwords).as("c4_pass"))
        .localCheckpoint()
      val bl = BlocklistTerms.toDF("term")
      val toks = base.select(col("doc_id"),
        regexp_extract_all(lower(col("retained")), lit("[a-z0-9]+"),
          lit(0)).as("w"))
      val bigrams = filter(
        zip_with(col("w"), slice(col("w"), lit(2), size(col("w"))),
          (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
        g => g.isNotNull)
      val blockedIds = toks
        .select(col("doc_id"), explode(concat(col("w"), bigrams)).as("g"))
        .join(broadcast(bl), col("g") === col("term"))
        .select(col("doc_id")).distinct()
        .withColumn("bl_hit", lit(true))
      val flagged = base.join(blockedIds, Seq("doc_id"), "left")
        .select(col("doc_id"), col("retained"), col("c4_pass"),
          coalesce(col("bl_hit"), lit(false)).as("blocked"))
      val winners = flagged.filter(col("c4_pass") && !col("blocked"))
        .groupBy(TextAnalysis.fingerprint(col("retained")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).withColumn("win", lit(true))
      flagged.join(winners, Seq("doc_id"), "left")
        .select(col("doc_id"), col("c4_pass"), col("blocked"),
          coalesce(col("win"), lit(false)).as("dup_winner"),
          (col("c4_pass") && !col("blocked") &&
            coalesce(col("win"), lit(false))).as("kept"),
          size(regexp_extract_all(col("retained"), lit("\\S+"), lit(0)))
            .cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }, Some {
      import graft.analysis.{C4Rules, TextAnalysis}
      val fs = C4Rules.oracleFlagsSql(C4Badwords)
      val bl = BlocklistTerms.map(t => s"('$t')").mkString(", ")
      s"""WITH pages AS $c4DupDocsSql,
         |base AS (SELECT doc_id,
         |    ${C4Rules.retainedSql} AS retained,
         |    ${fs.map(_._2).mkString("(", " AND ", ")")} AS c4_pass
         |  FROM pages),
         |toks AS (SELECT doc_id,
         |    regexp_extract_all(lower(retained), '[a-z0-9]+') AS w
         |  FROM base),
         |grams AS (
         |  SELECT doc_id, unnest(w) AS g FROM toks
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i + 1])) AS g FROM toks),
         |bl(term) AS (VALUES $bl),
         |blocked AS (SELECT DISTINCT doc_id FROM grams
         |  JOIN bl ON g = term),
         |flagged AS (SELECT b.doc_id, retained, c4_pass,
         |    k.doc_id IS NOT NULL AS blocked
         |  FROM base b LEFT JOIN blocked k ON b.doc_id = k.doc_id),
         |winners AS (SELECT min(doc_id) AS doc_id FROM flagged
         |  WHERE c4_pass AND NOT blocked
         |  GROUP BY ${TextAnalysis.fingerprintSql("retained")})
         |SELECT f.doc_id, c4_pass, blocked,
         |  w.doc_id IS NOT NULL AS dup_winner,
         |  (c4_pass AND NOT blocked AND w.doc_id IS NOT NULL) AS kept,
         |  len(regexp_extract_all(retained, '\\S+')) AS n_tokens
         |FROM flagged f LEFT JOIN winners w ON f.doc_id = w.doc_id
         |ORDER BY f.doc_id""".stripMargin
    }),
  )
}
