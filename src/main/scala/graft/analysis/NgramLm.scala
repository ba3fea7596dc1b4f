package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model with add-one smoothing, trained on
  * a corpus split and scoring every document by cross-entropy — the
  * published LM-quality-filter recipe (CCNet, Wenzek et al. 2020, uses
  * a KenLM n-gram model's perplexity exactly this way; GPT-3 and Gopher
  * both describe LM-based quality scores). Training is two integer
  * aggregations over the train split's bigrams; scoring is one
  * vocab-sized join per n-gram order against the corpus bigrams.
  *
  * Hash-exactness discipline (the KMeans/perceptron pattern applied to
  * a float formula): each bigram's log-probability is rounded ONCE onto
  * a fixed 1e-6 grid and cast to int64 ("micro-nats"), so the per-doc
  * aggregation is an INTEGER sum — exact and order-independent, immune
  * to float-summation-order divergence between engines. The only float
  * step shared with the oracle is one `ln` + `round` per distinct
  * (bigram, context) pair, the same per-row rounding contract
  * `tfidf_top_terms` already relies on.
  *
  * Model shape at scale: bigram/context/vocab tables are vocab-sized,
  * not corpus-sized; the corpus relation they join carries (doc_id,
  * pair) only. No driver state, no collect.
  */
object NgramLm {

  /** Sentence-start marker: space-free, cannot collide with `[a-z]+`
    * tokens. */
  val Start = "<s>"

  /** Adjacent-token pair strings ("w1 w2", [[Start]] prepended) of one
    * document. Token-less documents yield no pairs (and so no score
    * row) — matching the oracle's `range` semantics. */
  def pairs(text: Column): Column =
    // token array bound ONCE as a lambda variable (the Dedup.shingles
    // idiom): element_at over the raw concat+regexp would re-tokenize
    // the document for every pair (no CSE into lambda bodies)
    element_at(
      transform(
        array(concat(array(lit(Start)),
          regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)))),
        a => when(size(a) >= 2,
          transform(sequence(lit(1), size(a) - 1),
            i => concat(element_at(a, i), lit(" "),
              element_at(a, i + 1))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Train on `docs(doc_id, text)` rows with even doc_id, score ALL
    * documents: (doc_id, n_bigrams, xent) where xent is the add-one
    * smoothed bigram cross-entropy in nats, 4 decimals. */
  def fitScore(docs: DataFrame): DataFrame =
    fitScoreUnits(docs, Seq("doc_id"), col("doc_id") % 2 === 0)

  /** [[fitScore]] generalized to arbitrary SCORING UNITS — the CCNet
    * recipe actually filters PARAGRAPHS, not documents, so the unit
    * key is caller-defined: `units(idCols..., text)`, one row per
    * unit; `trainPred` selects the training rows (evaluated on the
    * unit row, e.g. `doc_id % 2 === 0` trains on even DOCUMENTS even
    * when units are that document's paragraphs). Output: (idCols...,
    * n_bigrams, xent). Token-less units yield no score row (no pairs
    * — the oracle's `range` semantics). */
  def fitScoreUnits(
      units: DataFrame, ids: Seq[String], trainPred: Column): DataFrame = {
    val idCols = ids.map(col)
    // the tokenized corpus materializes ONCE (narrow) — its four
    // consumers (c2, c1, v, scoring) would otherwise each re-scan and
    // re-tokenize the raw corpus
    val big = units
      .select(idCols ++ Seq(trainPred.as("__train"),
        explode(pairs(col("text"))).as("pair")): _*)
      .localCheckpoint()
    val train = big.filter(col("__train"))
    val c2 = train.groupBy(col("pair")).agg(count(lit(1)).as("c2"))
    val c1 = train
      .groupBy(substring_index(col("pair"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    // vocab = distinct predicted tokens + 1 OOV bucket (every non-start
    // token appears as some pair's second word, so distinct-w2 IS the
    // non-start vocabulary)
    val v = train
      .agg((countDistinct(element_at(split(col("pair"), " "), 2)) + 1)
        .as("v"))
    val scored = big
      .join(c2, Seq("pair"), "left")
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(idCols :+
        // micro-nats: ONE float round per row, integer thereafter
        round(log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v"))) * 1e6)
          .cast("long").as("lp"): _*)
    // 4-decimal cross-entropy via EXACT rational rounding: the target
    // is round(s / (100 n)) with s = -sum(lp) >= 0, which is
    // floor((2s + 100n) / (200n)) in pure int64 — no engine float
    // round ever runs, so no shortest-decimal/binary divergence can
    // split the hash (bm25 hit that at sf0.1; this divisor has an
    // arbitrary n, so even the x.5-grid trick wouldn't be exact)
    scored.groupBy(idCols: _*)
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp"))).as("s"))
      .select(idCols ++ Seq(col("n_bigrams"),
        (expr("(2 * s + 100 * n_bigrams) div (200 * n_bigrams)")
          .cast("long") / 1e4).as("xent")): _*)
  }

  /** DuckDB twin over `rel(doc_id, text)`: CTEs ending in
    * `lmscore(doc_id, n_bigrams, xent)`. */
  def oracleCtes(rel: String): String =
    oracleCtesUnits(rel, Seq("doc_id"), "doc_id % 2 = 0")

  /** [[oracleCtesUnits]]: the [[fitScoreUnits]] twin over
    * `rel(ids..., text)` with an arbitrary unit key and train
    * predicate; CTEs ending in `lmscore(ids..., n_bigrams, xent)`. */
  def oracleCtesUnits(
      rel: String, ids: Seq[String], trainPredSql: String): String = {
    val idList = ids.mkString(", ")
    val bIdList = ids.map(i => s"b.$i").mkString(", ")
    s"""lmbig AS (
       |  SELECT $idList, __lmtrain,
       |    unnest([a[j] || ' ' || a[j + 1] for j in range(1, len(a))])
       |      AS pair
       |  FROM (SELECT $idList, __lmtrain,
       |      list_prepend('$Start',
       |        regexp_extract_all(lower(text), '[a-z]+')) AS a
       |    FROM (SELECT *, $trainPredSql AS __lmtrain FROM $rel) __lmp)
       |    __lmt),
       |lmtrain AS (SELECT pair FROM lmbig WHERE __lmtrain),
       |lmc2 AS (
       |  SELECT pair, count(*) AS c2 FROM lmtrain GROUP BY pair),
       |lmc1 AS (
       |  SELECT split_part(pair, ' ', 1) AS w1, count(*) AS c1
       |  FROM lmtrain GROUP BY 1),
       |lmv AS (
       |  SELECT count(DISTINCT split_part(pair, ' ', 2)) + 1 AS v
       |  FROM lmtrain),
       |lmlp AS (
       |  SELECT $bIdList,
       |    CAST(round(ln((coalesce(c2.c2, 0) + 1.0) /
       |        (coalesce(c1.c1, 0) + lmv.v)) * 1e6) AS BIGINT) AS lp
       |  FROM lmbig b
       |  LEFT JOIN lmc2 c2 USING (pair)
       |  LEFT JOIN lmc1 c1 ON split_part(b.pair, ' ', 1) = c1.w1
       |  CROSS JOIN lmv),
       |lmscore AS (
       |  SELECT $idList, n_bigrams,
       |    ((2 * s + 100 * n_bigrams) // (200 * n_bigrams)) / 1e4
       |      AS xent
       |  FROM (SELECT $idList, CAST(count(*) AS BIGINT) AS n_bigrams,
       |      CAST(-sum(lp) AS BIGINT) AS s
       |    FROM lmlp GROUP BY $idList) __lms)""".stripMargin
  }
}
