package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword retrieval over the corpus (Robertson et al.,
  * TREC-3; the idf variant is Lucene's `ln(1 + (N - df + 0.5) /
  * (df + 0.5))`) — the standard lexical ranking next to the ANN family:
  * dense top-k (`ann_topk_*`) answers "nearest by embedding", this
  * answers "best by keywords", and production retrieval stacks run
  * both.
  *
  * Scale shape: one stacked (doc, term) relation — |terms| narrow
  * passes over the corpus, each a codegen'd regexp count, no UDF. The
  * per-term df/idf and the corpus avgdl are TERM-COUNT-sized
  * aggregates broadcast back; nothing corpus-sized shuffles. Per-term
  * scores land on an integer micro-grid before the per-doc sum (the
  * NgramLm discipline), so aggregation order can never split the hash.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Score every document against `terms` (case-insensitive whole-word
    * match): (doc_id, bm25) for docs matching at least one term,
    * descending. `docs` must expose (doc_id, text).
    *
    * ONE corpus scan: every per-term count evaluates in the same
    * codegen'd projection (an array-of-structs explode, not a union of
    * per-term passes), text is dropped immediately, and the narrow
    * (doc_id, dl, tf*) relation is localCheckpointed so its three
    * consumers (stats, df, scoring) never re-read the corpus. */
  def search(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tfArr = array(terms.map { t =>
      struct(lit(t).as("term"),
        regexp_count(col("text"), lit(s"(?i)\\b$t\\b")).cast("long")
          .as("tf"))
    }: _*)
    val base = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("dl"), tfArr.as("tfs"))
      .localCheckpoint()
    scoreFromIndex(
      base.select(col("doc_id"), col("dl")),
      base
        .select(col("doc_id"), col("dl"), explode(col("tfs")).as("x"))
        .select(col("doc_id"), col("dl"), col("x.term").as("term"),
          col("x.tf").as("tf"))
        .filter(col("tf") > 0))
  }

  /** One-scan index build for `terms`: (doc_id, dl, tfs[(term, tf)]) —
    * the row-local projection a streaming indexer appends from, before
    * exploding positive postings. Same expression tree as [[search]]'s
    * base relation. */
  def docIndex(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tfArr = array(terms.map { t =>
      struct(lit(t).as("term"),
        regexp_count(col("text"), lit(s"(?i)\\b$t\\b")).cast("long")
          .as("tf"))
    }: _*)
    docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("dl"), tfArr.as("tfs"))
  }

  /** BM25 from a PERSISTED index instead of a corpus scan — the shape
    * an incremental consumer ([[graft.streaming.StandingSearchJob]])
    * scores from: `lens(doc_id, dl)` one row per indexed document
    * (zero-match docs included — they carry the corpus stats), and
    * `tfs(doc_id, dl, term, tf)` the positive postings for the query
    * terms. Arithmetic is IDENTICAL to [[search]] (which now delegates
    * here), so a stream that accumulates these two relations converges
    * on the batch scores exactly. */
  def scoreFromIndex(lens: DataFrame, tfs: DataFrame): DataFrame = {
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) * lit(1.0) / count(lit(1))).as("avgdl"))
    val dfs = tfs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val micro = tfs
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5))) *
            (col("tf") * (K1 + 1)) /
            (col("tf") + lit(K1) *
              (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))) * 1e6)
          .cast("long").as("s"))
    // 4-decimal score derived EXACTLY from the integer micro sum:
    // micro/100.0 lands on the x.5-exact double grid (both engines
    // round halves away from zero); round(micro/1e6, 4) directly
    // rounds Spark's shortest-decimal rendering but DuckDB's binary
    // double and splits the hash at .xxxx5 boundaries (bit at sf0.1)
    micro.groupBy(col("doc_id"))
      .agg((round(sum(col("s")) / 100.0).cast("long") / 1e4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
  }

  /** DuckDB twin over `rel(doc_id, text)`: CTEs ending in
    * `bmscore(doc_id, bm25)`. */
  def oracleCtes(rel: String, terms: Seq[String]): String = {
    val termRows = terms.map(t => s"('$t')").mkString(", ")
    s"""bmbase AS (
       |  SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS dl, text
       |  FROM $rel),
       |bmterms(term) AS (VALUES $termRows),
       |bmtf AS (
       |  SELECT b.doc_id, b.dl, t.term,
       |    CAST(len(regexp_extract_all(b.text,
       |      '(?i)\\b' || t.term || '\\b')) AS BIGINT) AS tf
       |  FROM bmbase b CROSS JOIN bmterms t
       |  WHERE len(regexp_extract_all(b.text,
       |    '(?i)\\b' || t.term || '\\b')) > 0),
       |bmstats AS (
       |  SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl
       |  FROM bmbase),
       |bmdf AS (SELECT term, count(*) AS df FROM bmtf GROUP BY term),
       |bmmicro AS (
       |  SELECT f.doc_id,
       |    CAST(round(
       |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |        (f.tf * ${K1 + 1}) /
       |        (f.tf + $K1 * (${1 - B} + $B * f.dl / s.avgdl)) * 1e6)
       |      AS BIGINT) AS s
       |  FROM bmtf f JOIN bmdf d USING (term) CROSS JOIN bmstats s),
       |bmscore AS (
       |  SELECT doc_id,
       |    CAST(round(sum(s) / 100.0) AS BIGINT) / 1e4 AS bm25
       |  FROM bmmicro GROUP BY doc_id)""".stripMargin
  }
}
