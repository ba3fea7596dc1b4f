package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Graded ranking-quality evaluation (nDCG@k, Järvelin & Kekäläinen,
  * TOIS 2002) — completes the retrieval-eval family next to the
  * set-based `ann_recall_eval` (recall counts HITS; nDCG weighs WHERE
  * the hits landed). Instance: the int8-quantized ANN ranking scored
  * against the exact float-cosine ground truth — the measured number
  * IS the ranking cost of scalar quantization.
  *
  * Per-position gains land on the Bm25 integer micro-grid
  * (`round(rel·1e6 / log2(pos+1))` — the ln-bit-equality discipline),
  * so DCG sums and the final ppm ratio are exact integers and the
  * measurement itself hash-checks.
  */
object RankEval {

  /** (qid, dcg_micro, idcg_micro, ndcg_ppm) for each query
    * `vec_id < nQueries`: graded relevance `rel = k+1−truth_rank` for
    * the exact top-k, 0 otherwise; DCG over the int8 system ranking;
    * IDCG from the truth list itself (the ideal ordering by
    * construction — relevance is derived from truth rank).
    *
    * Scale shape: both rankings are the existing k-per-query
    * operators; everything downstream joins (qid, cid) lists of k
    * rows per query — narrow longs, never vectors. */
  def ndcgInt8(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val truth = Similarity.bruteForceTopK(emb, nQueries, k)
      .select(col("qid"), col("cid"), col("rank"))
      .localCheckpoint() // two consumers: idcg + the system-gain join
    def gain(rank: org.apache.spark.sql.Column,
        rel: org.apache.spark.sql.Column) =
      round(rel * lit(1e6) / (log(rank + lit(1)) / log(lit(2.0))))
        .cast("long")
    val rel = (lit(k + 1) - col("rank")).cast("long")
    val idcg = truth.select(col("qid"), gain(col("rank"), rel).as("g"))
      .groupBy(col("qid")).agg(sum(col("g")).as("idcg_micro"))
    val sys = Similarity.int8TopK(emb, nQueries, k)
      .select(col("qid"), col("cid"), col("rank").as("srank"))
    val dcg = sys
      .join(truth.select(col("qid"), col("cid"), rel.as("rel")),
        Seq("qid", "cid"), "left")
      .select(col("qid"),
        gain(col("srank"), coalesce(col("rel"), lit(0L))).as("g"))
      .groupBy(col("qid")).agg(sum(col("g")).as("dcg_micro"))
    dcg.join(idcg, Seq("qid"))
      .select(col("qid"), col("dcg_micro"), col("idcg_micro"),
        expr("dcg_micro * 1000000L div idcg_micro").as("ndcg_ppm"))
      .orderBy(col("qid"))
  }

  /** DuckDB twin of [[ndcgInt8]]. */
  def ndcgInt8Oracle(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |i8 AS (
       |  SELECT vec_id,
       |    list_transform(v, x ->
       |      ((CAST(round(x * 1000000) AS BIGINT) + 2000000) * 127)
       |        // 1000000 - 254)::DOUBLE[] AS v
       |  FROM e),
       |ssc AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(list_dot_product(q.v, c.v) AS BIGINT) AS qdot
       |  FROM i8 q JOIN i8 c
       |    ON q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |srk AS (
       |  SELECT qid, cid, rank FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |      ORDER BY qdot DESC, cid) AS rank
       |    FROM ssc) __s WHERE rank <= $k),
       |tsc AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
       |  FROM e q JOIN e c
       |    ON q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |trk AS (
       |  SELECT qid, cid, rank, CAST(${k + 1} - rank AS BIGINT) AS rel
       |  FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, cid) AS rank
       |    FROM tsc) __t WHERE rank <= $k),
       |idcg AS (
       |  SELECT qid, CAST(sum(CAST(round(rel * 1e6 /
       |    (ln(rank + 1) / ln(2.0))) AS BIGINT)) AS BIGINT)
       |    AS idcg_micro
       |  FROM trk GROUP BY qid),
       |dcg AS (
       |  SELECT s.qid, CAST(sum(CAST(round(coalesce(t.rel, 0) * 1e6 /
       |    (ln(s.rank + 1) / ln(2.0))) AS BIGINT)) AS BIGINT)
       |    AS dcg_micro
       |  FROM srk s LEFT JOIN trk t ON t.qid = s.qid AND t.cid = s.cid
       |  GROUP BY s.qid)
       |SELECT qid, dcg_micro, idcg_micro,
       |  CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT) AS ndcg_ppm
       |FROM dcg JOIN idcg USING (qid)
       |ORDER BY qid""".stripMargin
}
