package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by the log importance
  * weight of a hashed-n-gram bag-of-words model of the TARGET
  * distribution against the SOURCE distribution — the published recipe
  * for selecting pretraining data that "looks like" a trusted target
  * corpus (DSIR; DoReMi and Dolma use the same shape).
  *
  * log w(x) = sum over feature buckets b of c_b(x) * lambda_b, with
  * lambda_b = ln p_target(b) - ln p_source(b), add-one smoothed over
  * [[Buckets]] buckets. Features are [[QualityModel.features]]
  * (unigrams + bigrams) hashed with the same engine-consistent md5
  * scheme.
  *
  * Hash-exactness: lambda is rounded ONCE per bucket onto the 1e-6
  * micro-grid ([[NgramLm]]'s discipline); a document's score is then
  * an INTEGER sum of count * lambda_micro products — exact int64,
  * aggregation-order-proof. Scale shape: the lambda table is
  * bucket-sized (<= [[Buckets]] rows, broadcast); the corpus-sized
  * relation carries (doc_id, bucket, count) only; one shuffle for the
  * per-doc bucket counts, one for the final per-doc sum.
  */
object Dsir {

  /** Feature-hash buckets (shared size with [[QualityModel.Buckets]]). */
  val Buckets = 4096

  /** Hash prefix: distinct from QualityModel's "qm:" so the two
    * operators' bucket spaces are independent. */
  val Prefix = "dsir:"

  /** Target split: doc_id % [[TargetMod]] == 0 stands in for the
    * trusted target corpus (wiki/books in the paper). */
  val TargetMod = 5

  /** Score all of `docs(doc_id, text)`: (doc_id, n_feats, logw_micro,
    * logw). logw_micro is the exact integer micro-nat score. */
  def weights(docs: DataFrame): DataFrame = {
    val feats = docs
      .select(col("doc_id"),
        explode(QualityModel.features(col("text"))).as("f"))
      .select(col("doc_id"),
        (Dedup.md5Hash32(col("f"), Prefix) % Buckets).as("b"))
    // (doc, bucket, count) materializes ONCE — both the split totals
    // and the final scoring sum read it, and it is the last relation
    // that ever sees corpus cardinality
    val docBuckets = feats
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val isTarget = col("doc_id") % TargetMod === 0
    val bucketTotals = docBuckets
      .groupBy(col("b"))
      .agg(sum(when(isTarget, col("c")).otherwise(0L)).as("ct"),
        sum(when(!isTarget, col("c")).otherwise(0L)).as("cs"))
    val totals = bucketTotals
      .agg(sum(col("ct")).as("tt"), sum(col("cs")).as("ts"))
    // lambda per SEEN bucket; a bucket unseen in both splits cannot
    // appear in any document's rows, so the seen set covers scoring
    val lambda = bucketTotals.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("tt") + lit(Buckets))) -
            log((col("cs") + lit(1.0)) / (col("ts") + lit(Buckets)))) * 1e6)
          .cast("long").as("lam"))
    docBuckets
      .join(broadcast(lambda), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("lam")).as("logw_micro"))
      .select(col("doc_id"), col("n_feats"), col("logw_micro"),
        // 4-decimal display value derived EXACTLY from the integer
        // micro score: micro/100.0 lands on the x.5-exact double grid
        // (both engines round halves away from zero), and the final
        // division of identical integers yields identical doubles —
        // round(micro/1e6, 4) directly would round the SHORTEST-DECIMAL
        // rendering in Spark but the binary double in DuckDB and split
        // the hash at .xxxx5 boundaries
        (round(col("logw_micro") / 100.0).cast("long") / 1e4).as("logw"))
  }

  /** DuckDB twin over `rel(doc_id, text)`: CTEs ending in
    * `dsw(doc_id, n_feats, logw_micro, logw)`. Reuses QualityModel's
    * tokenize/feature construction verbatim. */
  def oracleCtes(rel: String): String =
    s"""dstok AS (
       |  SELECT doc_id,
       |    string_split(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ws
       |  FROM $rel),
       |dsfeat AS (
       |  SELECT doc_id,
       |    list_concat(ws, CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
       |      ELSE [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]
       |      END) AS fs
       |  FROM dstok),
       |dsb AS (
       |  SELECT doc_id,
       |    ${Dedup.md5Hash32Sql("f", Prefix)} % $Buckets AS b
       |  FROM (SELECT doc_id, unnest(fs) AS f FROM dsfeat) __dsf),
       |dsdb AS (
       |  SELECT doc_id, b, count(*) AS c FROM dsb GROUP BY doc_id, b),
       |dsbt AS (
       |  SELECT b,
       |    sum(CASE WHEN doc_id % $TargetMod = 0 THEN c ELSE 0 END) AS ct,
       |    sum(CASE WHEN doc_id % $TargetMod <> 0 THEN c ELSE 0 END) AS cs
       |  FROM dsdb GROUP BY b),
       |dstot AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM dsbt),
       |dslam AS (
       |  SELECT b, CAST(round((ln((ct + 1.0) / (tt + $Buckets)) -
       |      ln((cs + 1.0) / (ts + $Buckets))) * 1e6) AS BIGINT) AS lam
       |  FROM dsbt CROSS JOIN dstot),
       |dsw AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
       |    CAST(sum(c * lam) AS BIGINT) AS logw_micro,
       |    CAST(round(sum(c * lam) / 100.0) AS BIGINT) / 1e4 AS logw
       |  FROM dsdb JOIN dslam USING (b)
       |  GROUP BY doc_id)""".stripMargin
}
