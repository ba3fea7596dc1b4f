package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** TRAINING for the hashed-feature quality classifier — a full-batch
  * integer perceptron (Rosenblatt's rule, the one linear-classifier
  * training loop that is EXACTLY representable in integer arithmetic:
  * learning rate 1, weight updates are signed counts), distilling the
  * rule-based quality gate into [[QualityModel]]'s architecture. This
  * is the published weak-supervision recipe (rules label, a cheap
  * linear model generalizes — the CCNet/GPT-3 filter is exactly a
  * linear classifier over hashed n-grams trained on proxy labels).
  *
  * Exactness discipline (the [[graft.sim.KMeans]] pattern): labels are
  * {+1,-1} from the deterministic rule gate; features are PRESENCE of
  * md5-hashed n-gram buckets (plus a bias bucket -1 in every doc);
  * weights start at zero and every update adds an integer sum of
  * labels — a FIXED number of full-batch iterations is bit-reproducible
  * and order-independent, so the whole training loop hash-checks
  * against an unrolled-CTE DuckDB oracle (`quality_train`). No float
  * appears anywhere in training.
  *
  * Scale shape: one (doc, bucket) relation (distinct presence pairs,
  * corpus-sized but NARROW — two int64s); per iteration one
  * features⋈weights join (weights are MODEL-sized: <= [[QualityModel
  * .Buckets]]+1 rows, broadcastable), one groupBy(doc) margin sum, one
  * groupBy(bucket) delta sum, one model-sized full-outer merge; each
  * iteration localCheckpoints the (model-sized) weights so lineage
  * never replays earlier rounds. Driver state: zero collects.
  */
object QualityTrain {

  /** Rule gate distilled into labels: the corpus_select quality
    * threshold. +1 = keep, -1 = junk. */
  def label(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(TextAnalysis.qualityScore(text) >= 0.5, 1L).otherwise(-1L)

  def labelSql(expr: String): String =
    s"(CASE WHEN ${TextAnalysis.qualityScoreSql(expr)} >= 0.5 " +
      "THEN 1 ELSE -1 END)"

  /** (doc_id, b) distinct hashed-feature presence pairs + the bias
    * bucket -1 for every doc. */
  def featurePairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(concat(
          transform(QualityModel.features(col("text")),
            f => Dedup.md5Hash32(f, "qm:") % QualityModel.Buckets),
          array(lit(-1L))))).as("b"))

  /** Train `iters` full-batch perceptron rounds on `docs(doc_id, text)`;
    * returns the final model as (b, w) rows — nonzero-bucket weights,
    * model-sized. */
  def fit(docs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    val labeled = docs
      .select(col("doc_id"), label(col("text")).as("y"))
      .localCheckpoint()
    val feat = featurePairs(docs).localCheckpoint()
    import spark.implicits._
    var w: DataFrame = Seq.empty[(Long, Long)].toDF("b", "w")
    for (_ <- 1 to iters) {
      // margins under the current model (empty model -> margin 0, so
      // round 1 updates on EVERY doc: the standard zero-init bootstrap)
      val margin = feat.join(w, Seq("b"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(coalesce(col("w"), lit(0L))).as("m"))
      val wrong = labeled.join(margin, Seq("doc_id"))
        .filter(col("y") * col("m") <= 0)
        .select(col("doc_id"), col("y"))
      val delta = feat.join(wrong, Seq("doc_id"))
        .groupBy(col("b")).agg(sum(col("y")).as("dw"))
      w = w.join(delta, Seq("b"), "full_outer")
        .select(col("b"),
          (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L)))
            .as("w"))
        .localCheckpoint() // model-sized snapshot per round
    }
    w.filter(col("w") =!= 0L)
  }

  /** Score docs under a trained model (the margin is the exact integer
    * feature-weight sum — the inference half of [[fit]]): one
    * features⋈weights join (model-sized right side) + one groupBy(doc).
    * pred = sign(margin), zero margins abstain to the junk side. */
  def score(docs: DataFrame, weights: DataFrame): DataFrame =
    featurePairs(docs)
      .join(weights, Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("margin"))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))

  /** DuckDB twin: the same unrolled rounds over `rel(doc_id, text)`.
    * Ends in `qtw$iters(b, w)` — NOTE: zero weights are NOT filtered
    * there (unlike [[fit]]'s return); a consumer matching fit's output
    * must add `WHERE w <> 0` itself, as quality_train's oracle does. */
  def oracleCtes(rel: String, iters: Int): String = {
    val base =
      s"""qty AS (
         |  SELECT doc_id, ${labelSql("text")} AS y FROM $rel),
         |qtf0 AS (
         |  SELECT doc_id,
         |    list_concat(ws, CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
         |      ELSE [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]
         |      END) AS fs
         |  FROM (SELECT doc_id,
         |      string_split(trim(regexp_replace(regexp_replace(lower(text),
         |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ws
         |    FROM $rel) __qt),
         |qtf AS (
         |  SELECT DISTINCT doc_id,
         |    ${Dedup.md5Hash32Sql("f", "qm:")} % ${QualityModel.Buckets} AS b
         |  FROM (SELECT doc_id, unnest(fs) AS f FROM qtf0) __qf
         |  UNION SELECT doc_id, -1 FROM $rel),
         |qtw0(b, w) AS (SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  WHERE 1 = 0)""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"qtw${i - 1}"
      s"""qtm$i AS (
         |  SELECT f.doc_id, sum(coalesce(w.w, 0)) AS m
         |  FROM qtf f LEFT JOIN $prev w ON f.b = w.b
         |  GROUP BY f.doc_id),
         |qte$i AS (
         |  SELECT y.doc_id, y.y
         |  FROM qty y JOIN qtm$i m ON y.doc_id = m.doc_id
         |  WHERE y.y * m.m <= 0),
         |qtd$i AS (
         |  SELECT f.b, sum(e.y) AS dw
         |  FROM qtf f JOIN qte$i e ON f.doc_id = e.doc_id
         |  GROUP BY f.b),
         |qtw$i AS (
         |  SELECT coalesce(w.b, d.b) AS b,
         |    CAST(coalesce(w.w, 0) + coalesce(d.dw, 0) AS BIGINT) AS w
         |  FROM $prev w FULL OUTER JOIN qtd$i d ON w.b = d.b)"""
        .stripMargin
    }
    s"""$base,
       |${steps.mkString(",\n")}""".stripMargin
  }
}
