package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps.array_dot
import graft.sim.KMeans

/** Semantic (embedding-space) deduplication, SemDeDup-style
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with
  * k-means, then compare ONLY within-cluster pairs by exact cosine —
  * the clustering bounds the quadratic term to sum(|cluster|^2) instead
  * of |corpus|^2, which is the published recipe for semantic dedup at
  * web-corpus scale. Keep-rule: a vector is DROPPED iff some
  * lower-vec_id member of its own cluster sits at >= threshold cosine
  * (deterministic, engine-neutral under the round-to-4 discipline).
  *
  * Scale shape: training is [[KMeans.fit]] (row-local assignment,
  * model-sized collects); the final assignment is again row-local
  * (centroids as plan literals); the pair stage shuffles once on cid
  * and is quadratic only within a cluster — at 100 TB, k grows with the
  * corpus so clusters stay bounded, and a hot cluster is visible in the
  * assignment histogram before the pair join runs.
  */
object SemanticDedup {

  /** (vec_id, cid, kept) for every vector; kept=false iff a lower-id
    * >= threshold neighbor shares the cluster. */
  def semanticDedup(
      emb: DataFrame,
      k: Int,
      iters: Int,
      threshold: Double): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    val model = KMeans.fit(emb, k, iters)
    val centroids = KMeans.centroidsOf(model)
    val assigned = KMeans.assign(emb, centroids)
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), Seq("vec_id"))
      .withColumn("n", sqrt(array_dot(col("v"), col("v"))))
      .localCheckpoint() // both pair sides + the output read it
    val a = assigned.select(col("cid"), col("vec_id").as("va"),
      col("v").as("ea"), col("n").as("na"))
    val b = assigned.select(col("cid"), col("vec_id").as("vb"),
      col("v").as("eb"), col("n").as("nb"))
    val sim = round(
      array_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
    val losers = a.join(b, Seq("cid"))
      .filter(col("va") < col("vb") && sim >= threshold)
      .select(col("vb").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cid"))
      .join(losers.withColumn("lost", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("lost").isNull.as("kept"))
  }

  /** DuckDB twin: the unrolled k-means CTE chain + final assignment,
    * then the same within-cluster pair rule. */
  def semanticDedupOracle(
      embRel: String,
      k: Int,
      iters: Int,
      threshold: Double): String =
    s"""WITH ${KMeans.oracleCtes(embRel, k, iters)},
       |${KMeans.assignCtes(iters)},
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |losers AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= $threshold)
       |SELECT af.vec_id, af.cid,
       |  (af.vec_id NOT IN (SELECT vec_id FROM losers)) AS kept
       |FROM af
       |ORDER BY vec_id""".stripMargin
}
