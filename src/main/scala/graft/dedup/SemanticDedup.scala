package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * model-sized collects); the final assignment is again row-local; the
  * pair stage shuffles once on cid and is quadratic only within a
  * cluster. k growing with the corpus keeps TYPICAL clusters bounded,
  * but a skewed corpus (one giant near-duplicate mass — exactly what
  * dedup corpora contain) still concentrates O(n^2) pairs in one hot
  * cluster. `maxCluster` is the admission cap for that regime, the
  * same guard the band-bucket cap gives MinHash-LSH
  * ([[Dedup.minhashLshPairs]]) and the bucket cap gives embedding-LSH:
  * clusters larger than the cap are EXCLUDED from the pair join, so
  * their members emit no losers and stay kept. Misses are strictly
  * ONE-SIDED (never a false drop); the `semantic_dedup_capped` gate
  * query hash-pins these semantics on a planted-giant-cluster fixture,
  * and Profile hot mode measures the capped path staying linear where
  * the uncapped form goes quadratic.
  */
object SemanticDedup {

  /** (vec_id, cid, kept) for every vector; kept=false iff a lower-id
    * >= threshold neighbor shares the cluster AND the cluster is no
    * larger than `maxCluster` (opt-in admission cap; default
    * unbounded = exact SemDeDup). */
  def semanticDedup(
      emb: DataFrame,
      k: Int,
      iters: Int,
      threshold: Double,
      maxCluster: Long = Long.MaxValue): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    require(maxCluster >= 1, s"maxCluster must be >= 1, got $maxCluster")
    val model = KMeans.fit(emb, k, iters)
    val centroids = KMeans.centroidsOf(model)
    val assigned = KMeans.assign(emb, centroids)
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), Seq("vec_id"))
      .withColumn("n", sqrt(array_dot(col("v"), col("v"))))
      .localCheckpoint() // both pair sides + the output read it
    // admission: only clusters within the cap enter the pair join —
    // one window count over the SAME cid partitioning the join shuffles
    // on (no extra exchange), pairs from over-cap clusters are the
    // documented one-sided miss
    val admitted =
      if (maxCluster == Long.MaxValue) assigned
      else assigned
        .withColumn("__csz",
          count(lit(1)).over(Window.partitionBy(col("cid"))))
        .filter(col("__csz") <= maxCluster)
        .drop("__csz")
    val a = admitted.select(col("cid"), col("vec_id").as("va"),
      col("v").as("ea"), col("n").as("na"))
    val b = admitted.select(col("cid"), col("vec_id").as("vb"),
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
    * then the same within-cluster pair rule (with the same per-cluster
    * admission filter when `maxCluster` is finite). */
  def semanticDedupOracle(
      embRel: String,
      k: Int,
      iters: Int,
      threshold: Double,
      maxCluster: Long = Long.MaxValue): String = {
    val admCte =
      if (maxCluster == Long.MaxValue) "adm AS (SELECT vec_id, cid FROM af)"
      else
        s"""adm AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT vec_id, cid,
           |      count(*) OVER (PARTITION BY cid) AS csz
           |    FROM af) __sz WHERE csz <= $maxCluster)""".stripMargin
    s"""WITH ${KMeans.oracleCtes(embRel, k, iters)},
       |${KMeans.assignCtes(iters)},
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |$admCte,
       |losers AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM adm a JOIN adm b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= $threshold)
       |SELECT af.vec_id, af.cid,
       |  (af.vec_id NOT IN (SELECT vec_id FROM losers)) AS kept
       |FROM af
       |ORDER BY vec_id""".stripMargin
  }
}
