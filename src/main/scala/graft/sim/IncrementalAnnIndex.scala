package graft.sim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental IVF index — the production shape of similarity search at
  * corpus-build time: embedding batches arrive continuously and must
  * become searchable WITHOUT re-indexing the corpus (the same
  * incremental discipline as [[graft.dedup.IncrementalDedup]]).
  *
  * Store layout:
  *   - `centroids`: (cent_id, cv) — the coarse quantizer, FIXED at init
  *     (classic IVF: lists grow, the quantizer doesn't; re-training is a
  *     rebuild, not an append).
  *   - `lists/cid=<n>/` — inverted lists as HIVE PARTITIONS of
  *     (vec_id, v): a probe restricted to k centroid ids statically
  *     prunes every other partition AT THE SCAN, so query I/O is
  *     |probed lists|, not |index|.
  *
  * Append assigns each new vector to its nearest centroid (broadcast
  * quantizer, argmax with the same round-then-tiebreak discipline as
  * [[Similarity.ivfTopK]], so an incremental build equals a one-shot
  * build vector-for-vector) and appends ONLY the touched partitions.
  * Re-delivered vec_ids are skipped (columnar-pruned single-column
  * anti-join against the ledger), so replaying a batch is a no-op.
  */
object IncrementalAnnIndex {

  final case class AppendResult(appended: Long, skippedRedelivered: Long)

  private def centroidsPath(store: String) = s"$store/centroids"
  private def listsPath(store: String) = s"$store/lists"

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** Nearest-centroid assignment, identical to ivfTopK's: similarity
    * rounded to 4 decimals BEFORE the argmax, ties to the lower
    * cent_id. Input (vec_id, v); output (vec_id, v, cid). */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("csim", round(Similarity.cosine(col("v"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cid"))
  }

  private def vecsOf(batch: DataFrame): DataFrame =
    batch.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))

  /** Initialize the store: the quantizer is the `nCentroids`
    * lowest-vec_id vectors of the init batch (deterministic, like
    * ivfTopK's first-k rule), then the whole batch is appended. */
  def init(batch: DataFrame, storeDir: String,
      nCentroids: Int = Similarity.IvfCentroids): AppendResult = {
    val cents = vecsOf(batch)
      .orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    cents.write.mode(SaveMode.Overwrite).parquet(centroidsPath(storeDir))
    appendBatch(batch, storeDir)
  }

  /** Append one batch of (vec_id, embedding); re-delivered ids skipped. */
  def appendBatch(batch: DataFrame, storeDir: String): AppendResult = {
    val spark = batch.sparkSession
    val incoming = vecsOf(batch).dropDuplicates("vec_id").localCheckpoint()
    val fresh =
      if (!exists(spark, listsPath(storeDir))) incoming
      else {
        // single-column scan: parquet pruning reads ONLY vec_id here
        val known = spark.read.parquet(listsPath(storeDir)).select("vec_id")
        incoming.join(known, Seq("vec_id"), "left_anti").localCheckpoint()
      }
    val nFresh = fresh.count()
    if (nFresh > 0) {
      val cents = spark.read.parquet(centroidsPath(storeDir))
      assign(fresh, cents)
        .write.mode(SaveMode.Append).partitionBy("cid")
        .parquet(listsPath(storeDir))
    }
    AppendResult(nFresh, incoming.count() - nFresh)
  }

  /** Top-k over the store for external queries (qid, embedding):
    * `nProbe` nearest lists per query, exact rescore inside them. The
    * probed cid set (≤ |queries| x nProbe distinct values, bounded by
    * the centroid count) is collected to the driver and pushed as an
    * IN-filter, so unprobed list PARTITIONS are statically pruned at the
    * scan — query cost is the probed lists, never the index. Self-hits
    * (qid == vec_id) are excluded, matching ivfTopK. */
  def topK(queries: DataFrame, storeDir: String, k: Int,
      nProbe: Int = Similarity.IvfProbes): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(centroidsPath(storeDir))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probes = queries
      .select(col("qid"), col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(Similarity.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cent_id").as("cid"))
      .localCheckpoint()
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(listsPath(storeDir))
      .filter(col("cid").isin(probedCids: _*)) // static partition pruning
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("v")), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("sim"))
  }
}
