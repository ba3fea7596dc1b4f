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
  final case class ChangesResult(removed: Long, appended: Long,
      skippedRedelivered: Long)

  private def centroidsPath(store: String) = s"$store/centroids"
  private def listsPath(store: String) = s"$store/lists"
  private def rewriteTmpPath(store: String) = s"$store/_rewrite_tmp"
  private def rewriteTrashPath(store: String) = s"$store/_rewrite_trash"

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

  /** Maintain the index off a [[graft.sinks.VersionedTable.changes]]-
    * shaped feed (vec_id, embedding, change_type, ...): the CDC
    * consumer form of index maintenance, composing with the versioned
    * corpus exactly as [[graft.sinks.IncrementalView.maintain]] does
    * for aggregates. `delete`/`update_preimage` rows REMOVE their
    * vec_ids; `insert`/`update_postimage` rows append through
    * [[appendBatch]] (probe-assigned to the FIXED quantizer). Removal
    * runs first, so an update's postimage re-enters cleanly instead of
    * being skipped as a redelivered id. An unknown change_type fails
    * loudly (the IncrementalView requireExact discipline: a consumer
    * that silently drops feed rows corrupts the index tracelessly).
    *
    * Cost is delta-localized: removal rewrites ONLY the inverted-list
    * partitions holding doomed ids (the Lucene-segment-rewrite shape —
    * at 100 TB a delta touches a handful of lists, never the index),
    * and the append is |inserts| work as always. Replay converges: a
    * redelivered feed finds deletes already gone and inserts already
    * known (redelivery skip); an update's preimage+postimage re-apply
    * — removal then re-insert of the same (id, vector) — landing on
    * identical content. */
  def applyChanges(feed: DataFrame, storeDir: String): ChangesResult = {
    val types = feed.select("change_type").distinct()
      .collect().map(_.getString(0)).toSet
    val unknown = types --
      Set("insert", "delete", "update_preimage", "update_postimage")
    require(unknown.isEmpty,
      s"IncrementalAnnIndex: unknown change_type(s): ${unknown.mkString(", ")}")
    val doomed = feed
      .filter(col("change_type").isin("delete", "update_preimage"))
      .select("vec_id").distinct()
    val removed = removeIds(doomed, storeDir)
    val ar = appendBatch(
      feed.filter(col("change_type").isin("insert", "update_postimage"))
        .select(col("vec_id"), col("embedding")),
      storeDir)
    ChangesResult(removed, ar.appended, ar.skippedRedelivered)
  }

  /** Delete `ids` from the inverted lists by rewriting ONLY the
    * partitions that hold them. Crash-safe single-writer protocol:
    * survivors land in a tmp dir while the originals are intact, then
    * each affected partition swaps through a trash dir (orig →
    * trash, tmp → live) — [[recoverRewrite]] at entry restores any
    * half-swapped partition from trash, so no crash window loses
    * rows. Returns the number of removed list entries. */
  private def removeIds(ids: DataFrame, storeDir: String): Long = {
    val spark = ids.sparkSession
    if (!exists(spark, listsPath(storeDir))) return 0L
    recoverRewrite(spark, storeDir)
    val idsC = ids.localCheckpoint()
    val lists = spark.read.parquet(listsPath(storeDir))
    // which inverted lists hold doomed ids — driver-sized (<= centroids)
    val affected = lists.join(idsC, Seq("vec_id"), "left_semi")
      .select(col("cid").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return 0L
    val hp = new Path(listsPath(storeDir))
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(rewriteTmpPath(storeDir))
    val trash = new Path(rewriteTrashPath(storeDir))
    fs.delete(tmp, true)
    val touched = lists.filter(col("cid").isin(affected: _*))
    val nBefore = touched.count()
    // 1. survivors to tmp — the originals are still fully intact
    val survivors = touched.join(idsC, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("v"), col("cid"))
    survivors.write.partitionBy("cid").parquet(tmp.toString)
    val nAfter = survivors.count() // originals still intact here
    // 2. originals aside (preserved until the swap lands)...
    fs.mkdirs(trash)
    affected.foreach { c =>
      fs.rename(new Path(hp, s"cid=$c"), new Path(trash, s"cid=$c"))
    }
    // 3. ...surviving partitions in (a fully-emptied list simply has
    // no tmp dir and stays deleted)
    fs.listStatus(tmp).filter(_.isDirectory).foreach { d =>
      fs.rename(d.getPath, new Path(hp, d.getPath.getName))
    }
    fs.delete(trash, true)
    fs.delete(tmp, true)
    nBefore - nAfter
  }

  /** Restore any partition a crashed [[removeIds]] left half-swapped:
    * a trash dir whose partition is MISSING from the live lists goes
    * back (the rerun re-deletes from it); one whose partition is
    * present was already swapped — drop the stale copy. */
  private def recoverRewrite(spark: SparkSession, storeDir: String): Unit = {
    val trash = new Path(rewriteTrashPath(storeDir))
    val fs = trash.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(trash)) {
      val hp = new Path(listsPath(storeDir))
      fs.listStatus(trash).filter(_.isDirectory).foreach { d =>
        val live = new Path(hp, d.getPath.getName)
        if (!fs.exists(live)) fs.rename(d.getPath, live)
      }
      fs.delete(trash, true)
    }
    fs.delete(new Path(rewriteTmpPath(storeDir)), true)
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
