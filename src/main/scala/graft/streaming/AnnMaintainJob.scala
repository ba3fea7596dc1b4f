package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.sim.IncrementalAnnIndex

/** Streaming ANN-index maintenance — [[MvMaintainJob]]'s twin for the
  * similarity store: CDC batches ([[graft.sinks.VersionedTable.changes]]-
  * shaped files over (vec_id, embedding)) stream in, and each
  * micro-batch applies [[IncrementalAnnIndex.applyChanges]] — deletes
  * rewrite only the touched inverted-list partitions, inserts
  * probe-assign to the frozen quantizer.
  *
  * Exactly-once without a transaction log: an `_applied_v<N>` marker
  * (atomic create-if-absent, the VersionedTable commit discipline)
  * records the snapshot version the store has applied through. A batch
  * whose `v_to` marker already exists is a redelivery and skips; a
  * batch whose `v_from` does not equal the applied-through version is
  * OUT OF ORDER and fails loudly — ordering matters here exactly as in
  * view maintenance (an id deleted in delta b and re-inserted in b+1,
  * applied reversed, ends absent: the insert hits the redelivery skip
  * while the id is still present, then the delete removes it). The
  * crash window between applyChanges and the marker create is safe:
  * redelivery re-applies, and applyChanges converges on replay.
  *
  * Feed layout contract (same as MvMaintainJob): one file per delta,
  * landed in version order. Every batch occupies exactly ONE chain
  * slot, pinned by the stable checkpointed batch id — and a STAMPED
  * batch must AGREE with its slot, so a feed whose file-source
  * (mtime) ordering disagrees with the version stamps fails loudly
  * before anything applies. That agreement is what makes EMPTY deltas
  * (a producer's no-op commit) safe to tolerate: an empty file has no
  * rows to stamp, so its slot derives from the batch id alone — if an
  * empty file ever sorted ahead of a real neighbor, the neighbor's
  * own stamps would contradict ITS slot and abort the drain, instead
  * of the marker silently advancing past an unapplied delta (the
  * failure mode a bare `v_to <= applied-through` skip cannot
  * distinguish from a true redelivery).
  */
object AnnMaintainJob {

  /** Land one CDC delta into the feed directory with a file mtime
    * STRICTLY ABOVE every file already there. The file stream source
    * orders unseen files by modification time, and the slot check
    * below rejects a feed whose mtime order disagrees with the version
    * stamps — correct, but it turns a same-timestamp tie between two
    * back-to-back producer writes into an intermittent abort. A real
    * producer lands deltas seconds apart; a test fixture (or a
    * replaying backfill) lands them in one burst, so this helper makes
    * the landing order explicit in the mtimes instead of sleeping
    * across the filesystem's timestamp granularity. */
  def landDelta(spark: SparkSession, delta: org.apache.spark.sql.DataFrame,
      cdcDir: String): Unit = {
    val p = new Path(cdcDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.filter(f =>
        f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val beforeNames = before.map(_.getPath.getName).toSet
    val floor = before.map(_.getModificationTime)
      .foldLeft(0L)(math.max)
    delta.coalesce(1).write.mode("append").parquet(cdcDir)
    dataFiles().filterNot(f => beforeNames(f.getPath.getName))
      .foreach { f =>
        val t = math.max(floor + 2000L, f.getModificationTime)
        fs.setTimes(f.getPath, t, -1)
      }
  }

  final case class AnnMaintainSummary(
      batches: Int, applied: Int, skippedRedelivered: Int,
      removed: Long, appended: Long, appliedThrough: Long)

  private val MarkerRe = "_applied_v(\\d+)".r

  private def appliedThrough(
      spark: SparkSession, storeDir: String, seed: Long): Long = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) seed
    else fs.listStatus(p).toSeq
      .collect { case f if f.isFile =>
        f.getPath.getName match {
          case MarkerRe(n) => Some(n.toLong)
          case _           => None
        }
      }.flatten.foldLeft(seed)(math.max)
  }

  private def mark(
      spark: SparkSession, storeDir: String, v: Long): Unit = {
    val p = new Path(storeDir, s"_applied_v$v")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(p, false).close() // atomic if-absent
  }

  /** Drain every available CDC file (checkpointed AvailableNow), one
    * file per micro-batch, into the index at `storeDir` (already
    * initialized via [[IncrementalAnnIndex.init]] from snapshot
    * `seedSourceVersion`). */
  def runOnce(
      spark: SparkSession,
      cdcDir: String,
      storeDir: String,
      checkpointDir: String,
      seedSourceVersion: Long = 0L,
      autoCompactEvery: Int = 0,
      autoCompactMaxFiles: Int = 4): AnnMaintainSummary =
    runOnceImpl(spark, cdcDir, () => storeDir, checkpointDir,
      seedSourceVersion, autoCompactEvery, autoCompactMaxFiles)

  /** [[runOnce]] against a SERVE-LATEST store root
    * ([[IncrementalAnnIndex.initServed]]'s layout): the pointer is
    * re-resolved PER BATCH, so a rebuild cutover between (or amid)
    * drains redirects the very next delta to the new generation. The
    * `_applied_v` markers carried through the rebuild keep the chain
    * position — the slot check holds across the cutover with the same
    * checkpoint, which is what makes drain → rebuild → cutover →
    * keep-draining a composition instead of an operator's manual
    * re-seeding job. */
  def runOnceServed(
      spark: SparkSession,
      cdcDir: String,
      storeRoot: String,
      checkpointDir: String,
      seedSourceVersion: Long = 0L,
      autoCompactEvery: Int = 0,
      autoCompactMaxFiles: Int = 4): AnnMaintainSummary =
    runOnceImpl(spark, cdcDir,
      () => IncrementalAnnIndex.servedStore(spark, storeRoot),
      checkpointDir, seedSourceVersion, autoCompactEvery,
      autoCompactMaxFiles)

  /** `autoCompactEvery > 0` runs [[IncrementalAnnIndex.compact]]
    * (bounding each partition to `autoCompactMaxFiles` data files)
    * after every N applied batches — the housekeeping a long-lived
    * drain otherwise defers to an operator who must remember it: each
    * delta appends one file per touched partition, so a store draining
    * for months fragments without this. Compaction runs BETWEEN
    * batches through the same staged-transaction protocol as the
    * maintenance itself (content-identical, crash-safe — a crash mid-
    * compaction recovers exactly like a crashed delta), and its cost
    * is bounded by the fragmented partitions only, so a compacting
    * drain's steady state is flat: every partition stays within the
    * bound and most compaction calls find nothing to do. */
  private def runOnceImpl(
      spark: SparkSession,
      cdcDir: String,
      storeOf: () => String,
      checkpointDir: String,
      seedSourceVersion: Long,
      autoCompactEvery: Int = 0,
      autoCompactMaxFiles: Int = 4): AnnMaintainSummary = {
    @volatile var batches = 0
    @volatile var applied = 0
    @volatile var skipped = 0
    @volatile var removed = 0L
    @volatile var appended = 0L

    val schema = spark.read.parquet(cdcDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(cdcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batches += 1
        val storeDir = storeOf() // serve pointer resolved per batch
        val stamps = batch.select("v_from", "v_to").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(stamps.length <= 1,
          s"ANN CDC batch $id carries ${stamps.length} (v_from, v_to) " +
            "stamps — each delta must land as its own file")
        // every batch occupies exactly one chain slot, pinned by the
        // stable checkpointed batch id. A STAMPED batch must agree
        // with its slot — this is what catches a feed whose mtime
        // ordering put an EMPTY delta ahead of a real one (the empty
        // file would claim the real delta's slot, and the real delta's
        // own stamps then contradict its shifted slot HERE, aborting
        // the drain before the marker can silently advance past it).
        // An empty delta (a producer's no-op commit) carries no rows
        // to stamp, so its slot derives from the id alone: it applies
        // as a no-op and advances the marker — a no-op commit can
        // never wedge the chain, and MvMaintainJob's producer contract
        // (empty deltas tolerated) holds here too. The through-check
        // below still skips a REDELIVERED file (its id, and so its
        // slot, is stable across replays) instead of re-applying.
        val slotFrom = seedSourceVersion + id
        val (vf, vt) = stamps.headOption.getOrElse((slotFrom, slotFrom + 1))
        require(vf == slotFrom && vt == slotFrom + 1,
          s"ANN CDC batch $id is out of order: carries v_from=$vf, " +
            s"v_to=$vt but its chain slot is v$slotFrom -> " +
            s"v${slotFrom + 1} — the feed must land as the contiguous " +
            "chain of adjacent-version deltas, one file per delta, in " +
            "version order (a mis-sorted empty delta shifts every " +
            "later slot and is caught here)")
        val through = appliedThrough(spark, storeDir, seedSourceVersion)
        if (vt <= through) {
          skipped += 1
        } else {
          require(vf == through,
            s"ANN CDC batch $id is out of order: carries v_from=$vf " +
              s"but the store has applied through v$through — the feed " +
              "must be the contiguous chain of adjacent-version deltas")
          if (stamps.nonEmpty) {
            val r = IncrementalAnnIndex.applyChanges(batch, storeDir)
            removed += r.removed
            appended += r.appended
          }
          mark(spark, storeDir, vt)
          applied += 1
          if (autoCompactEvery > 0 && applied % autoCompactEvery == 0) {
            IncrementalAnnIndex.compact(spark, storeDir,
              autoCompactMaxFiles)
            ()
          }
        }
      }
      .start()
    q.awaitTermination()
    AnnMaintainSummary(batches, applied, skipped, removed, appended,
      appliedThrough(spark, storeOf(), seedSourceVersion))
  }
}
