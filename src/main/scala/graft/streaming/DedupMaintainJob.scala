package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.{Dedup, IncrementalDedup}

/** Streaming corpus-dedup maintenance — [[AnnMaintainJob]]'s twin for
  * the persisted dedup store: document batches (files of
  * (doc_id, text)) land in a feed directory, and each micro-batch runs
  * [[IncrementalDedup.processBatch]] against the store — the
  * production crawl-feed wiring, so a deployment doesn't re-implement
  * the checkpoint/redelivery discipline by hand around processBatch.
  *
  * Idempotence needs no version-chain markers here: the STORE itself
  * recognizes re-delivered doc_ids (the bucket-pruned skip), so a
  * replayed file — same checkpoint or a fresh one — converges to the
  * same accepted corpus instead of double-admitting. That is why this
  * drain is simpler than the ANN one: CDC deltas carry deletes, which
  * do NOT commute with a redelivery skip (hence `_applied_v` and the
  * slot check there), while a dedup feed is insert-only and every
  * non-fresh row self-identifies. Order still matters for ADMISSION
  * (of two near-dup docs in different batches, the earlier-arriving
  * one wins — exactly the corpus-construction semantics), and the
  * file source orders unseen files by modification time, so a
  * producer landing bursts faster than the filesystem's timestamp
  * granularity should stamp mtimes explicitly
  * ([[AnnMaintainJob.landDelta]] is that helper).
  *
  * `autoCompactEvery > 0` runs [[IncrementalDedup.compactStore]]
  * after every N batches — the ANN drain's auto-compaction rationale:
  * each batch appends one file per touched bucket, so a store
  * draining a crawl for months fragments without it; compaction is
  * content-identical and crash-safe (the shared staged-swap
  * protocol), and scoped to fragmented buckets only, so a compacting
  * drain's steady state is flat.
  */
object DedupMaintainJob {

  final case class DedupMaintainSummary(
      batches: Int, accepted: Long, rejectedNearDup: Long,
      skippedRedelivered: Long)

  /** Drain every available feed file (checkpointed AvailableNow), one
    * file per micro-batch, into the dedup store at `storeDir`.
    * `storeBuckets` binds only if the first batch CREATES the store
    * (the creation record wins thereafter, as in processBatch);
    * `threshold` likewise — the store's `_meta_b<n>_t<ppm>` creation
    * record wins for default calls, and an explicit disagreeing
    * threshold fails the drain loudly (one store, one admission
    * regime; an explicit value EQUAL to the default follows the
    * record — processBatch's documented carve-out).
    *
    * Feed contract: FLAT files directly under `feedDir` (the file
    * stream source drains top-level files — [[AnnMaintainJob
    * .landDelta]] lands them that way). A feed whose data sits only
    * in subdirectories (e.g. a partitioned landing) refuses loudly
    * instead of draining nothing. */
  def runOnce(
      spark: SparkSession,
      feedDir: String,
      storeDir: String,
      checkpointDir: String,
      threshold: Double = Dedup.JaccardThreshold,
      storeBuckets: Int = IncrementalDedup.DefaultStoreBuckets,
      autoCompactEvery: Int = 0,
      autoCompactMaxFiles: Int = 4): DedupMaintainSummary = {
    @volatile var batches = 0
    @volatile var accepted = 0L
    @volatile var rejected = 0L
    @volatile var skipped = 0L
    // a drain scheduled before the first landing is a no-op, not a
    // crash: the eager schema read below throws on a missing or
    // data-less feed directory. The guard enforces the FLAT-file feed
    // contract: data hiding only in subdirectories would pass a
    // recursive emptiness check and then silently drain nothing (the
    // file stream source lists top-level files), so that shape
    // refuses loudly here instead of returning an empty summary.
    val fp = new org.apache.hadoop.fs.Path(feedDir)
    val ffs = fp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!ffs.exists(fp)) return DedupMaintainSummary(0, 0L, 0L, 0L)
    val entries = ffs.listStatus(fp).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
    if (!entries.exists(_.isFile)) {
      require(!entries.exists(_.isDirectory),
        s"feed $feedDir holds no top-level data files but has " +
          s"subdirectories (${entries.filter(_.isDirectory)
            .map(_.getPath.getName).take(3).mkString(", ")}…) — the " +
          "dedup feed contract is FLAT files (a partitioned landing " +
          "would silently drain nothing); land feed files directly " +
          "under the feed directory, e.g. via AnnMaintainJob.landDelta")
      return DedupMaintainSummary(0, 0L, 0L, 0L)
    }
    val schema = spark.read.parquet(feedDir).schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        val r = IncrementalDedup.processBatch(batch, storeDir, threshold,
          storeBuckets)
        accepted += r.accepted
        rejected += r.rejectedNearDup
        skipped += r.skippedRedelivered
        if (autoCompactEvery > 0 && batches % autoCompactEvery == 0) {
          IncrementalDedup.compactStore(spark, storeDir,
            autoCompactMaxFiles)
          ()
        }
      }
      .start()
    q.awaitTermination()
    DedupMaintainSummary(batches, accepted, rejected, skipped)
  }
}
