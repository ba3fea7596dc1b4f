package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.sinks.{IncrementalView, VersionedTable}

/** Streaming materialized-view maintenance: CDC batches
  * ([[VersionedTable.changes]]-shaped files) stream in, each micro-batch
  * applies the delta rule ([[IncrementalView.maintain]]) to the current
  * view and commits the result as the next [[VersionedTable]] version.
  * Downstream, [[graft.plans.SummaryRewrite]] can route base-table
  * aggregates to the maintained view — this job is the freshness side
  * of that contract.
  *
  * Exactly-once without a transaction log: the view version IS the
  * batch ledger. The seed commits as v0 and batch b MUST produce
  * version b+1, so a redelivered batch (crash between the table commit
  * and the checkpoint write) finds `latestVersion >= b+1` and skips —
  * the same replay-window discipline as the engine's other jobs, here
  * enforced by the versioned table's own atomic if-absent markers.
  * Deltas are order-sensitive (they chain snapshots), which the file
  * source's modification-time ordering + one-file-per-trigger
  * preserves for the append-only CDC directory this consumes.
  *
  * Scale shape per batch: the fact table never appears — one
  * delta-sized aggregation + one view-sized keyed join + a view-sized
  * commit. The commit is the honest cost of a view that must support
  * group DEATH (an upsert-only merge cannot remove a group whose
  * maintained count reached zero).
  */
object MvMaintainJob {

  final case class MaintainSummary(
      batches: Int, applied: Int, skippedRedelivered: Int,
      finalVersion: Long)

  /** Drain every available CDC file (checkpointed AvailableNow), one
    * file per micro-batch. Seeds the view table with `seed` (the base
    * snapshot's aggregation — or an empty aggregate) if it has no
    * versions yet. */
  def runOnce(
      spark: SparkSession,
      cdcDir: String,
      viewRoot: String,
      checkpointDir: String,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)],
      seed: => DataFrame): MaintainSummary = {
    if (VersionedTable.latestVersion(spark, viewRoot).isEmpty)
      VersionedTable.commit(seed, viewRoot)

    @volatile var batches = 0
    @volatile var applied = 0
    @volatile var skipped = 0

    val schema = spark.read.parquet(cdcDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(cdcDir)

    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batches += 1
        val expected = id + 1 // seed is v0, batch b commits v=b+1
        val latest = VersionedTable.latestVersion(spark, viewRoot).getOrElse(0L)
        if (latest >= expected) {
          skipped += 1
        } else {
          val mv = VersionedTable.readVersion(spark, viewRoot, latest)
          val maintained = IncrementalView.maintain(
            mv, batch, groupCols, countName, sumCols)
          val v = VersionedTable.commit(maintained, viewRoot)
          require(v == expected,
            s"view version drift: committed $v, expected $expected " +
              "(concurrent writer on the view table?)")
          applied += 1
        }
      }
      .start()
    q.awaitTermination()
    MaintainSummary(batches, applied, skipped,
      VersionedTable.latestVersion(spark, viewRoot).getOrElse(0L))
  }

  /** The maintained view as of the latest version. */
  def view(spark: SparkSession, viewRoot: String): DataFrame =
    VersionedTable.read(spark, viewRoot)
}
