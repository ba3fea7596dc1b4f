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
  *
  * Deltas are ORDER-SENSITIVE (they chain snapshots), and maintain()'s
  * count>0 filter makes out-of-order application non-commutative (a
  * group inserted in delta b and deleted in delta b+1, applied
  * reversed, resurrects with the insert's sums). The file source's
  * modification-time ordering is a tie-breaking HEURISTIC, not a
  * guarantee — so every applied batch is VERIFIED against the feed's
  * own `v_from`/`v_to` columns: batch b must carry exactly
  * `v_from = seedSourceVersion + b` and `v_to = v_from + 1`, i.e. the
  * feed is the contiguous chain of adjacent-version deltas and a
  * reordered, gapped, or duplicated file FAILS LOUDLY instead of
  * silently corrupting the view.
  *
  * Feed layout (deployment note): land each delta as ONE file (or one
  * atomically-renamed directory flattened to a file) in arrival order —
  * `changes(v, v+1).coalesce(1)` is the natural producer at view
  * scale, since a delta is change-set-sized, not fact-sized. The
  * coalesce(1) in the gate fixture (WaveElevenQueries `mv_standing`)
  * is exactly this contract, not harness convenience. A multi-file
  * delta would split across micro-batches and fail the v_from check
  * by design.
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
    * versions yet.
    *
    * @param seedSourceVersion snapshot version the seed aggregates;
    *   batch b must carry `v_from = seedSourceVersion + b` (see the
    *   ordering contract in the object doc) */
  def runOnce(
      spark: SparkSession,
      cdcDir: String,
      viewRoot: String,
      checkpointDir: String,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)],
      seed: => DataFrame,
      seedSourceVersion: Long = 0L): MaintainSummary = {
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
          // the view table's own ledger, not the checkpoint's batch
          // numbering, is the applied-through truth: a reused
          // checkpoint over a reset/restored view root would otherwise
          // read a LAGGING view, apply this delta over missing
          // predecessors, and durably commit a corrupt version before
          // any check fired — fail loudly with ZERO commits instead
          require(latest == id,
            s"view ledger lags the checkpoint: batch $id expects the " +
              s"view applied through v$id but $viewRoot is at " +
              s"v$latest — reused checkpoint over a reset or restored " +
              "view table? Re-seed the view (or reset the checkpoint) " +
              "so the ledgers agree; nothing was committed")
          // verify the chain BEFORE applying: the feed's own version
          // stamps, not file mtime, decide whether this delta is the
          // next link (empty deltas carry no rows to stamp — they
          // apply as a no-op and still advance the ledger)
          val stamps = batch.select("v_from", "v_to").distinct()
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          require(stamps.length <= 1,
            s"CDC batch $id mixes deltas: ${stamps.mkString(", ")} — " +
              "each delta must land as its own file")
          stamps.headOption.foreach { case (vf, vt) =>
            val wantFrom = seedSourceVersion + id
            require(vf == wantFrom && vt == vf + 1,
              s"CDC batch $id is out of order: carries v_from=$vf, " +
                s"v_to=$vt but the view has applied through " +
                s"v$wantFrom — the feed must be the contiguous chain " +
                "of adjacent-version deltas, one file per delta")
          }
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

  /** Publish the latest maintained version to the optimizer: register
    * its own immutable data directory with
    * [[graft.plans.SummaryRewrite]] as the summary serving `basePath`,
    * and return the served version. Freshness is the registrant's
    * contract — this is the registrant, called after each [[runOnce]]
    * drain. Zero copy: a committed version directory never changes
    * (commit is ErrorIfExists + an atomic marker), so serving is an
    * atomic pointer swap in the registry — a concurrent query routes
    * to the previous snapshot or the new one, never a half-state, and
    * in-flight scans of the old directory stay valid until a
    * vacuum-by-age retires it, exactly like any MVCC table. */
  def serve(
      spark: SparkSession,
      viewRoot: String,
      basePath: String,
      groupCols: Seq[String],
      aggCols: Map[(String, String), String],
      rebuildMaintained: Boolean = false): Long = {
    import graft.plans.SummaryRewrite
    val v = VersionedTable.latestVersion(spark, viewRoot).getOrElse(
      throw new IllegalArgumentException(
        s"$viewRoot has no committed version to serve"))
    SummaryRewrite.register(SummaryRewrite.MaterializedSummary(
      basePath, VersionedTable.versionDataPath(spark, viewRoot, v),
      groupCols, aggCols, rebuildMaintained))
    v
  }
}
