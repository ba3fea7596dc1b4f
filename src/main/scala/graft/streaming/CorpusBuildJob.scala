package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.analysis.TextAnalysis
import graft.dedup.IncrementalDedup

/** The end-to-end TRAINING-CORPUS build as one checkpointed streaming
  * job: document files land continuously; each `Trigger.AvailableNow`
  * drain scrubs PII, applies the heuristic quality / language /
  * token-range gates, and near-dup-rejects against the ACCEPTED corpus
  * store ([[IncrementalDedup]] — index probe, never a corpus rescan).
  *
  * Idempotence is layered: the checkpoint makes a re-run drain only new
  * files, and the dedup store's doc_id redelivery skip makes replaying a
  * half-processed batch (post-crash) a no-op — the same discipline as
  * IngestJob/KeyedUpsertSink on the reference side of the house.
  *
  * Gates mirror the batch `corpus_select` query, so streaming and batch
  * corpus builds make identical keep/drop decisions per document.
  */
object CorpusBuildJob {

  val MinQuality = 0.5
  val Lang = "en"
  val MinTokens = 50L
  val MaxTokens = 400L

  /** Shared-shingle bar for the optional decontamination gate. */
  val MinSharedShingles = 3L

  final case class BuildSummary(
      batches: Int,
      arrived: Long,
      filteredOut: Long,
      rejectedContaminated: Long,
      accepted: Long,
      rejectedNearDup: Long,
      skippedRedelivered: Long)

  /** Scrub + gate one raw (doc_id, text, ...) batch. Gates evaluate on
    * the RAW text (redaction placeholders would perturb the quality
    * heuristics); the ACCEPTED text is the scrubbed one. */
  def cleanAndFilter(batch: DataFrame): DataFrame = {
    val c = col("text")
    batch
      .select(col("doc_id"), c,
        TextAnalysis.qualityScore(c).as("__q"),
        TextAnalysis.langId(c).as("__l"),
        TextAnalysis.tokenCount(c).as("__n"))
      .filter(col("__q") >= MinQuality && col("__l") === Lang &&
        col("__n").between(MinTokens, MaxTokens))
      .select(col("doc_id"), TextAnalysis.scrubPii(c).as("text"))
  }

  /** One AvailableNow drain of `docsDir` into the corpus at `storeDir`.
    * Returns the summed decision counts across this run's micro-batches.
    *
    * `evalDocs`: optional benchmark suite for the DECONTAMINATION gate
    * ([[graft.dedup.Dedup.contaminationAgainstHashes]]) — its distinct
    * shingle hashes are computed ONCE per run (checkpointed) and every
    * micro-batch probes them; a doc sharing >= [[MinSharedShingles]]
    * shingles with any eval doc is rejected before dedup, counted in
    * `rejectedContaminated`. Stateless per batch, so replay idempotence
    * is untouched. */
  def runOnce(
      spark: SparkSession,
      docsDir: String,
      storeDir: String,
      checkpointDir: String,
      evalDocs: Option[DataFrame] = None): BuildSummary = {
    val schema = "doc_id BIGINT, text STRING"
    val evalHashes = evalDocs.map(e =>
      graft.dedup.Dedup.evalShingleHashes(e, "doc_id", "text")
        .localCheckpoint())
    var summary = BuildSummary(0, 0L, 0L, 0L, 0L, 0L, 0L)
    val q = spark.readStream.schema(schema).parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pinned = batch.localCheckpoint()
        val arrived = pinned.count()
        val clean0 = cleanAndFilter(pinned).localCheckpoint()
        val (clean, contaminated) = evalHashes match {
          case None => (clean0, 0L)
          case Some(eh) =>
            val bad = graft.dedup.Dedup.contaminationAgainstHashes(
                clean0, eh, "doc_id", "text", MinSharedShingles)
              .select(col("doc_id"))
            val kept = clean0.join(broadcast(bad), Seq("doc_id"),
              "left_anti")
            (kept, bad.count())
        }
        val r = IncrementalDedup.processBatch(clean, storeDir)
        val kept = r.accepted + r.rejectedNearDup + r.skippedRedelivered
        summary = BuildSummary(
          summary.batches + 1,
          summary.arrived + arrived,
          summary.filteredOut + (arrived - kept - contaminated),
          summary.rejectedContaminated + contaminated,
          summary.accepted + r.accepted,
          summary.rejectedNearDup + r.rejectedNearDup,
          summary.skippedRedelivered + r.skippedRedelivered)
      }
      .start()
    q.awaitTermination()
    summary
  }
}
