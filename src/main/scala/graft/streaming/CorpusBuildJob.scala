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
      skippedRedelivered: Long) {
    def +(o: BuildSummary): BuildSummary = BuildSummary(
      batches + o.batches, arrived + o.arrived,
      filteredOut + o.filteredOut,
      rejectedContaminated + o.rejectedContaminated,
      accepted + o.accepted, rejectedNearDup + o.rejectedNearDup,
      skippedRedelivered + o.skippedRedelivered)
  }

  private val EmptySummary = BuildSummary(0, 0L, 0L, 0L, 0L, 0L, 0L)

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
    val evalHashes = evalShingles(evalDocs)
    var summary = EmptySummary
    val q = spark.readStream.schema(schema).parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = summary +
          drainBatch(batch.localCheckpoint(), storeDir, evalHashes)
      }
      .start()
    q.awaitTermination()
    summary
  }

  /** One AvailableNow drain of a directory of WARC ARCHIVES into the
    * corpus store — the streaming twin of the batch `warc_corpus`
    * composition. Each micro-batch fans records out of newly-landed
    * archives via the SPLIT reader
    * ([[graft.sources.WarcSource.recordsSplit]], so one multi-GB
    * archive still spreads across tasks), keeps 200-status response
    * bodies, CANONICALIZES the target URI
    * ([[graft.text.UrlNormalize]] — crawl dumps carry the same page
    * under tracking-param/port/fragment variants, and URL-level
    * collapse is the first dedup every crawl pipeline runs), derives
    * doc ids from `docIdPattern`'s capture group on the NORMALIZED
    * URI (rows without a match are dropped), collapses same-id rows
    * within the batch to a deterministic winner (min body md5), then
    * applies the SAME scrub/gate/dedup drain as [[runOnce]] — WARC
    * in, curated corpus out, checkpoint-idempotent. */
  def runOnceFromWarc(
      spark: SparkSession,
      warcDir: String,
      storeDir: String,
      checkpointDir: String,
      docIdPattern: String = "/doc/(\\d+)$",
      splitBytes: Long = graft.sources.WarcSource.DefaultSplitBytes,
      evalDocs: Option[DataFrame] = None): BuildSummary = {
    import graft.sources.WarcSource
    val evalHashes = evalShingles(evalDocs)
    var summary = EmptySummary
    // binaryFile's own (fixed) schema — streaming file sources demand
    // it spelled out
    val q = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")
      .load(warcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val archives = batch
          .select(xxhash64(col("path")), col("content"))
          .as[(Long, Array[Byte])]
        val (recsDf, slices) =
          WarcSource.recordsSplitWithSlices(archives, splitBytes)
        val docsDf = recsDf
          .filter(col("warc_type") === "response" &&
            col("http_status") === 200)
          .select(
            regexp_extract(
              graft.text.UrlNormalize.norm(col("target_uri")),
              docIdPattern, 1).cast("long").as("doc_id"),
            col("body_text").as("text"))
          .filter(col("doc_id").isNotNull)
          // URI variants of one page collapse to one id above; pick a
          // deterministic representative body per id (min md5), so the
          // admitted corpus never depends on record order
          .groupBy(col("doc_id"))
          .agg(min(struct(md5(col("text")).as("k"), col("text")))
            .as("w"))
          .select(col("doc_id"), col("w.text").as("text"))
          .localCheckpoint() // pins the fan-out...
        // ...so the slice cache behind recordsSplit can be RELEASED
        // now, not at stream shutdown: without this every micro-batch
        // leaves its compressed archive bytes pinned in the block
        // manager for the stream's lifetime
        slices.unpersist(blocking = false)
        summary = summary + drainBatch(docsDf, storeDir, evalHashes)
      }
      .start()
    q.awaitTermination()
    summary
  }

  private def evalShingles(evalDocs: Option[DataFrame]): Option[DataFrame] =
    evalDocs.map(e =>
      graft.dedup.Dedup.evalShingleHashes(e, "doc_id", "text")
        .localCheckpoint())

  /** Gate + (optional) decontaminate + dedup one PINNED (doc_id, text)
    * batch into the store — the shared drain body of [[runOnce]] and
    * [[runOnceFromWarc]]. */
  private def drainBatch(
      pinned: DataFrame,
      storeDir: String,
      evalHashes: Option[DataFrame]): BuildSummary = {
    val arrived = pinned.count()
    val clean0 = cleanAndFilter(pinned).localCheckpoint()
    val (clean, contaminated) = evalHashes match {
      case None => (clean0, 0L)
      case Some(eh) =>
        val bad = graft.dedup.Dedup.contaminationAgainstHashes(
            clean0, eh, "doc_id", "text", MinSharedShingles)
          .select(col("doc_id"))
        val kept = clean0.join(broadcast(bad), Seq("doc_id"), "left_anti")
        (kept, bad.count())
    }
    val r = IncrementalDedup.processBatch(clean, storeDir)
    val kept = r.accepted + r.rejectedNearDup + r.skippedRedelivered
    BuildSummary(1, arrived, arrived - kept - contaminated, contaminated,
      r.accepted, r.rejectedNearDup, r.skippedRedelivered)
  }
}
