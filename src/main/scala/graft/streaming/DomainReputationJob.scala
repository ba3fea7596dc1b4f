package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming DOMAIN-REPUTATION gate — the stateful twin of the batch
  * `domain_quality_filter`: per-domain noise statistics accumulate
  * across micro-batches in a persisted archive, and every batch is
  * admitted or dropped by its domain's CUMULATIVE verdict at that
  * moment. A spam farm's first pages can pass (no history yet); once
  * the domain's aggregate noise crosses the ceiling, everything later
  * from it drops — including clean-looking pages, because reputation
  * attaches to the domain, not the page (the batch operator's
  * guilt-by-association semantics, now earned over time).
  *
  * State design: ONE narrow append-only archive
  * `(doc_id, domain, npunct, nchars, admitted)` is the single source
  * of truth. Each drain:
  *   1. anti-joins the batch against archived doc_ids (crash-replay
  *      of a half-written batch re-processes only the missing rows —
  *      the CorpusBuildJob idempotence discipline);
  *   2. folds archive + fresh rows into per-domain cumulative sums
  *      (the CURRENT batch counts toward its own verdict: the batch
  *      that unmasks a farm is already dropped);
  *   3. appends ALL fresh rows (either verdict) to the archive FIRST —
  *      rejected pages remain evidence, so a farm cannot launder its
  *      reputation by being refused — then admits passing docs to the
  *      corpus store, plus any crash-orphans: redelivered rows a
  *      half-completed drain archived as admitted but never wrote to
  *      the corpus. Same-batch duplicate doc_ids collapse to one
  *      deterministic winner before any of this.
  *
  * Scale shape: the archive is narrow integers (never text) and the
  * per-batch fold is one map-side-combined groupBy over it; at crawl
  * scale the same fold IS the compaction — checkpoint the per-domain
  * sums periodically and replace the row-level archive scan with
  * (sums + new rows), identical arithmetic by associativity.
  */
object DomainReputationJob {

  /** Same ceiling as the batch gate (ppm of characters). */
  val PunctPpmCeiling = 50000L

  final case class RepSummary(
      batches: Int,
      arrived: Long,
      skippedRedelivered: Long,
      admitted: Long,
      rejectedDomain: Long) {
    def +(o: RepSummary): RepSummary = RepSummary(
      batches + o.batches, arrived + o.arrived,
      skippedRedelivered + o.skippedRedelivered,
      admitted + o.admitted, rejectedDomain + o.rejectedDomain)
  }

  private val Empty = RepSummary(0, 0L, 0L, 0L, 0L)

  private def archiveDir(storeDir: String) = s"$storeDir/archive"
  private def corpusDir(storeDir: String) = s"$storeDir/corpus"

  /** Read a state dir, or an empty frame ONLY when the dir does not
    * exist yet (first drain). A transient IO error or corrupt footer
    * must propagate — substituting empty state there would silently
    * reset domain reputation: every archived doc_id becomes "fresh"
    * again and rejected docs get reprocessed, which is exactly the
    * corruption the anti-join idempotence discipline prevents. */
  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** One AvailableNow drain of `docsDir` (parquet rows
    * `doc_id BIGINT, domain STRING, text STRING`) into `storeDir`.
    * Returns summed decision counts across this run's micro-batches. */
  def runOnce(
      spark: SparkSession,
      docsDir: String,
      storeDir: String,
      checkpointDir: String,
      punctPpmCeiling: Long = PunctPpmCeiling): RepSummary = {
    var summary = Empty
    val q = spark.readStream
      .schema("doc_id BIGINT, domain STRING, text STRING")
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = summary + drainBatch(batch.localCheckpoint(),
          storeDir, punctPpmCeiling)
      }
      .start()
    q.awaitTermination()
    summary
  }

  private def drainBatch(pinned: DataFrame, storeDir: String,
      punctPpmCeiling: Long): RepSummary = {
    val spark = pinned.sparkSession
    val archSchema =
      "doc_id BIGINT, domain STRING, npunct BIGINT, nchars BIGINT, " +
        "admitted BOOLEAN"
    val archive = readOrEmpty(spark, archiveDir(storeDir), archSchema)
    val arrived = pinned.count()
    // 0. same-batch dedup: the archive anti-join only skips ids seen in
    //    PRIOR batches, so duplicate doc_ids inside one micro-batch
    //    would double-count stats and corpus rows. Deterministic winner
    //    (min struct) so a crash-replay picks the same row.
    val batch = pinned
      .groupBy(col("doc_id"))
      .agg(min(struct(col("domain"), col("text"))).as("w"))
      .select(col("doc_id"), col("w.domain").as("domain"),
        col("w.text").as("text"))
    // 1. redelivery skip: only doc_ids the archive has never seen
    val fresh = batch
      .join(archive.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("domain"), col("text"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long")
          .as("npunct"),
        length(col("text")).cast("long").as("nchars"))
      .localCheckpoint()
    val nFresh = fresh.count()
    // 2. cumulative per-domain verdict INCLUDING this batch (narrow
    //    columns only — the fold never touches text)
    val verdicts = archive
      .select(col("domain"), col("npunct"), col("nchars"))
      .unionByName(fresh.select(col("domain"), col("npunct"),
        col("nchars")))
      .groupBy(col("domain"))
      .agg(expr("sum(npunct) * 1000000 div sum(nchars)").as("dppm"))
      .select(col("domain"),
        (col("dppm") < punctPpmCeiling).as("domain_pass"))
    val flagged = fresh.join(broadcast(verdicts), Seq("domain"))
      .localCheckpoint()
    // 3. ARCHIVE FIRST (it is the idempotence source of truth), corpus
    //    second. A crash between the two writes leaves archived-admitted
    //    rows with no corpus text; the redelivered batch repairs them
    //    below (orphan reconciliation), so neither write order loses
    //    rows NOR duplicates them. The old corpus-first order made the
    //    same crash window produce corpus duplicates instead — the
    //    archive anti-join would skip the redelivered rows for good.
    val admitted = flagged.filter(col("domain_pass"))
    val nAdmitted = admitted.count()
    flagged
      .select(col("doc_id"), col("domain"), col("npunct"),
        col("nchars"), col("domain_pass").as("admitted"))
      .write.mode("append").parquet(archiveDir(storeDir))
    // crash-orphans: batch rows a previous half-completed drain archived
    // as admitted but never appended to the corpus. Narrow id-only scans
    // on both sides; at crawl scale the corpus id column is exactly the
    // doc_id index a reader-side dedup would keep anyway.
    val corpusIds = readOrEmpty(spark, corpusDir(storeDir),
      "doc_id BIGINT, domain STRING, text STRING").select(col("doc_id"))
    val orphans = batch
      .join(archive.filter(col("admitted")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .join(corpusIds, Seq("doc_id"), "left_anti")
    admitted.select(col("doc_id"), col("domain"), col("text"))
      .unionByName(orphans.select(col("doc_id"), col("domain"),
        col("text")))
      .write.mode("append").parquet(corpusDir(storeDir))
    RepSummary(1, arrived, arrived - nFresh, nAdmitted,
      nFresh - nAdmitted)
  }
}
