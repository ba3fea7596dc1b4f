package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.analysis.QualityModel
import graft.dedup.Dedup
import graft.text.{UrlNormalize, UrlScope}

/** The STREAMING twin of the batch `crawl_curate` funnel: crawl
  * records land continuously, and each checkpointed
  * `Trigger.AvailableNow` drain runs the same progressive gates —
  *
  *   1. URL SCOPE (row-local: scheme/extension/depth/trap/params,
  *      [[UrlScope]]);
  *   2. URL DEDUP against a PERSISTED winner index — canonicalize
  *      ([[UrlNormalize]]), collapse same-norm-URL rows in the batch
  *      to the min-doc_id winner, then anti-join the norm URLs already
  *      won in ANY earlier batch (the [[graft.dedup.IncrementalDedup]]
  *      index-probe pattern: never a corpus rescan);
  *   3. CUMULATIVE DOMAIN REPUTATION — per-domain noise ppm over all
  *      url-winner rows ever seen INCLUDING this batch
  *      ([[DomainReputationJob]]'s earned-over-time semantics: the
  *      batch that unmasks a spam farm is already dropped, and a later
  *      clean-looking page from the condemned domain stays dropped);
  *   4. WEIGHTED ADMISSION — deterministic md5-coin against a
  *      quality-derived ppm rate (the `quality_weighted_sample`
  *      discipline; replay flips no coins).
  *
  * State design: ONE narrow append-only archive
  * `(doc_id, domain, norm_url, in_scope, url_winner, domain_pass,
  * admitted, npunct, nchars)` is the single source of truth — the
  * redelivery skip, the URL winner index, AND the domain stats all
  * derive from it by column-pruned scans, so there is no second state
  * store to keep consistent. Write order is archive FIRST, corpus
  * second, with crash-orphan repair from the redelivered batch
  * (the r10 DomainReputationJob discipline): neither write order loses
  * rows nor duplicates them.
  *
  * Scale shape: every gate is row-local; the exchanges are the
  * norm-URL winner probe (semi-join on a string key) and the
  * domain-stats fold (map-side-combined groupBy over narrow integers).
  * Bodies never shuffle; at crawl scale the archive fold compacts to
  * checkpointed per-domain sums exactly as DomainReputationJob
  * documents.
  */
object CrawlIngestJob {

  /** Same ceiling as the batch funnel (ppm of characters). */
  val PunctPpmCeiling = 50000L

  final case class CrawlSummary(
      batches: Int,
      arrived: Long,
      skippedRedelivered: Long,
      outOfScope: Long,
      urlDupRejected: Long,
      domainRejected: Long,
      sampledOut: Long,
      admitted: Long) {
    def +(o: CrawlSummary): CrawlSummary = CrawlSummary(
      batches + o.batches, arrived + o.arrived,
      skippedRedelivered + o.skippedRedelivered,
      outOfScope + o.outOfScope, urlDupRejected + o.urlDupRejected,
      domainRejected + o.domainRejected, sampledOut + o.sampledOut,
      admitted + o.admitted)
  }

  private val Empty = CrawlSummary(0, 0L, 0L, 0L, 0L, 0L, 0L, 0L)

  private def archiveDir(storeDir: String) = s"$storeDir/archive"
  private def corpusDir(storeDir: String) = s"$storeDir/corpus"

  private val ArchSchema =
    "doc_id BIGINT, domain STRING, norm_url STRING, in_scope BOOLEAN, " +
      "url_winner BOOLEAN, domain_pass BOOLEAN, admitted BOOLEAN, " +
      "npunct BIGINT, nchars BIGINT"

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** One AvailableNow drain of `crawlDir` (parquet rows
    * `doc_id BIGINT, url STRING, text STRING`) into `storeDir`.
    *
    * `sampleRatePpm`: fixed admission rate overriding the
    * quality-weighted coin (None = `crawl_curate`'s
    * 500000 + rawScore*250 clamped to [0, 1e6]). */
  def runOnce(
      spark: SparkSession,
      crawlDir: String,
      storeDir: String,
      checkpointDir: String,
      punctPpmCeiling: Long = PunctPpmCeiling,
      sampleRatePpm: Option[Long] = None): CrawlSummary = {
    var summary = Empty
    val q = spark.readStream
      .schema("doc_id BIGINT, url STRING, text STRING")
      .parquet(crawlDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = summary + drainBatch(batch.localCheckpoint(),
          storeDir, punctPpmCeiling, sampleRatePpm)
      }
      .start()
    q.awaitTermination()
    summary
  }

  private def drainBatch(pinned: DataFrame, storeDir: String,
      punctPpmCeiling: Long, sampleRatePpm: Option[Long]): CrawlSummary = {
    val spark = pinned.sparkSession
    val archive = readOrEmpty(spark, archiveDir(storeDir), ArchSchema)
      .localCheckpoint()
    val arrived = pinned.count()

    // same-batch doc_id dedup, deterministic min-struct winner
    val batch = pinned
      .groupBy(col("doc_id"))
      .agg(min(struct(col("url"), col("text"))).as("w"))
      .select(col("doc_id"), col("w.url").as("url"),
        col("w.text").as("text"))

    // redelivery skip: only doc_ids the archive has never seen
    val fresh = batch
      .join(archive.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nFresh = fresh.count()

    // gate 1+2a: scope, canonicalize, within-batch URL winner
    val scoped = fresh
      .withColumn("in_scope",
        UrlScope.classify(col("url")).getField("in_scope"))
      .withColumn("norm_url", UrlNormalize.norm(col("url")))
      .withColumn("domain",
        regexp_extract(col("norm_url"), "^[a-z]+://([^/]+)", 1))
    val batchWin = scoped.filter(col("in_scope"))
      .groupBy(col("norm_url")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).withColumn("bw", lit(true))
    // gate 2b: the PERSISTED winner index — norm URLs won in any
    // earlier batch (column-pruned archive scan, semi-probe shape)
    val seenUrls = archive.filter(col("url_winner"))
      .select(col("norm_url")).withColumn("seen", lit(true))
      .dropDuplicates("norm_url")
    val won = scoped
      .join(batchWin, Seq("doc_id"), "left")
      .join(seenUrls, Seq("norm_url"), "left")
      .withColumn("url_winner", col("in_scope") &&
        coalesce(col("bw"), lit(false)) &&
        !coalesce(col("seen"), lit(false)))
      .withColumn("npunct",
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long"))
      .withColumn("nchars", length(col("text")).cast("long"))

    // gate 3: cumulative per-domain verdict INCLUDING this batch's
    // winners (narrow integer fold; bodies never shuffle)
    val verdicts = archive.filter(col("url_winner"))
      .select(col("domain"), col("npunct"), col("nchars"))
      .unionByName(won.filter(col("url_winner"))
        .select(col("domain"), col("npunct"), col("nchars")))
      .groupBy(col("domain"))
      .agg(expr("sum(npunct) * 1000000 div sum(nchars)").as("dppm"))
      .select(col("domain"),
        (col("dppm") < punctPpmCeiling).as("dp"))

    // gate 4: deterministic md5-coin admission (replay flips no coins)
    val rate = sampleRatePpm.map(lit).getOrElse(
      least(lit(1000000L), greatest(lit(0L),
        lit(500000L) + QualityModel.rawScore(col("text")) * 250)))
    val flagged = won.join(broadcast(verdicts), Seq("domain"), "left")
      .withColumn("domain_pass",
        col("url_winner") && coalesce(col("dp"), lit(false)))
      .withColumn("admitted", col("domain_pass") &&
        when(col("domain_pass"),
          Dedup.md5Hash32(col("doc_id").cast("string"), "ci:")
            % 1000000L < rate).otherwise(lit(false)))
      .localCheckpoint()

    // ONE aggregation over the checkpointed batch serves all four
    // funnel counters (previously four count jobs over the same rows)
    val cnts = flagged.agg(
      count(when(col("in_scope"), 1)).as("ns"),
      count(when(col("url_winner"), 1)).as("nw"),
      count(when(col("domain_pass"), 1)).as("nd"),
      count(when(col("admitted"), 1)).as("na")).head()
    val (nScope, nWin, nDomain, nAdmit) =
      (cnts.getLong(0), cnts.getLong(1), cnts.getLong(2), cnts.getLong(3))

    // ARCHIVE FIRST (idempotence source of truth), corpus second with
    // crash-orphan repair — the DomainReputationJob write discipline
    flagged
      .select(col("doc_id"), col("domain"), col("norm_url"),
        col("in_scope"), col("url_winner"), col("domain_pass"),
        col("admitted"), col("npunct"), col("nchars"))
      .write.mode("append").parquet(archiveDir(storeDir))
    val corpusIds = readOrEmpty(spark, corpusDir(storeDir),
      "doc_id BIGINT, domain STRING, url STRING, text STRING")
      .select(col("doc_id"))
    val orphans = batch
      .join(archive.filter(col("admitted")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .join(corpusIds, Seq("doc_id"), "left_anti")
      .join(archive.select(col("doc_id"), col("domain"), col("norm_url")),
        Seq("doc_id"))
    flagged.filter(col("admitted"))
      .select(col("doc_id"), col("domain"),
        col("norm_url").as("url"), col("text"))
      .unionByName(orphans.select(col("doc_id"), col("domain"),
        col("norm_url").as("url"), col("text")))
      .write.mode("append").parquet(corpusDir(storeDir))

    CrawlSummary(1, arrived, arrived - nFresh, nFresh - nScope,
      nScope - nWin, nWin - nDomain, nDomain - nAdmit, nAdmit)
  }
}
