package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.text.{HtmlExtract, UrlNormalize, UrlScope}

/** The STREAMING frontier — the incremental twin of the batch
  * `crawl_frontier` query, and the piece that makes a crawler a
  * crawler: fetched pages arrive continuously, each drain extracts
  * their links, and genuinely NEW work accumulates in a persisted
  * frontier while everything already crawled or already discovered is
  * skipped. Per batch:
  *
  *   1. same-batch page dedup (deterministic min-struct winner) and
  *      redelivery skip against the persisted `crawled` set;
  *   2. link extraction ([[HtmlExtract.links]]) and resolution
  *      against EACH PAGE'S OWN origin ([[HtmlExtract.resolveCol]] —
  *      a multi-host crawl cannot share one base URL);
  *   3. canonicalization + crawl-scope gate ([[UrlNormalize]],
  *      [[UrlScope]] — the same row-local rules as the batch query);
  *   4. novelty anti-joins: a discovered URL enters the frontier only
  *      if it is not already crawled, not already IN the frontier,
  *      and not one of this batch's own pages (first discovery wins,
  *      min source doc breaks same-batch ties).
  *
  * State is two append-only narrow parquet sets under `storeDir`:
  * `crawled(doc_id, norm_url)` — the redelivery-skip source of truth
  * — and `frontier(norm_url, src_doc)` holding each discovered URL
  * exactly once. Write order is FRONTIER FIRST, crawled second: a
  * crash between the writes leaves pages un-crawled-marked, so the
  * redelivered batch recomputes their links, the frontier anti-join
  * makes the re-append a no-op, and the crawled append completes —
  * neither order-induced loss nor duplication (the
  * DomainReputationJob / CrawlIngestJob write discipline, mirrored).
  *
  * Scale shape: link extraction is row-local projection; the only
  * exchanges are the norm-URL anti-join probes and a per-URL min —
  * all on narrow (url, id) rows. Page bodies never shuffle, and the
  * persisted sets are column-pruned scans (at crawl scale, a bloom or
  * bucketed layout on norm_url drops the probe cost further — the
  * same index-probe shape as [[graft.dedup.IncrementalDedup]]).
  */
object FrontierJob {

  final case class FrontierSummary(
      batches: Int,
      arrived: Long,
      skippedRedelivered: Long,
      linksExtracted: Long,
      outOfScope: Long,
      alreadyKnown: Long,
      discovered: Long) {
    def +(o: FrontierSummary): FrontierSummary = FrontierSummary(
      batches + o.batches, arrived + o.arrived,
      skippedRedelivered + o.skippedRedelivered,
      linksExtracted + o.linksExtracted, outOfScope + o.outOfScope,
      alreadyKnown + o.alreadyKnown, discovered + o.discovered)
  }

  private val Empty = FrontierSummary(0, 0L, 0L, 0L, 0L, 0L, 0L)

  private def crawledDir(storeDir: String) = s"$storeDir/crawled"
  private def frontierDir(storeDir: String) = s"$storeDir/frontier"

  private val CrawledSchema = "doc_id BIGINT, norm_url STRING"
  private val FrontierSchema = "norm_url STRING, src_doc BIGINT"

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** One AvailableNow drain of `pagesDir` (parquet rows
    * `doc_id BIGINT, url STRING, html STRING`) into `storeDir`. */
  def runOnce(
      spark: SparkSession,
      pagesDir: String,
      storeDir: String,
      checkpointDir: String): FrontierSummary = {
    var summary = Empty
    val q = spark.readStream
      .schema("doc_id BIGINT, url STRING, html STRING")
      .parquet(pagesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = summary + drainBatch(batch.localCheckpoint(), storeDir)
      }
      .start()
    q.awaitTermination()
    summary
  }

  private def drainBatch(pinned: DataFrame,
      storeDir: String): FrontierSummary = {
    val spark = pinned.sparkSession
    val crawled = readOrEmpty(spark, crawledDir(storeDir), CrawledSchema)
      .localCheckpoint()
    val frontier = readOrEmpty(spark, frontierDir(storeDir),
      FrontierSchema).localCheckpoint()
    val arrived = pinned.count()

    // same-batch page dedup + redelivery skip (doc_id-keyed, like the
    // sibling jobs: a crawler's fetch ids are unique per page fetch)
    val batch = pinned
      .groupBy(col("doc_id"))
      .agg(min(struct(col("url"), col("html"))).as("w"))
      .select(col("doc_id"), col("w.url").as("url"),
        col("w.html").as("html"))
    val fresh = batch
      .join(crawled.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("norm_url", UrlNormalize.norm(col("url")))
      .withColumn("origin",
        regexp_extract(col("norm_url"), "^([a-z]+://[^/]+)", 1))
      .localCheckpoint()
    val nFresh = fresh.count()

    // links: extract, resolve against the PAGE's origin, canonicalize
    val resolved = fresh
      .select(col("doc_id"), col("origin"),
        explode(HtmlExtract.links(col("html"))).as("href"))
      .select(col("doc_id"),
        UrlNormalize.norm(
          HtmlExtract.resolveCol(col("href"), col("origin")))
          .as("norm_url"))
      .localCheckpoint()
    val scoped = resolved
      .filter(UrlScope.classify(col("norm_url")).getField("in_scope"))
    // one aggregation over the checkpointed links serves the link AND
    // in-scope counters (previously two jobs, the second re-running
    // the scope classifier over the same checkpointed rows)
    val linkCnts = resolved.agg(
      count(lit(1)).as("nl"),
      count(when(UrlScope.classify(col("norm_url"))
        .getField("in_scope"), 1)).as("nsc")).head()
    val (nLinks, nScoped) = (linkCnts.getLong(0), linkCnts.getLong(1))

    // novelty: collapse to min source per URL, then subtract
    // everything known — crawled pages, the existing frontier, and
    // this batch's own pages
    val candidates = scoped
      .groupBy(col("norm_url"))
      .agg(min(col("doc_id")).as("src_doc"))
    val known = crawled.select(col("norm_url"))
      .unionByName(frontier.select(col("norm_url")))
      .unionByName(fresh.select(col("norm_url")))
      .dropDuplicates("norm_url")
    val discovered = candidates
      .join(known, Seq("norm_url"), "left_anti")
      .localCheckpoint()
    val nDiscovered = discovered.count()

    // FRONTIER FIRST, crawled second (crash-safe either way: replayed
    // pages re-derive links, the anti-join re-append is a no-op, and
    // the crawled append completes)
    discovered.select(col("norm_url"), col("src_doc"))
      .write.mode("append").parquet(frontierDir(storeDir))
    fresh.select(col("doc_id"), col("norm_url"))
      .write.mode("append").parquet(crawledDir(storeDir))

    FrontierSummary(1, arrived, arrived - nFresh, nLinks,
      nLinks - nScoped, nScoped - nDiscovered, nDiscovered)
  }

  /** The work queue: discovered URLs not yet crawled (a frontier URL
    * vanishes here the moment the fetched page flows through). */
  def pending(spark: SparkSession, storeDir: String): DataFrame =
    readOrEmpty(spark, frontierDir(storeDir), FrontierSchema)
      .join(readOrEmpty(spark, crawledDir(storeDir), CrawledSchema)
        .select(col("norm_url")), Seq("norm_url"), "left_anti")

  /** Politeness-budgeted work queue: at most `perHost` URLs per host
    * (deterministic (src_doc, norm_url) order) — the per-drain fetch
    * allotment that keeps a crawler from hammering one server while
    * the long tail starves. */
  def pendingBudget(spark: SparkSession, storeDir: String,
      perHost: Int): DataFrame = {
    require(perHost >= 1, s"perHost must be positive, got $perHost")
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(regexp_extract(col("norm_url"),
        "^[a-z]+://([^/]+)", 1))
      .orderBy(col("src_doc"), col("norm_url"))
    pending(spark, storeDir)
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= perHost)
      .select(col("norm_url"), col("src_doc"), col("slot"))
  }
}
