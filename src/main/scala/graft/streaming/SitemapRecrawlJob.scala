package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.text.{Sitemap, UrlNormalize, UrlScope}

/** STREAMING sitemap-driven recrawl — the incremental twin of the
  * batch `sitemap_frontier` query, and the freshness loop production
  * crawlers actually run: sitemap snapshots are re-fetched
  * continuously, and a URL becomes a fetch task only when the sitemap
  * PROVES there is something new — it is unseen, or its `lastmod`
  * advanced past the last one scheduled. Per drained batch of
  * `(host, sm_url, xml)` snapshots:
  *
  *   1. parse `<url>` entries ([[Sitemap.entries]]), drop loc-less and
  *      cross-host entries (the protocol guard), canonicalize
  *      ([[UrlNormalize]]) and scope-gate ([[UrlScope]]);
  *   2. collapse same-batch duplicates per URL (max lastmod / max
  *      priority — two sitemaps of one host may both list a URL);
  *   3. classify against the persisted per-URL state: 'new' (never
  *      seen), 'updated' (lastmod strictly newer than every lastmod
  *      seen so far — including the first non-null after unknown),
  *      or silent skip (same/older/absent lastmod: the sitemap proves
  *      nothing, the regular recrawl cadence owns it);
  *   4. append fetch tasks, then append state.
  *
  * State is append-only narrow parquet (`seen(url, lastmod)`): the
  * effective state is `groupBy(url).max(lastmod)` — a MONOTONE fold,
  * so replays and duplicate appends can never move a URL backwards.
  * Write order is TASKS FIRST, state second: a crash between the two
  * appends leaves state un-advanced, the redelivered batch re-derives
  * the SAME task keys, and [[tasks]]' reader-side key dedup
  * (url, lastmod) makes the re-append a no-op — the FrontierJob /
  * CrawlIngestJob crash-window discipline.
  *
  * Scale shape: sitemap bodies explode to entry rows at the scan and
  * never shuffle again; every exchanged relation is (url, date, pm)-
  * narrow; the state probe is one key-partitioned aggregate + join.
  */
object SitemapRecrawlJob {

  final case class RecrawlSummary(
      batches: Int,
      snapshots: Long,
      entries: Long,
      droppedGuards: Long,
      newUrls: Long,
      updated: Long,
      unchanged: Long) {
    def +(o: RecrawlSummary): RecrawlSummary = RecrawlSummary(
      batches + o.batches, snapshots + o.snapshots, entries + o.entries,
      droppedGuards + o.droppedGuards, newUrls + o.newUrls,
      updated + o.updated, unchanged + o.unchanged)
  }

  private val Empty = RecrawlSummary(0, 0L, 0L, 0L, 0L, 0L, 0L)

  private def seenDir(storeDir: String) = s"$storeDir/seen"
  private def tasksDir(storeDir: String) = s"$storeDir/tasks"

  private val SeenSchema = "url STRING, lastmod DATE"
  private val TasksSchema =
    "url STRING, lastmod DATE, reason STRING, priority_pm BIGINT"

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** One AvailableNow drain of `sitemapsDir` (parquet rows
    * `host STRING, sm_url STRING, xml STRING`) into `storeDir`. */
  def runOnce(
      spark: SparkSession,
      sitemapsDir: String,
      storeDir: String,
      checkpointDir: String): RecrawlSummary = {
    var summary = Empty
    val q = spark.readStream
      .schema("host STRING, sm_url STRING, xml STRING")
      .parquet(sitemapsDir)
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
      storeDir: String): RecrawlSummary = {
    val spark = pinned.sparkSession
    val nSnapshots = pinned.count()

    // parse + protocol guards + canonicalize + scope (all row-local)
    val flat = pinned
      .select(col("host"), explode(Sitemap.entries(col("xml"))).as("e"))
    val nEntries = flat.count()
    val scoped = flat
      .filter(col("e.loc") =!= "" &&
        Sitemap.sameHost(col("e.loc"), col("host")))
      .select(UrlNormalize.norm(col("e.loc")).as("url"),
        col("e.lastmod").as("lastmod"),
        col("e.priority_pm").as("priority_pm"))
      .filter(UrlScope.classify(col("url")).getField("in_scope"))
    // same-batch collapse: one row per URL (freshest lastmod wins;
    // max priority is the deterministic tie companion)
    val batch = scoped
      .groupBy(col("url"))
      .agg(max(col("lastmod")).as("lastmod"),
        max(col("priority_pm")).as("priority_pm"))
      .localCheckpoint()
    val nScoped = batch.agg(count(lit(1))).collect()(0).getLong(0)

    // effective persisted state: max lastmod per seen URL (monotone)
    val seen = readOrEmpty(spark, seenDir(storeDir), SeenSchema)
      .groupBy(col("url")).agg(max(col("lastmod")).as("seen_lastmod"))
      .localCheckpoint()

    // the left-join cannot distinguish "unseen URL" from "seen with
    // NULL lastmod" by seen_lastmod alone — carry an explicit marker
    val seenMarked = seen.withColumn("__seen", lit(true))
    val decided = batch
      .join(seenMarked, Seq("url"), "left")
      .withColumn("reason",
        when(col("__seen").isNull, "new")
          .when(col("lastmod").isNotNull &&
            (col("seen_lastmod").isNull ||
              col("lastmod") > col("seen_lastmod")), "updated"))
      .localCheckpoint()

    val emit = decided.filter(col("reason").isNotNull)
    // one aggregation over the checkpointed decisions serves both
    // reason counters (previously two count jobs over the same rows)
    val reasons = decided.agg(
      count(when(col("reason") === "new", 1)).as("nn"),
      count(when(col("reason") === "updated", 1)).as("nu")).head()
    val (nNew, nUpd) = (reasons.getLong(0), reasons.getLong(1))

    // TASKS FIRST, state second (crash-safe: redelivery re-derives the
    // same (url, lastmod) keys; tasks() dedups on that key)
    emit.select(col("url"), col("lastmod"), col("reason"),
        col("priority_pm"))
      .write.mode("append").parquet(tasksDir(storeDir))
    decided.select(col("url"), col("lastmod"))
      .write.mode("append").parquet(seenDir(storeDir))

    RecrawlSummary(1, nSnapshots, nEntries, nEntries - nScoped,
      nNew, nUpd, nScoped - nNew - nUpd)
  }

  /** The fetch queue: emitted tasks, replay-deduplicated on the
    * (url, lastmod) task key (last reason/priority winner is
    * deterministic: 'updated' sorts above 'new', max priority). */
  def tasks(spark: SparkSession, storeDir: String): DataFrame =
    readOrEmpty(spark, tasksDir(storeDir), TasksSchema)
      .groupBy(col("url"), col("lastmod"))
      .agg(max(col("reason")).as("reason"),
        max(col("priority_pm")).as("priority_pm"))

  /** [[tasks]] in fetch order: protocol-default priority (500pm) for
    * unstated, descending, then URL — the `sitemap_frontier`
    * ordering. */
  def orderedTasks(spark: SparkSession, storeDir: String): DataFrame =
    tasks(spark, storeDir)
      .withColumn("sort_pm", coalesce(col("priority_pm"), lit(500L)))
      .orderBy(col("sort_pm").desc, col("url"))
}
