package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.analysis.Bm25
import graft.search.HybridSearch

/** STANDING-QUERY hybrid search — the streaming twin of
  * `search_rrf_hybrid`: documents (with their embeddings) arrive in
  * micro-batches, each drain appends their postings to a persisted
  * BM25 index for the registered query terms plus a dense vector
  * store, and the fused lexical+dense top-k ([[HybridSearch.rrf]]'s
  * exact arithmetic) is re-derivable from state at any moment. This is
  * the continuous-query shape of a retrieval stack: the query stands,
  * the corpus streams past it.
  *
  * State is three narrow append-only parquet relations under
  * `storeDir`:
  *   - `lens(doc_id, dl)` — one row per indexed doc (zero-match docs
  *     included; they carry the corpus stats) and the redelivery-skip
  *     SOURCE OF TRUTH;
  *   - `tfs(doc_id, dl, term, tf)` — positive postings for the
  *     standing terms;
  *   - `emb(doc_id, v)` — dense vectors.
  *
  * Write order is postings/vectors FIRST, lens LAST: a crash before
  * the lens append leaves orphan postings, the redelivered batch
  * recomputes them identically (deterministic projection of the same
  * rows), and every state read collapses duplicates by exact key
  * before scoring — so the crash window produces neither loss nor
  * double-counted stats (the FrontierJob / DomainReputationJob
  * discipline, applied to an index).
  *
  * Scale shape: the per-batch work is one row-local projection +
  * narrow anti-join against lens; scoring reads only (id, small)
  * columns, ranks through the range-partitioned global row number,
  * and truncates both lists BEFORE the fusion join. The dense side is
  * the brute-force seed scan here; at corpus scale it swaps for the
  * IVF probe ([[graft.sim.IvfPq]]) without touching the fusion — the
  * same boundary as the batch query. */
object StandingSearchJob {

  final case class SearchSummary(
      batches: Int,
      arrived: Long,
      skippedRedelivered: Long,
      indexed: Long) {
    def +(o: SearchSummary): SearchSummary = SearchSummary(
      batches + o.batches, arrived + o.arrived,
      skippedRedelivered + o.skippedRedelivered, indexed + o.indexed)
  }

  private val Empty = SearchSummary(0, 0L, 0L, 0L)

  private def lensDir(storeDir: String) = s"$storeDir/lens"
  private def tfsDir(storeDir: String) = s"$storeDir/tfs"
  private def embDir(storeDir: String) = s"$storeDir/emb"

  /** Existence-gated state read (the DomainReputationJob rule: absent
    * dir = first drain; a READ failure must propagate, never read as
    * empty state). */
  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  private val LensSchema = "doc_id BIGINT, dl BIGINT"
  private val TfsSchema = "doc_id BIGINT, dl BIGINT, term STRING, tf BIGINT"
  private val EmbSchema = "doc_id BIGINT, v ARRAY<DOUBLE>"

  /** One AvailableNow drain of `docsDir` (parquet rows
    * `doc_id BIGINT, text STRING, embedding ARRAY<DOUBLE>`).
    * `maxFilesPerTrigger > 0` splits the available files into that many
    * per micro-batch — one stream startup, several incremental drains
    * (the shape the oracle-gated `search_rrf_standing` runs). */
  def runOnce(
      spark: SparkSession,
      docsDir: String,
      storeDir: String,
      checkpointDir: String,
      terms: Seq[String],
      maxFilesPerTrigger: Int = 0): SearchSummary = {
    // Written on the stream's micro-batch thread (inside foreachBatch),
    // read on the caller thread after awaitTermination(): @volatile
    // makes that cross-thread read a guaranteed happens-before rather
    // than relying on incidental synchronization in the engine.
    @volatile var summary = Empty
    val reader = spark.readStream
      .schema("doc_id BIGINT, text STRING, embedding ARRAY<DOUBLE>")
    val limited =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    val q = limited
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = summary + drainBatch(batch.localCheckpoint(),
          storeDir, terms)
      }
      .start()
    q.awaitTermination()
    summary
  }

  private def drainBatch(pinned: DataFrame, storeDir: String,
      terms: Seq[String]): SearchSummary = {
    val spark = pinned.sparkSession
    val arrived = pinned.count()
    // same-batch dedup (deterministic min-struct winner), then
    // redelivery skip against the lens source of truth
    val batch = pinned
      .groupBy(col("doc_id"))
      .agg(min(struct(col("text"), col("embedding"))).as("w"))
      .select(col("doc_id"), col("w.text").as("text"),
        col("w.embedding").as("embedding"))
    val lens = readOrEmpty(spark, lensDir(storeDir), LensSchema)
    val fresh = batch
      .join(lens.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val nFresh = fresh.count()
    if (nFresh > 0) {
      val indexed = Bm25.docIndex(fresh, terms).localCheckpoint()
      // postings + vectors first, lens LAST (see write-order contract)
      indexed
        .select(col("doc_id"), col("dl"), explode(col("tfs")).as("x"))
        .select(col("doc_id"), col("dl"), col("x.term").as("term"),
          col("x.tf").as("tf"))
        .filter(col("tf") > 0)
        .write.mode("append").parquet(tfsDir(storeDir))
      // docs without a dense vector still index lexically (they carry
      // corpus stats and BM25 ranks) — only non-null vectors land in
      // the dense store, mirroring the batch query's full-outer fusion
      fresh.filter(col("embedding").isNotNull)
        .select(col("doc_id"),
          col("embedding").cast("array<double>").as("v"))
        .write.mode("append").parquet(embDir(storeDir))
      indexed.select(col("doc_id"), col("dl"))
        .write.mode("append").parquet(lensDir(storeDir))
    }
    SearchSummary(1, arrived, arrived - nFresh, nFresh)
  }

  /** The standing query's current fused top-k from persisted state —
    * [[HybridSearch.rrfFromScores]] over [[Bm25.scoreFromIndex]], with
    * crash-orphan postings collapsed by exact key first. Output schema
    * matches the batch `search_rrf_hybrid` exactly. */
  def results(spark: SparkSession, storeDir: String): DataFrame = {
    val lens = readOrEmpty(spark, lensDir(storeDir), LensSchema)
      .dropDuplicates("doc_id")
    val tfs = readOrEmpty(spark, tfsDir(storeDir), TfsSchema)
      .dropDuplicates("doc_id", "term")
      // orphan postings (crash before the lens append) stay invisible
      // until their doc commits to the lens
      .join(lens.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val emb = readOrEmpty(spark, embDir(storeDir), EmbSchema)
      .dropDuplicates("doc_id")
      .join(lens.select(col("doc_id")), Seq("doc_id"), "left_semi")
    HybridSearch.rrfFromScores(Bm25.scoreFromIndex(lens, tfs), emb)
  }
}
