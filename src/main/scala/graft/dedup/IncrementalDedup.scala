package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate filtering — the production shape of corpus
  * construction: documents arrive in batches and each batch must dedup
  * against everything ALREADY ACCEPTED without rescanning the corpus.
  *
  * The accepted corpus keeps two stores:
  *   - `docs`:  (doc_id, text) — accepted documents
  *   - `bands`: (bk, doc_id)  — MinHash-LSH band index over them
  *
  * Both stores are HASH-BUCKETED hive partitions (`b=<k>`, Murmur3 of
  * the key mod the store's bucket count, recorded once in a
  * `_buckets_<n>` marker — the ANN ledger's discipline,
  * [[graft.sim.IncrementalAnnIndex]]): docs bucket on doc_id, bands on
  * the band key. Every store-side read a batch performs — the
  * redelivery skip, the band-index probe, the matched-docs fetch for
  * the rescore — statically prunes to the buckets the BATCH's keys
  * hash to, so per-batch I/O is |batch's buckets| x (|corpus| /
  * buckets), never a corpus scan; at 10B docs a deployment inits with
  * O(1000) buckets and a batch touches a sliver. A legacy FLAT store
  * (no marker) backfills into the bucketed layout on first touch —
  * one columnar scan per tree, committed by an atomic directory
  * rename, re-runnable after a crash.
  *
  * Per batch, candidate generation touches only band-key matches (an
  * equi-join of the batch's band keys against the PRUNED index — at
  * 100 TB this is the difference between probing an index and
  * re-shingling the corpus), and the exact-Jaccard rescore re-shingles
  * just the matched accepted docs. In-batch near-dups resolve by sequential-greedy
  * semantics (identical to processing the docs one at a time in id
  * order, so batching never changes the accepted set — see
  * processBatch). Re-delivered doc_ids are recognized and skipped, so
  * replaying a batch is a no-op (the same idempotence discipline as
  * KeyedUpsertSink).
  */
object IncrementalDedup {

  final case class BatchResult(accepted: Long, rejectedNearDup: Long,
      skippedRedelivered: Long)

  /** Cap on greedy in-batch resolution rounds (= longest similarity
    * dependency chain resolved exactly; realistic batches need < 5). */
  val MaxGreedyRounds = 64

  private def docsPath(store: String) = s"$store/docs"
  private def bandsPath(store: String) = s"$store/bands"

  /** Default store bucket count — like the ANN ledger's: enough that a
    * small batch prunes most of the corpus, few enough that per-batch
    * appends don't shatter into near-empty files. Fixed at store
    * CREATION by the `_buckets_<n>` marker (the first
    * [[processBatch]]/[[probeStorePairs]] call's `storeBuckets`
    * argument); 16 suits the gate scales, a 10B-doc deployment inits
    * with O(1000). A live store re-buckets through [[rebucketStore]] —
    * an explicit O(store) rewrite, never a silent reinterpretation. */
  val DefaultStoreBuckets = 16

  private val BucketsRe = "_buckets_(\\d+)".r
  private val RebucketRe = "_rebucket_(\\d+)".r
  private val ThresholdRe = "_threshold_(\\d+)".r

  private def thresholdPpm(t: Double): Long = math.round(t * 1000000L)

  /** Admission threshold the store was created with, from its
    * `_threshold_<ppm>` marker, if stamped. Two racing creators with
    * DIFFERENT thresholds can each create their differently-named
    * marker (create-if-absent cannot arbitrate across names), so
    * resolution is deterministic — the LOWEST ppm wins, never listing
    * order — and [[ensureThreshold]] re-reads after stamping so the
    * race's loser refuses instead of proceeding on its own value. */
  private def thresholdOf(
      spark: SparkSession, store: String): Option[Long] = {
    val hp = new Path(store)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) None
    else fs.listStatus(hp).toSeq.flatMap { f =>
      f.getPath.getName match {
        case ThresholdRe(n) if f.isFile => Some(n.toLong)
        case _                          => None
      }
    }.minOption
  }

  /** Resolve the ADMISSION threshold for a store-mutating call. The
    * store records its threshold at creation (`_threshold_<ppm>` — the
    * same marker discipline as `_buckets_`): one store is ONE
    * admission regime, so two drains (or a drain and an ad-hoc call)
    * can never silently mix thresholds. A default call follows the
    * marker; an explicit non-default threshold that disagrees with it
    * refuses loudly (change of regime = a rebuild into a fresh store,
    * not a flag flip). Read-side probes ([[probeStorePairs]]) stay
    * per-call — a query threshold is a question, not an admission. A
    * pre-marker store (or a first call) stamps the calling threshold. */
  private def ensureThreshold(spark: SparkSession, store: String,
      requested: Double): Double = {
    val reqPpm = thresholdPpm(requested)
    // converge a raced store to its single winning marker: losers are
    // inert under the deterministic min rule, but leaving them would
    // make the store's layout lie about its regime to a human reader
    locally {
      val hp = new Path(store)
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(hp)) {
        val marks = fs.listStatus(hp).toSeq.filter(f =>
          f.isFile && ThresholdRe.matches(f.getPath.getName))
        if (marks.size > 1) {
          val keep = marks.map(_.getPath.getName).min(
            Ordering.by((n: String) =>
              n match { case ThresholdRe(p) => p.toLong }))
          marks.filterNot(_.getPath.getName == keep)
            .foreach(f => fs.delete(f.getPath, false))
        }
      }
    }
    thresholdOf(spark, store) match {
      case Some(ppm) if ppm == reqPpm => requested
      case Some(ppm) =>
        require(reqPpm == thresholdPpm(Dedup.JaccardThreshold),
          s"$store was created with admission threshold " +
            s"${ppm / 1e6} (_threshold_$ppm) but this call passed " +
            s"$requested — one store is one admission regime; use the " +
            "store's threshold, or rebuild into a fresh store to " +
            "change it")
        ppm / 1e6 // default call: the marker wins
      case None =>
        val hp = new Path(store)
        val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
        fs.mkdirs(hp)
        try fs.create(new Path(hp, s"_threshold_$reqPpm"), false).close()
        catch { case _: java.io.IOException => () } // concurrent stamp
        // re-read: a concurrent creator may have stamped a DIFFERENT
        // ppm (different marker names never collide on create), and
        // the deterministic winner must gate this call too
        thresholdOf(spark, store) match {
          case Some(ppm) if ppm != reqPpm =>
            require(reqPpm == thresholdPpm(Dedup.JaccardThreshold),
              s"$store concurrently recorded admission threshold " +
                s"${ppm / 1e6} (_threshold_$ppm) but this call passed " +
                s"$requested — one store is one admission regime")
            ppm / 1e6
          case _ => requested
        }
    }
  }

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** Stable key→bucket map (Murmur3 mod n — engine-internal, never
    * oracle-compared). The key is CANONICALIZED to long before
    * hashing: Spark's hash() is type-sensitive (hash(7) != hash(7L)),
    * so a batch whose doc_id arrived as int would otherwise hash to
    * the wrong buckets and silently miss redeliveries and candidates
    * the join's implicit coercion used to catch — write and probe
    * sides must bucket through the same canonical type.
    *
    * API boundary contract: store keys are LONG-CASTABLE ids, enforced
    * loudly per batch ([[requireCastableKeys]]). A store whose bucket
    * partitions predate the canonical cast (written from int-typed ids
    * under the old hash(int) scheme) is mis-bucketed under this map;
    * [[rebucketStore]] to the same count rewrites it through the
    * canonical hash and is the supported migration. */
  private def bucketCol(key: Column, nb: Int): Column =
    pmod(hash(key.cast("long")), lit(nb))

  /** Fail loudly — with a message naming the column and the canonical
    * type — when any `doc_id` is NULL or not castable to long: under
    * legacy cast semantics every such row becomes a null key and
    * `dropDuplicates` silently collapses the lot into one doc (a
    * destroyed batch, not a dedup decision), while ANSI mode would
    * throw a bare cast error from deep inside the first store job.
    * `try_cast` probes without tripping ANSI; castable string/int ids
    * pass. One batch-sized aggregation. */
  private def requireCastableKeys(batch: DataFrame, op: String): Unit = {
    val bad = batch.agg(
      count(when(col("doc_id").try_cast("long").isNull, 1)))
      .head().getLong(0)
    require(bad == 0,
      s"$op: $bad doc_id value(s) are NULL or not castable to long " +
        "(the store's canonical key type) — non-integral ids would " +
        "silently collapse into one null-keyed doc; supply integral " +
        "ids (or pre-map string ids to longs) instead")
  }

  /** The batch's bucket set under `key` — driver-sized (≤ nb ints),
    * pushed as an IN-filter so store reads statically prune. */
  private def bucketSet(df: DataFrame, key: Column, nb: Int): Seq[Int] =
    df.select(bucketCol(key, nb).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** A store tree pruned to `buckets` (package-visible so the spec can
    * assert the static pruning on the physical plan). */
  private[graft] def treeFor(spark: SparkSession, path: String,
      buckets: Seq[Int]): DataFrame =
    spark.read.parquet(path).filter(col("b").isin(buckets: _*))

  /** Bucket count from the store marker, if the store is bucketed. */
  private def bucketsOf(spark: SparkSession, store: String): Option[Int] = {
    val hp = new Path(store)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) None
    else fs.listStatus(hp).toSeq.flatMap { f =>
      f.getPath.getName match {
        case BucketsRe(n) if f.isFile => Some(n.toInt)
        case _                        => None
      }
    }.headOption
  }

  /** Tree holds FLAT legacy data: parquet files directly under the
    * root instead of `b=` partitions. */
  private def hasFlatData(spark: SparkSession, p: String): Boolean = {
    val hp = new Path(p)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(hp) && fs.listStatus(hp).exists(f =>
      f.isFile && !f.getPath.getName.startsWith("_"))
  }

  /** Bucket the store (create the marker; backfill any legacy flat
    * tree into `b=` partitions first — one columnar scan per tree).
    * The per-tree swap is crash-safe through two sibling dirs:
    * `<tree>.bktmp` (the bucketed copy being written) and
    * `<tree>.flat` (the retired flat tree, moved aside by one rename);
    * [[recoverBackfill]] finishes or unwinds any crash point, so the
    * tree is never lost and the backfill simply re-runs. A pending
    * [[rebucketStore]] intent finishes FIRST, so no caller can read a
    * bucket count the layout doesn't have. `requested` binds only at
    * store creation; an existing marker wins. Returns the store's
    * bucket count. */
  private def ensureBuckets(spark: SparkSession, store: String,
      requested: Int = DefaultStoreBuckets): Int = {
    recoverBackfill(spark, store)
    pendingRebucket(spark, store).foreach(n => doRebucket(spark, store, n))
    bucketsOf(spark, store).getOrElse {
      require(requested > 0, s"storeBuckets must be positive: $requested")
      val nb = requested
      val hp = new Path(store)
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      def backfill(path: String, key: String): Unit =
        if (hasFlatData(spark, path))
          swapTree(spark, path) { tmp =>
            spark.read.parquet(path)
              .withColumn("b", bucketCol(col(key), nb))
              .repartition(col("b"))
              .write.partitionBy("b").parquet(tmp)
          }
      backfill(docsPath(store), "doc_id")
      backfill(bandsPath(store), "bk")
      fs.mkdirs(hp)
      try fs.create(new Path(hp, s"_buckets_$nb"), false).close()
      catch { case _: java.io.IOException => () } // concurrent stamp
      nb
    }
  }

  /** Pending re-bucket target from a crashed [[rebucketStore]]'s
    * intent marker, if any. Racing/crashed intents can leave SEVERAL
    * markers; resolution must be deterministic (not listing-order),
    * so the HIGHEST count wins — [[doRebucket]] then clears every
    * intent in one pass, so the losers can never re-trigger a second
    * O(store) rewrite on a later touch. */
  private def pendingRebucket(
      spark: SparkSession, store: String): Option[Int] = {
    val hp = new Path(store)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) None
    else fs.listStatus(hp).toSeq.flatMap { f =>
      f.getPath.getName match {
        case RebucketRe(n) if f.isFile => Some(n.toInt)
        case _                         => None
      }
    }.maxOption
  }

  /** Re-bucket a live store to `buckets` — the operator the bucket
    * count's creation-time immutability otherwise forbids: a corpus
    * that outgrew its creation-time count (per-bucket scan width is
    * |corpus| / buckets) rewrites BOTH trees to the new count through
    * the same crash-safe staged swap as the legacy migration, under an
    * intent marker (`_rebucket_<n>`): a crash at ANY point re-runs to
    * completion on the next store touch ([[ensureBuckets]] finishes a
    * pending re-bucket BEFORE reading the count), so no probe can ever
    * prune with a count the layout doesn't match — the silent-miss
    * mode a half-migrated store would otherwise have. O(store) by
    * design — one columnar scan per tree, run at rebuild cadence, not
    * per batch. The redelivery skip and all probes carry over
    * unchanged: bucket membership is a pure function of (key, count).
    * No-op when the store already has `buckets`. A pending intent from
    * a CRASHED earlier re-bucket (same count or different) is adopted
    * and finished FIRST — deterministically, highest count wins when
    * several markers coexist — and [[doRebucket]] clears every intent
    * marker it finds, so this call's own intent can never be shadowed
    * by, nor leave behind, a stale one. */
  def rebucketStore(spark: SparkSession, storeDir: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    recoverBackfill(spark, storeDir)
    pendingRebucket(spark, storeDir)
      .foreach(n => doRebucket(spark, storeDir, n))
    val cur = bucketsOf(spark, storeDir).getOrElse(
      throw new IllegalArgumentException(
        s"$storeDir is not a bucketed store (no _buckets_ marker) — " +
          "the first processBatch creates one"))
    if (cur == buckets) return
    val hp = new Path(storeDir)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.create(new Path(hp, s"_rebucket_$buckets"), false).close()
    catch { case _: java.io.IOException => () } // concurrent stamp
    doRebucket(spark, storeDir, buckets)
  }

  /** Idempotent re-bucket body: rewrite both trees to `nb` buckets,
    * then stamp the new count marker, drop the old one, drop the
    * intent — in that order, so every crash point either re-runs the
    * rewrite (harmless: re-bucketing an already-`nb` tree reproduces
    * it) or finishes the marker swap; the intent marker outlives both
    * `_buckets_` markers' window of coexistence, and every reader
    * resolves the intent before trusting a marker. */
  private def doRebucket(spark: SparkSession, store: String,
      nb: Int): Unit = {
    val hp = new Path(store)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    def rewrite(path: String, key: String): Unit =
      if (exists(spark, path))
        swapTree(spark, path) { tmp =>
          spark.read.parquet(path)
            .drop("b")
            .withColumn("b", bucketCol(col(key), nb))
            .repartition(col("b"))
            .write.partitionBy("b").parquet(tmp)
        }
    rewrite(docsPath(store), "doc_id")
    rewrite(bandsPath(store), "bk")
    try fs.create(new Path(hp, s"_buckets_$nb"), false).close()
    catch { case _: java.io.IOException => () } // re-run after a crash
    fs.listStatus(hp).foreach { f =>
      f.getPath.getName match {
        case BucketsRe(m) if f.isFile && m.toInt != nb =>
          fs.delete(f.getPath, false)
        case _ => ()
      }
    }
    // clear EVERY intent, not just this one's: a surviving loser
    // marker would deterministically re-bucket the store AGAIN on the
    // next touch — correct content, but a second O(store) rewrite to
    // a count nobody asked for anymore
    fs.listStatus(hp).foreach { f =>
      f.getPath.getName match {
        case RebucketRe(_) if f.isFile => fs.delete(f.getPath, false)
        case _                         => ()
      }
    }
  }

  /** Rewrite a whole store tree through the crash-safe two-rename
    * swap: `stage` writes the COMPLETE replacement at the tmp
    * location, the live tree moves aside in one rename, the staged
    * tree moves in with another, the retired copy deletes last.
    * [[recoverBackfill]] finishes or unwinds every crash point
    * (retired present ⇒ the staged copy had finished writing, so
    * forward completion is always safe). */
  private def swapTree(spark: SparkSession, path: String)(
      stage: String => Unit): Unit = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path + ".bktmp")
    val retired = new Path(path + ".flat")
    fs.delete(tmp, true)
    stage(tmp.toString)
    require(fs.rename(hp, retired), s"store tree retire failed: $path")
    require(fs.rename(tmp, hp), s"store tree swap failed: $path")
    fs.delete(retired, true)
  }

  /** Small-file compaction — the bucketed store's housekeeping twin
    * of [[graft.sim.IncrementalAnnIndex.compact]]: every batch appends
    * one file per touched bucket, so a long-lived store fragments.
    * Each tree holding a bucket with more than `maxFiles` data files
    * is rewritten to its minimal layout through the SAME crash-safe
    * staged swap as the flat-store migration — content-identical, and
    * the rewrite is one columnar scan of that tree (run at rebuild
    * cadence, not per batch). Returns (docs rewritten, bands
    * rewritten). */
  def compactStore(spark: SparkSession, storeDir: String,
      maxFiles: Int = 4): (Boolean, Boolean) = {
    require(maxFiles >= 1, s"maxFiles must be >= 1: $maxFiles")
    ensureBuckets(spark, storeDir)
    val fs = new Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def fragmented(path: String): Boolean = {
      val hp = new Path(path)
      fs.exists(hp) && fs.listStatus(hp).exists(d =>
        d.isDirectory && d.getPath.getName.startsWith("b=") &&
          fs.listStatus(d.getPath).count(f =>
            f.isFile && !f.getPath.getName.startsWith("_")) > maxFiles)
    }
    def rewrite(path: String): Boolean =
      if (!fragmented(path)) false
      else {
        swapTree(spark, path) { tmp =>
          spark.read.parquet(path)
            .repartition(col("b"))
            .write.partitionBy("b").parquet(tmp)
        }
        true
      }
    (rewrite(docsPath(storeDir)), rewrite(bandsPath(storeDir)))
  }

  /** Finish or unwind a crashed staged tree swap ([[swapTree]] — the
    * flat-store migration and [[compactStore]] share it): a retired
    * tree with the live dir missing either completes forward (staged
    * replacement fully written) or restores the retired tree (staging
    * incomplete — the operation re-runs); leftover staging beside a
    * live tree is discarded. */
  private def recoverBackfill(spark: SparkSession, store: String): Unit = {
    val hp = new Path(store)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    Seq(docsPath(store), bandsPath(store)).foreach { path =>
      val live = new Path(path)
      val tmp = new Path(path + ".bktmp")
      val retired = new Path(path + ".flat")
      if (fs.exists(retired)) {
        if (fs.exists(live)) fs.delete(retired, true) // finished swap
        else if (fs.exists(tmp)) { // crashed between the two renames
          require(fs.rename(tmp, live),
            s"store bucket backfill recovery failed: $path")
          fs.delete(retired, true)
        } else {
          require(fs.rename(retired, live), // unwind: re-run later
            s"store bucket backfill restore failed: $path")
        }
      } else if (fs.exists(tmp)) {
        fs.delete(tmp, true) // crashed mid-write: staging discards
      }
    }
  }

  /** (doc_id, bk) band keys via the module's MinHash signatures. Fused
    * 64-bit keys (same scheme as Dedup.minhashLshPairs): the PERSISTED
    * band index stores 8-byte keys instead of "b_h1_h2…" strings, and
    * the per-batch probe join exchanges longs. Collisions only add
    * candidates; the exact rescore drops them. */
  private def bandKeys(docs: DataFrame): DataFrame =
    Dedup.minhashBandKeys(Dedup.minhashSignaturesFromSets(
      Dedup.docShingleSets(docs, "doc_id", "text")))

  /** Exact-Jaccard rescore of candidate (da, db) pairs given a combined
    * (doc_id, text) relation covering both sides. */
  private def rescore(cand: DataFrame, texts: DataFrame,
      threshold: Double): DataFrame = {
    val sets = Dedup.docShingleSets(texts, "doc_id", "text")
      .select(col("doc_id"), col("ss"), size(col("ss")).cast("long").as("n"))
    cand
      .join(sets.select(col("doc_id").as("da"), col("ss").as("ssa"),
        col("n").as("na")), "da")
      .join(sets.select(col("doc_id").as("db"), col("ss").as("ssb"),
        col("n").as("nb")), "db")
      .withColumn("i",
        size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      // round(4) BEFORE thresholding, exactly like minhashLshPairs — the
      // two Jaccard paths must classify boundary docs identically
      .filter(round(col("i").cast("double")
        / (col("na") + col("nb") - col("i")), 4) >= threshold)
      .select(cand.columns.map(col): _*) // pass through tag columns
  }

  /** The accepted corpus as (doc_id, text) — the store's read API
    * (consumers should not depend on the layout's bucket column).
    * Tombstoned docs ([[removeDocs]]) are NOT part of the corpus. */
  def readDocs(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(docsPath(storeDir)).select("doc_id", "text")
      .filter(col("text").isNotNull)

  final case class RemoveResult(tombstoned: Long, bandRowsRemoved: Long)

  /** TAKEDOWN — the removal a real training corpus needs (rights
    * requests, policy strikes) that a naive delete cannot provide: the
    * store's replay convergence RELIES on removed ids staying known
    * (a deleted row would vanish from the redelivery skip, and a
    * replayed feed file would silently RE-ADMIT the taken-down doc).
    * So removal is a TOMBSTONE: the doc's text nulls out and its band
    * rows leave the index, while the doc_id row stays — the skip set
    * keeps recognizing it, forever. Semantics after removal:
    *   - [[readDocs]] no longer returns the doc (the content is gone
    *     from the corpus and from disk);
    *   - new near-dups of the removed CONTENT are admitted (the
    *     content is no longer in the corpus to collide with — the
    *     policy-correct direction for a takedown);
    *   - a redelivery of the removed doc_id still SKIPS (never
    *     re-admitted, same or fresh checkpoint);
    *   - re-running the same removal is a no-op (idempotent).
    *
    * I/O is bucket-pruned like every store operation: the docs
    * rewrite touches only the doomed ids' buckets, the bands rewrite
    * only the buckets the doomed docs' band keys hash to (re-derived
    * from the stored text BEFORE it nulls). Writes go bands-FIRST
    * (the inverse of the admit path's rationale: a crash between the
    * two writes leaves the doc temporarily unguarded against its own
    * near-dups — the post-removal behavior anyway — and the re-run
    * converges from disk state, whereas docs-first would null the
    * text the bands cleanup needs to locate its buckets). Dynamic
    * partition overwrite cannot DROP a partition, so a bands bucket
    * whose rows ALL leave is deleted explicitly after the survivor
    * write; a crash before that delete leaves dangling band rows,
    * which are harmless by construction (every text-reading path
    * excludes tombstones, so such candidates die in the rescore) and
    * leave on the re-run. Returns (docs tombstoned, band rows
    * removed). */
  def removeDocs(spark: SparkSession, storeDir: String,
      doomed: DataFrame): RemoveResult = {
    requireCastableKeys(doomed, "removeDocs")
    if (!exists(spark, docsPath(storeDir))) return RemoveResult(0L, 0L)
    val nb = ensureBuckets(spark, storeDir)
    val ids = doomed.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    val docBuckets = bucketSet(ids, col("doc_id"), nb)
    // the doomed docs' LIVE texts (bucket-pruned; tombstones and
    // never-admitted ids contribute nothing)
    val doomedLive = treeFor(spark, docsPath(storeDir), docBuckets)
      .join(ids, Seq("doc_id"), "left_semi")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").localCheckpoint()
    val nLive = doomedLive.count()
    if (nLive == 0) return RemoveResult(0L, 0L)

    // bands first (see ordering note above): drop the doomed docs'
    // rows from the buckets their band keys hash to
    var bandRows = 0L
    if (exists(spark, bandsPath(storeDir))) {
      val doomedKeys = bandKeys(doomedLive)
      val bandBuckets = bucketSet(doomedKeys, col("bk"), nb)
      if (bandBuckets.nonEmpty) {
        val tree = treeFor(spark, bandsPath(storeDir), bandBuckets)
        bandRows = tree.join(ids, Seq("doc_id"), "left_semi").count()
        if (bandRows > 0) {
          val survivors = tree.join(ids, Seq("doc_id"), "left_anti")
            .localCheckpoint() // break lineage: we overwrite the source
          val survivorBuckets = survivors.select("b").distinct()
            .collect().map(_.getInt(0)).toSet
          if (survivorBuckets.nonEmpty)
            survivors.repartition(col("b"))
              .write.partitionBy("b")
              .option("partitionOverwriteMode", "dynamic")
              .mode(SaveMode.Overwrite).parquet(bandsPath(storeDir))
          // dynamic overwrite replaces only partitions PRESENT in the
          // output — a fully-emptied bucket must be dropped explicitly
          val bfs = new Path(bandsPath(storeDir))
            .getFileSystem(spark.sessionState.newHadoopConf())
          bandBuckets.filterNot(survivorBuckets).foreach { b =>
            bfs.delete(new Path(s"${bandsPath(storeDir)}/b=$b"), true)
          }
        }
      }
    }

    // docs second: null the text IN PLACE — every row survives as a
    // row (tombstone or live), so every touched bucket stays non-empty
    // and dynamic overwrite replaces exactly the touched partitions;
    // the doomed set joins as a relation (never an IN-literal — a
    // takedown list can be large)
    val rewritten = treeFor(spark, docsPath(storeDir), docBuckets)
      .join(ids.withColumn("__doomed", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__doomed"), lit(null).cast("string"))
          .otherwise(col("text")).as("text"),
        col("b"))
      .localCheckpoint() // break lineage: we overwrite the source
    rewritten.repartition(col("b"))
      .write.partitionBy("b")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(docsPath(storeDir))
    RemoveResult(nLive, bandRows)
  }

  /** The cross-corpus probe in its DEPLOYMENT form —
    * [[Dedup.minhashLshPairsBetween]]'s contract served from the
    * PERSISTED store instead of re-banding the published side: the
    * batch's band keys equi-join the store's band INDEX (the published
    * corpus is never re-shingled and never self-paired), and only the
    * MATCHED accepted docs re-shingle for the exact rescore. Returns
    * (pub_id, new_id, jaccard); read-only — [[processBatch]] is the
    * mutating twin that also appends accepted docs' bands. Store-side
    * bucket sizes stay bounded by admission itself (near-dups are
    * never admitted, so a clone farm cannot pile into one bucket the
    * way it can in the one-shot generator — which is why the one-shot
    * [[Dedup.minhashLshPairsBetween]] carries a maxBucket cap and this
    * probe does not need one). */
  def probeStorePairs(
      batch: DataFrame,
      storeDir: String,
      threshold: Double = Dedup.JaccardThreshold,
      storeBuckets: Int = DefaultStoreBuckets): DataFrame = {
    val spark = batch.sparkSession
    requireCastableKeys(batch, "probeStorePairs")
    val incoming = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    if (!exists(spark, bandsPath(storeDir)))
      return incoming.select(col("doc_id").as("pub_id"),
        col("doc_id").as("new_id"),
        lit(0.0).as("jaccard")).limit(0)
    // first touch of a legacy flat store migrates it (marker-gated,
    // crash-safe) — every read below then prunes on the bucket column
    val nb = ensureBuckets(spark, storeDir, storeBuckets)
    // batch-sized; feeds band keys AND the rescore — pin it so the
    // incoming docs shingle once
    val incSets = Dedup.docShingleSets(incoming, "doc_id", "text")
      .localCheckpoint()
    val newBands = Dedup.minhashBandKeys(
      Dedup.minhashSignaturesFromSets(incSets)).localCheckpoint()
    // the index probe reads ONLY the buckets the batch's band keys
    // hash to — |batch's buckets| / nb of the index, never all of it
    val index = treeFor(spark, bandsPath(storeDir),
      bucketSet(newBands, col("bk"), nb))
    val cand = newBands
      .join(index.withColumnRenamed("doc_id", "pub_id"), "bk")
      .select(col("pub_id"), col("doc_id").as("new_id"))
      .distinct()
    // only MATCHED accepted docs fetch through the candidate join and
    // re-shingle (row-local, candidate-bounded) — the corpus itself is
    // never re-banded and never free-scanned. The join carries the
    // BUCKET key alongside the id (b is a pure function of pub_id), so
    // the docs scan's partitions prune dynamically off the candidate
    // side (DPP) while the probe stays one lazy plan.
    val pubDocs = spark.read.parquet(docsPath(storeDir))
      .filter(col("text").isNotNull) // tombstones are not corpus
      .select(col("doc_id").as("pub_id"), col("text"), col("b"))
    cand
      .withColumn("b", bucketCol(col("pub_id"), nb))
      .join(pubDocs, Seq("pub_id", "b"))
      .withColumn("ssa", array_distinct(Dedup.shingles(col("text"))))
      .drop("text")
      .withColumn("na", size(col("ssa")).cast("long"))
      .join(incSets.select(col("doc_id").as("new_id"),
        col("ss").as("ssb"), size(col("ss")).cast("long").as("nb")),
        "new_id")
      .withColumn("i",
        size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      .withColumn("jaccard", round(col("i").cast("double")
        / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("pub_id"), col("new_id"), col("jaccard"))
  }

  /** Process one batch of (doc_id, text): rejects near-dups of accepted
    * docs and in-batch near-dups (lower id wins), appends survivors to
    * the store, and returns the decision counts. `storeBuckets` binds
    * only when this call CREATES the store (the `_buckets_<n>` marker
    * wins thereafter — [[rebucketStore]] is the way to change a live
    * store's count); `threshold` likewise binds at creation via the
    * `_threshold_<ppm>` marker ([[ensureThreshold]] — the marker wins
    * for default calls, an explicit disagreeing threshold refuses). */
  def processBatch(
      batch: DataFrame,
      storeDir: String,
      threshold: Double = Dedup.JaccardThreshold,
      storeBuckets: Int = DefaultStoreBuckets): BatchResult = {
    val spark = batch.sparkSession
    requireCastableKeys(batch, "processBatch")
    val nb = ensureBuckets(spark, storeDir, storeBuckets)
    // one store = one admission regime: the marker wins for default
    // calls, a disagreeing explicit threshold refuses loudly
    val adm = ensureThreshold(spark, storeDir, threshold)
    val incoming = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    // one existence probe per batch (each is a FileSystem RPC); the
    // bands store may lag docs by half a crashed batch, but writes go
    // bands-first so that lag direction never loses index entries
    val storeExists = exists(spark, docsPath(storeDir))

    val (fresh, nRedelivered) =
      if (!storeExists) (incoming, 0L)
      else {
        // redelivery skip probes only the batch's id buckets
        val known = treeFor(spark, docsPath(storeDir),
          bucketSet(incoming, col("doc_id"), nb)).select("doc_id")
        val f = incoming.join(known, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        (f, incoming.count() - f.count())
      }

    val newBands = bandKeys(fresh).localCheckpoint()

    // candidates vs the ACCEPTED corpus: equi-join on the band index
    val vsStore =
      (if (!storeExists)
        fresh.select(col("doc_id").as("da"), col("doc_id").as("db")).limit(0)
      else {
        // the index probe reads only the batch's band-key buckets
        val index = treeFor(spark, bandsPath(storeDir),
          bucketSet(newBands, col("bk"), nb))
        newBands.join(index.withColumnRenamed("doc_id", "da"), "bk")
          .select(col("da"), col("doc_id").as("db"))
          .distinct()
      }).localCheckpoint() // candidate-sized; feeds the rescore AND
                           // the matched-docs bucket set

    // in-batch candidates: band self-join, lower id survives
    val inBatch = newBands.as("a")
      .join(newBands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") > col("b.doc_id"))
      .select(col("b.doc_id").as("da"), col("a.doc_id").as("db"))
      .distinct()

    // only the MATCHED accepted docs get re-shingled for the rescore —
    // never the whole corpus
    val storeTexts =
      if (!storeExists)
        fresh.limit(0)
      else treeFor(spark, docsPath(storeDir),
          bucketSet(vsStore, col("da"), nb)) // matched buckets only
        .filter(col("text").isNotNull) // tombstones cannot match
        .select("doc_id", "text")
        .join(vsStore.select(col("da").as("doc_id")).distinct(), "doc_id")
    val texts = fresh.select("doc_id", "text").unionByName(storeTexts)

    // One rescore over both candidate sets, tagged by provenance: a
    // store match always rejects the incoming doc (`db`), but an
    // in-batch match only rejects `db` if `da` is itself ACCEPTED.
    val scored = rescore(
      vsStore.withColumn("src", lit("s"))
        .unionByName(inBatch.withColumn("src", lit("b"))),
      texts, adm).localCheckpoint()
    val storeRejected = scored.filter(col("src") === "s")
      .select(col("db").as("doc_id")).distinct()

    // In-batch resolution must match processing the batch's docs ONE AT
    // A TIME in id order (so acceptance does not depend on how a corpus
    // was batched — the r02 advisor's non-transitivity finding: with
    // B~A, C~B, C!~A, rejecting every `db` killed both B and C, while
    // split batches accepted C). Sequential greedy = lowest-id-first
    // maximal independent set over the similarity edges, computed in
    // parallel rounds: each round accepts all docs with no smaller-id
    // UNDECIDED neighbor, rejects their neighbors, and drops both from
    // the graph — exactly the sequential result, in O(longest dependency
    // chain) rounds, with no driver-side edge materialization.
    val batchAccepted = {
      var remaining = fresh.select("doc_id")
        .join(storeRejected, Seq("doc_id"), "left_anti").localCheckpoint()
      var edges = scored.filter(col("src") === "b").select("da", "db")
        .join(remaining.withColumnRenamed("doc_id", "da"), Seq("da"), "left_semi")
        .join(remaining.withColumnRenamed("doc_id", "db"), Seq("db"), "left_semi")
        .localCheckpoint()
      val acc = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var rounds = 0
      while (remaining.limit(1).count() > 0 && rounds < MaxGreedyRounds) {
        rounds += 1
        if (edges.limit(1).count() == 0) {
          acc += remaining
          remaining = remaining.limit(0)
        } else {
          // minima: no edge arrives from a smaller-id remaining doc
          val minima = remaining
            .join(edges.select(col("db").as("doc_id")), Seq("doc_id"), "left_anti")
            .localCheckpoint()
          val newRejected = edges
            .join(minima.withColumnRenamed("doc_id", "da"), Seq("da"), "left_semi")
            .select(col("db").as("doc_id")).distinct()
          acc += minima
          remaining = remaining
            .join(minima, Seq("doc_id"), "left_anti")
            .join(newRejected, Seq("doc_id"), "left_anti")
            .localCheckpoint()
          edges = edges
            .join(remaining.withColumnRenamed("doc_id", "da"), Seq("da"), "left_semi")
            .join(remaining.withColumnRenamed("doc_id", "db"), Seq("db"), "left_semi")
            .localCheckpoint()
        }
      }
      // a >MaxGreedyRounds dependency chain is adversarial; the docs
      // still undecided at the cap are rejected (conservative: never
      // admits a near-dup, may drop a would-be survivor)
      if (acc.isEmpty) fresh.select("doc_id").limit(0)
      else acc.reduce(_ unionByName _)
    }

    val accepted = fresh.join(batchAccepted, Seq("doc_id"), "left_semi")
      .localCheckpoint()

    val nAccepted = accepted.count()
    if (nAccepted > 0) {
      // bands FIRST, docs second: a crash between the writes leaves
      // extra band rows pointing at absent docs (harmless — candidates
      // go through the rescore join against docs/), while the opposite
      // order would leave accepted docs invisible to future dedup and
      // the doc_id redelivery skip would never backfill them.
      // Band rows come from the checkpointed newBands (a semi-join),
      // not a second full shingle+MinHash pass over the text.
      newBands.join(accepted.select("doc_id"), Seq("doc_id"), "left_semi")
        .withColumn("b", bucketCol(col("bk"), nb))
        .repartition(col("b"))
        .write.partitionBy("b").mode(SaveMode.Append)
        .parquet(bandsPath(storeDir))
      accepted.withColumn("b", bucketCol(col("doc_id"), nb))
        .repartition(col("b"))
        .write.partitionBy("b").mode(SaveMode.Append)
        .parquet(docsPath(storeDir))
    }
    BatchResult(nAccepted, fresh.count() - nAccepted, nRedelivered)
  }
}
