package graft.sim

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental IVF index — the production shape of similarity search at
  * corpus-build time: embedding batches arrive continuously and must
  * become searchable WITHOUT re-indexing the corpus (the same
  * incremental discipline as [[graft.dedup.IncrementalDedup]]).
  *
  * Store layout:
  *   - `centroids`: (cent_id, cv) — the coarse quantizer, FIXED at init
  *     (classic IVF: lists grow, the quantizer doesn't; re-training is a
  *     rebuild, not an append).
  *   - `lists/cid=<n>/` — inverted lists as HIVE PARTITIONS of
  *     (vec_id, v): a probe restricted to k centroid ids statically
  *     prunes every other partition AT THE SCAN, so query I/O is
  *     |probed lists|, not |index|.
  *   - `ledger/b=<k>/` — the id LEDGER: (vec_id, cid) rows hash-
  *     bucketed on vec_id. Every maintenance-side id lookup (the
  *     redelivery skip, the affected-list discovery under deletes)
  *     probes ONLY the buckets the delta's ids hash to, so discovery
  *     I/O is |delta's buckets| × (|index| / buckets) — never a full
  *     index scan. The vectors themselves never enter the ledger; at
  *     10B vectors the whole ledger is two longs per row, and a
  *     one-bucket delta reads 1/`ledgerBuckets` of that.
  *
  * Append assigns each new vector to its nearest centroid (broadcast
  * quantizer, argmax with the same round-then-tiebreak discipline as
  * [[Similarity.ivfTopK]], so an incremental build equals a one-shot
  * build vector-for-vector) and appends ONLY the touched partitions.
  * Re-delivered vec_ids are skipped (bucket-pruned anti-join against
  * the ledger), so replaying a batch is a no-op.
  *
  * Lists and ledger commit TOGETHER: an append stages both layouts
  * under `_append_staged/`, marks the staging complete (`_ok`), then
  * publishes by per-file rename with existing targets skipped — a
  * crash at any point either discards an unmarked staging wholesale or
  * finishes a marked one idempotently on the next call ([[recover]]),
  * so the ledger can never lie about list membership. Deletes rewrite
  * the touched list partitions AND the touched ledger buckets through
  * one shared trash-swap transaction ([[removeIds]]).
  */
object IncrementalAnnIndex {

  final case class AppendResult(appended: Long, skippedRedelivered: Long)
  final case class ChangesResult(removed: Long, appended: Long,
      skippedRedelivered: Long)

  /** Default ledger bucket count — recorded in the store at creation
    * (`ledger/_buckets_<n>`), immutable thereafter (the bucket of an id
    * must be stable for the life of the store; re-bucketing is a
    * rebuild). Size it so |index| / buckets rows of (vec_id, cid) fit
    * one comfortable scan task: 64 covers the gate scales; a 10B-vector
    * deployment would init with O(1000). */
  val DefaultLedgerBuckets = 64

  private def centroidsPath(store: String) = s"$store/centroids"
  private def listsPath(store: String) = s"$store/lists"
  private def ledgerPath(store: String) = s"$store/ledger"
  private def rewriteTmpPath(store: String) = s"$store/_rewrite_tmp"
  private def rewriteTrashPath(store: String) = s"$store/_rewrite_trash"
  private def appendStagedPath(store: String) = s"$store/_append_staged"

  private val BucketsRe = "_buckets_(\\d+)".r

  private def fsOf(spark: SparkSession, p: String): (FileSystem, Path) = {
    val hp = new Path(p)
    (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
  }

  /** The dir holds at least one `<prefix>=` partition (an `exists` on
    * the root is not enough: an emptied store keeps the bare dir). */
  private def hasData(spark: SparkSession, p: String,
      prefix: String): Boolean = {
    val (fs, hp) = fsOf(spark, p)
    fs.exists(hp) && fs.listStatus(hp).exists(d =>
      d.isDirectory && d.getPath.getName.startsWith(prefix + "="))
  }

  /** Stable id→bucket map: Murmur3 of the id mod the bucket count.
    * Engine-internal (the ledger is never oracle-compared), so Spark's
    * native codegen'd hash is the right tool. */
  private def bucketOf(id: Column, nb: Int): Column =
    pmod(hash(id), lit(nb))

  /** Bucket count the ledger was created with, from its marker file. */
  private def ledgerBucketsOf(
      spark: SparkSession, store: String): Option[Int] = {
    val (fs, lp) = fsOf(spark, ledgerPath(store))
    if (!fs.exists(lp)) None
    else fs.listStatus(lp).toSeq.flatMap { f =>
      f.getPath.getName match {
        case BucketsRe(n) if f.isFile => Some(n.toInt)
        case _                        => None
      }
    }.headOption
  }

  /** The ledger restricted to `buckets` — every maintenance-side id
    * lookup goes through this, so the scan statically prunes to the
    * delta's hash buckets (package-visible so the spec can assert the
    * pruning on the physical plan). */
  private[graft] def ledgerFor(spark: SparkSession, store: String,
      buckets: Seq[Int]): DataFrame =
    spark.read.parquet(ledgerPath(store))
      .filter(col("b").isin(buckets: _*)) // static partition pruning
      .select(col("vec_id"), col("cid"), col("b"))

  /** Create the ledger if missing and return its bucket count. A
    * pre-ledger store (lists without a ledger) backfills from the
    * lists' own (vec_id, cid) columns — ONE full columnar scan, once,
    * at migration; the commit point is a single atomic directory
    * rename, so a crashed backfill simply reruns. */
  private def ensureLedger(spark: SparkSession, store: String,
      requested: Int): Int =
    ledgerBucketsOf(spark, store).getOrElse {
      require(requested > 0, s"ledgerBuckets must be positive: $requested")
      val (fs, lp) = fsOf(spark, ledgerPath(store))
      val tmp = new Path(s"$store/_ledger_backfill_tmp")
      fs.delete(tmp, true)
      if (hasData(spark, listsPath(store), "cid")) {
        spark.read.parquet(listsPath(store))
          .select(col("vec_id"), col("cid").cast("long").as("cid"),
            bucketOf(col("vec_id"), requested).as("b"))
          .repartition(col("b"))
          .write.partitionBy("b").parquet(tmp.toString)
      } else {
        fs.mkdirs(tmp)
      }
      val mk = fs.create(new Path(tmp, s"_buckets_$requested"), false)
      mk.close()
      require(fs.rename(tmp, lp), // atomic commit of the whole backfill
        s"ledger backfill commit failed: $tmp -> $lp")
      requested
    }

  /** Nearest-centroid assignment, identical to ivfTopK's: similarity
    * rounded to 4 decimals BEFORE the argmax, ties to the lower
    * cent_id. Input (vec_id, v); output (vec_id, v, cid). */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("csim", round(Similarity.cosine(col("v"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id").as("cid"))
  }

  private def vecsOf(batch: DataFrame): DataFrame =
    batch.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))

  /** Initialize the store: the quantizer is the `nCentroids`
    * lowest-vec_id vectors of the init batch (deterministic, like
    * ivfTopK's first-k rule), then the whole batch is appended. */
  def init(batch: DataFrame, storeDir: String,
      nCentroids: Int = Similarity.IvfCentroids,
      ledgerBuckets: Int = DefaultLedgerBuckets): AppendResult = {
    val cents = vecsOf(batch)
      .orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    cents.write.mode("overwrite").parquet(centroidsPath(storeDir))
    appendBatch(batch, storeDir, ledgerBuckets)
  }

  /** Append one batch of (vec_id, embedding); re-delivered ids skipped
    * via a BUCKET-PRUNED ledger probe — the scan reads only the
    * buckets the batch's ids hash to, never the index. */
  def appendBatch(batch: DataFrame, storeDir: String,
      ledgerBuckets: Int = DefaultLedgerBuckets): AppendResult = {
    val spark = batch.sparkSession
    recover(spark, storeDir)
    val nb = ensureLedger(spark, storeDir, ledgerBuckets)
    val incoming = vecsOf(batch).dropDuplicates("vec_id").localCheckpoint()
    val fresh =
      if (!hasData(spark, listsPath(storeDir), "cid")) incoming
      else {
        val buckets = incoming
          .select(bucketOf(col("vec_id"), nb).as("b")).distinct()
          .collect().map(_.getInt(0)).toSeq // ≤ nb values: driver-sized
        val known = ledgerFor(spark, storeDir, buckets).select("vec_id")
        incoming.join(known, Seq("vec_id"), "left_anti").localCheckpoint()
      }
    val nFresh = fresh.count()
    if (nFresh > 0) {
      val cents = spark.read.parquet(centroidsPath(storeDir))
      val assigned = assign(fresh, cents)
        .withColumn("b", bucketOf(col("vec_id"), nb))
        .localCheckpoint() // one assignment feeds both staged layouts
      stageAndPublish(spark, storeDir, assigned)
    }
    AppendResult(nFresh, incoming.count() - nFresh)
  }

  /** Stage the assigned rows in BOTH layouts (lists by cid, ledger by
    * bucket) under one staging root, mark it complete, publish by
    * per-file rename. The `_ok` marker is the commit point: before it,
    * recovery discards the staging; after it, recovery finishes the
    * publish — renames whose target exists are skipped, so replaying
    * the publish is idempotent file by file and the two layouts can
    * never diverge durably. */
  private def stageAndPublish(spark: SparkSession, store: String,
      assigned: DataFrame): Unit = {
    val (fs, stagedP) = fsOf(spark, appendStagedPath(store))
    fs.delete(stagedP, true)
    assigned.select(col("vec_id"), col("v"), col("cid"))
      .repartition(col("cid"))
      .write.partitionBy("cid").parquet(s"$stagedP/lists")
    assigned.select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("b"))
      .repartition(col("b"))
      .write.partitionBy("b").parquet(s"$stagedP/ledger")
    val mk = fs.create(new Path(stagedP, "_ok"), false)
    mk.close()
    publishStaged(fs, stagedP, store)
    fs.delete(stagedP, true)
  }

  /** Move every staged partition file into the live trees; targets
    * that already exist were published by a previous (crashed) attempt
    * of the SAME staging and are skipped. */
  private def publishStaged(fs: FileSystem, stagedP: Path,
      store: String): Unit =
    Seq("lists" -> listsPath(store), "ledger" -> ledgerPath(store))
      .foreach { case (sub, liveRoot) =>
        val sp = new Path(stagedP, sub)
        if (fs.exists(sp)) {
          fs.listStatus(sp).filter(_.isDirectory).foreach { pd =>
            val liveDir = new Path(liveRoot, pd.getPath.getName)
            fs.mkdirs(liveDir)
            fs.listStatus(pd.getPath)
              .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
              .foreach { f =>
                val dst = new Path(liveDir, f.getPath.getName)
                if (!fs.exists(dst))
                  require(fs.rename(f.getPath, dst),
                    s"staged publish rename failed: ${f.getPath} -> $dst")
              }
          }
        }
      }

  /** Maintain the index off a [[graft.sinks.VersionedTable.changes]]-
    * shaped feed (vec_id, embedding, change_type, ...): the CDC
    * consumer form of index maintenance, composing with the versioned
    * corpus exactly as [[graft.sinks.IncrementalView.maintain]] does
    * for aggregates. `delete`/`update_preimage` rows REMOVE their
    * vec_ids; `insert`/`update_postimage` rows append through
    * [[appendBatch]] (probe-assigned to the FIXED quantizer). Removal
    * runs first, so an update's postimage re-enters cleanly instead of
    * being skipped as a redelivered id. An unknown change_type fails
    * loudly (the IncrementalView requireExact discipline: a consumer
    * that silently drops feed rows corrupts the index tracelessly).
    *
    * Cost is delta-localized END TO END: discovery probes only the
    * delta's ledger buckets, removal rewrites ONLY the inverted-list
    * partitions and ledger buckets holding doomed ids (the
    * Lucene-segment-rewrite shape — at 100 TB a delta touches a
    * handful of lists, never the index), and the append is |inserts|
    * work as always. Replay converges: a redelivered feed finds
    * deletes already gone and inserts already known (redelivery skip);
    * an update's preimage+postimage re-apply — removal then re-insert
    * of the same (id, vector) — landing on identical content. */
  def applyChanges(feed: DataFrame, storeDir: String): ChangesResult = {
    val types = feed.select("change_type").distinct()
      .collect().map(_.getString(0)).toSet
    val unknown = types --
      Set("insert", "delete", "update_preimage", "update_postimage")
    require(unknown.isEmpty,
      s"IncrementalAnnIndex: unknown change_type(s): ${unknown.mkString(", ")}")
    val doomed = feed
      .filter(col("change_type").isin("delete", "update_preimage"))
      .select("vec_id").distinct()
    val removed = removeIds(doomed, storeDir)
    val ar = appendBatch(
      feed.filter(col("change_type").isin("insert", "update_postimage"))
        .select(col("vec_id"), col("embedding")),
      storeDir)
    ChangesResult(removed, ar.appended, ar.skippedRedelivered)
  }

  /** Delete `ids` from the store by rewriting ONLY the list partitions
    * and ledger buckets that hold them. Discovery is bucket-pruned:
    * the doomed ids' (bucket, cid) pairs come from a ledger probe of
    * the delta's buckets — the index itself is read only for the
    * touched partitions' rewrite. Crash-safe single-writer protocol:
    * survivors land in a tmp dir while the originals are intact, then
    * each affected partition (both trees) swaps through a trash dir —
    * [[recoverRewrite]] at entry restores any half-swapped partition
    * from trash, so no crash window loses rows. Every rename's result
    * is require()d: a filesystem that REFUSES a rename (returns false
    * instead of throwing) aborts loudly before the store can be left
    * inconsistent without a trace. Returns the number of removed list
    * entries. */
  private def removeIds(ids: DataFrame, storeDir: String): Long = {
    val spark = ids.sparkSession
    recover(spark, storeDir)
    if (!hasData(spark, listsPath(storeDir), "cid")) return 0L
    val nb = ensureLedger(spark, storeDir, DefaultLedgerBuckets)
    val idsB = ids
      .select(col("vec_id"), bucketOf(col("vec_id"), nb).as("b"))
      .localCheckpoint()
    val doomedBuckets = idsB.select("b").distinct()
      .collect().map(_.getInt(0)).toSeq
    // delta-localized discovery: (bucket, list) pairs actually holding
    // doomed ids — a probe of the delta's ledger buckets only, and
    // driver-sized output (≤ |buckets| × |centroids| pairs)
    val hit = ledgerFor(spark, storeDir, doomedBuckets)
      .join(idsB.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("b"), col("cid").cast("long").as("cid")).distinct()
      .collect()
    if (hit.isEmpty) return 0L
    val affectedCids = hit.map(_.getLong(1)).distinct.sorted
    val affectedBuckets = hit.map(_.getInt(0)).distinct.sorted

    val idsC = idsB.select("vec_id")
    val (fs, _) = fsOf(spark, storeDir)
    val listsRoot = new Path(listsPath(storeDir))
    val ledgerRoot = new Path(ledgerPath(storeDir))
    val tmp = new Path(rewriteTmpPath(storeDir))
    val trash = new Path(rewriteTrashPath(storeDir))
    fs.delete(tmp, true)

    val touched = spark.read.parquet(listsPath(storeDir))
      .filter(col("cid").isin(affectedCids: _*))
    val nBefore = touched.count()
    // 1. survivors to tmp — the originals are still fully intact
    val survivors = touched.join(idsC, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("v"), col("cid"))
    survivors.write.partitionBy("cid").parquet(s"$tmp/lists")
    ledgerFor(spark, storeDir, affectedBuckets)
      .join(idsC, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid"), col("b"))
      .write.partitionBy("b").parquet(s"$tmp/ledger")
    val nAfter = survivors.count() // originals still intact here
    // 2. originals aside (preserved until the swap lands)...
    fs.mkdirs(new Path(trash, "lists"))
    fs.mkdirs(new Path(trash, "ledger"))
    affectedCids.foreach { c =>
      val src = new Path(listsRoot, s"cid=$c")
      val dst = new Path(trash, s"lists/cid=$c")
      require(fs.rename(src, dst), s"rewrite rename failed: $src -> $dst")
    }
    affectedBuckets.foreach { k =>
      val src = new Path(ledgerRoot, s"b=$k")
      val dst = new Path(trash, s"ledger/b=$k")
      require(fs.rename(src, dst), s"rewrite rename failed: $src -> $dst")
    }
    // 3. ...surviving partitions in (a fully-emptied partition simply
    // has no tmp dir and stays deleted)
    Seq("lists" -> listsRoot, "ledger" -> ledgerRoot).foreach {
      case (sub, liveRoot) =>
        val tp = new Path(tmp, sub)
        if (fs.exists(tp))
          fs.listStatus(tp).filter(_.isDirectory).foreach { d =>
            val dst = new Path(liveRoot, d.getPath.getName)
            require(fs.rename(d.getPath, dst),
              s"rewrite rename failed: ${d.getPath} -> $dst")
          }
    }
    fs.delete(trash, true)
    fs.delete(tmp, true)
    nBefore - nAfter
  }

  /** Finish whatever a crashed maintenance call left behind, in the
    * only order that can arise (operations are sequential, so at most
    * one is pending): a half-swapped rewrite restores, then a marked
    * staged append publishes. Both are idempotent. */
  private def recover(spark: SparkSession, storeDir: String): Unit = {
    recoverRewrite(spark, storeDir)
    recoverAppend(spark, storeDir)
  }

  /** Restore any partition a crashed [[removeIds]] left half-swapped:
    * a trash dir whose partition is MISSING from the live tree goes
    * back (the rerun re-deletes from it); one whose partition is
    * present was already swapped — drop the stale copy. */
  private def recoverRewrite(spark: SparkSession, storeDir: String): Unit = {
    val (fs, trash) = fsOf(spark, rewriteTrashPath(storeDir))
    if (fs.exists(trash)) {
      Seq("lists" -> new Path(listsPath(storeDir)),
          "ledger" -> new Path(ledgerPath(storeDir))).foreach {
        case (sub, liveRoot) =>
          val tp = new Path(trash, sub)
          if (fs.exists(tp)) {
            fs.mkdirs(liveRoot)
            fs.listStatus(tp).filter(_.isDirectory).foreach { d =>
              val live = new Path(liveRoot, d.getPath.getName)
              if (!fs.exists(live))
                require(fs.rename(d.getPath, live),
                  s"rewrite recovery rename failed: ${d.getPath} -> $live")
            }
          }
      }
      fs.delete(trash, true)
    }
    fs.delete(new Path(rewriteTmpPath(storeDir)), true)
  }

  /** Finish or discard a crashed [[stageAndPublish]]: a staging with
    * the `_ok` marker publishes (file renames skip existing targets);
    * one without is incomplete and nothing of it was ever live —
    * discard it wholesale. */
  private def recoverAppend(spark: SparkSession, storeDir: String): Unit = {
    val (fs, stagedP) = fsOf(spark, appendStagedPath(storeDir))
    if (fs.exists(stagedP)) {
      if (fs.exists(new Path(stagedP, "_ok")))
        publishStaged(fs, stagedP, storeDir)
      fs.delete(stagedP, true)
    }
  }

  /** Top-k over the store for external queries (qid, embedding):
    * `nProbe` nearest lists per query, exact rescore inside them. The
    * probed cid set (≤ |queries| x nProbe distinct values, bounded by
    * the centroid count) is collected to the driver and pushed as an
    * IN-filter, so unprobed list PARTITIONS are statically pruned at the
    * scan — query cost is the probed lists, never the index. Self-hits
    * (qid == vec_id) are excluded, matching ivfTopK. */
  def topK(queries: DataFrame, storeDir: String, k: Int,
      nProbe: Int = Similarity.IvfProbes): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(centroidsPath(storeDir))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probes = queries
      .select(col("qid"), col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(Similarity.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cent_id").as("cid"))
      .localCheckpoint()
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(listsPath(storeDir))
      .filter(col("cid").isin(probedCids: _*)) // static partition pruning
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(lists, Seq("cid"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("v")), 4))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("sim"))
  }
}
