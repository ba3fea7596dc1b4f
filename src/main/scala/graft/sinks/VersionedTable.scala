package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table — snapshot commits, time travel, batch
  * MERGE and VACUUM on plain parquet, the minimal single-writer slice
  * of what public table formats (Delta's transaction log, Iceberg's
  * snapshot metadata) provide. A corpus pipeline needs exactly this
  * surface: every curation run commits a new corpus SNAPSHOT, training
  * jobs pin a version (reproducibility), `crawl_diff`-style audits
  * compare two versions, and retention trims the tail.
  *
  * Layout and commit protocol:
  * {{{
  *   <root>/v=3/...parquet        data of version 3
  *   <root>/_commit_v3            commit marker (empty file)
  * }}}
  * A commit writes the data directory COMPLETELY, then creates the
  * marker with `create(overwrite = false)` — an atomic
  * create-if-absent on Hadoop filesystems. Readers resolve `latest` =
  * max committed marker; a crash between data write and marker leaves
  * an ORPHAN directory that no reader ever sees and [[vacuum]]
  * removes. Marker creation failing (already exists) means another
  * writer won that version — the caller retries at the next number;
  * nothing is ever overwritten in place. (Multi-writer conditional
  * commits against S3-style stores need a real table format's
  * catalog; same boundary as [[Compaction]]'s rename protocol.)
  *
  * Scale shape: version resolution is one `listStatus` of marker
  * files (O(versions), metadata only — no data I/O); [[merge]]
  * shuffles on the key columns only and writes one new snapshot;
  * [[diffVersions]] compares row FINGERPRINTS (xxhash64), never full
  * rows, so the exchange is (key, hash)-narrow at any row width.
  */
object VersionedTable {

  /** Broadcast gate for [[changes]]' fetch joins: a diff row is a key
    * tuple + status string (~tens of bytes), so 2M keys is well inside
    * a default 8 GB driver / 8 GB broadcast limit while still covering
    * any realistic adjacent-version change set. */
  val ChangesBroadcastMaxKeys: Long = 2L * 1000 * 1000

  private val MarkerRe = "_commit_v(\\d+)".r

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def dataPath(rootP: Path, v: Long) = new Path(rootP, s"v=$v")
  private def markerPath(rootP: Path, v: Long) =
    new Path(rootP, s"_commit_v$v")

  /** All committed versions, ascending (metadata-only listing). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootP) = fsOf(spark, root)
    if (!fs.exists(rootP)) Seq.empty
    else fs.listStatus(rootP).toSeq
      .collect { case f if f.isFile =>
        f.getPath.getName match {
          case MarkerRe(n) => Some(n.toLong)
          case _ => None
        }
      }.flatten.sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Commit `df` as the next version; returns the committed version
    * number. The marker create is atomic create-if-absent: losing a
    * race surfaces as an IOException, never a clobbered snapshot. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val (fs, rootP) = fsOf(spark, root)
    val v = latestVersion(spark, root).map(_ + 1).getOrElse(0L)
    df.write.mode(SaveMode.ErrorIfExists)
      .parquet(dataPath(rootP, v).toString)
    val out = fs.create(markerPath(rootP, v), false) // atomic if-absent
    out.close()
    v
  }

  /** Time travel: read one committed version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val (fs, rootP) = fsOf(spark, root)
    require(fs.exists(markerPath(rootP, v)),
      s"version $v of $root is not committed (or was vacuumed)")
    spark.read.parquet(dataPath(rootP, v).toString)
  }

  /** The immutable data directory of one COMMITTED version — commit
    * writes it ErrorIfExists and marks it atomically, so the path can
    * be handed out as a stable snapshot (e.g. registered as a
    * materialized-summary source) without copying. */
  def versionDataPath(spark: SparkSession, root: String, v: Long): String = {
    val (fs, rootP) = fsOf(spark, root)
    require(fs.exists(markerPath(rootP, v)),
      s"version $v of $root is not committed (or was vacuumed)")
    dataPath(rootP, v).toString
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    readVersion(spark, root, v)
  }

  /** Non-destructive OPTIMIZE ZORDER: rewrite the LATEST snapshot
    * compacted and Morton-clustered on `cols` as a NEW version — the
    * table-format shape of OPTIMIZE (vs [[Compaction.optimizeZOrder]]'s
    * in-place rename swap): readers of the old version are never
    * disturbed, time travel keeps both layouts, and rollback is free
    * (the pre-optimize version is still committed). File count is
    * sized from the source snapshot's on-disk bytes. Returns the new
    * version number. */
  def optimize(
      spark: SparkSession,
      root: String,
      cols: Seq[String],
      bits: Int = 16,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val v = latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val (fs, rootP) = fsOf(spark, root)
    val bytes = fs.listStatus(dataPath(rootP, v))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nOut = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val nv = v + 1
    ZOrder.writeZOrderedN(readVersion(spark, root, v),
      dataPath(rootP, nv).toString, cols, bits, nOut)
    val out = fs.create(markerPath(rootP, nv), false) // atomic if-absent
    out.close()
    nv
  }

  /** Batch MERGE (upsert): rows of `updates` replace same-key rows of
    * the latest snapshot, new keys append, untouched keys carry over —
    * committed as one new version. Duplicate keys WITHIN `updates`
    * reduce to a deterministic winner (max_by over the row's content
    * hash — the [[KeyedUpsertSink]] replay discipline), so re-merging
    * the same batch commits an identical snapshot. Returns the new
    * version. */
  def merge(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val valueCols = updates.columns.filterNot(keyCols.contains)
    val oneRowPerKey =
      if (valueCols.isEmpty) updates.dropDuplicates(keyCols)
      else updates
        .groupBy(keyCols.map(col): _*)
        .agg(max_by(struct(valueCols.map(col): _*),
          md5(to_json(struct(updates.columns.map(col): _*)))).as("__row"))
        .select(keyCols.map(col) ++
          valueCols.map(c => col(s"__row.$c").as(c)): _*)
    val merged = latestVersion(spark, root) match {
      case None => oneRowPerKey
      case Some(v) =>
        val base = readVersion(spark, root, v)
        // column order pinned to the update schema so the union is
        // positional-safe
        oneRowPerKey.unionByName(
          base.join(oneRowPerKey.select(keyCols.map(col): _*),
            keyCols, "left_anti"))
    }
    commit(merged, root)
  }

  /** (key..., status) rows describing `b` relative to `a`: 'added',
    * 'removed', or 'changed' (same key, different content hash);
    * unchanged keys are omitted. Fingerprints travel, rows don't. */
  def diffVersions(
      spark: SparkSession,
      root: String,
      a: Long,
      b: Long,
      keyCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame) = {
      val valueCols = df.columns.filterNot(keyCols.contains).sorted
      df.select(keyCols.map(col) :+
        xxhash64(valueCols.map(col): _*).as("__fp"): _*)
    }
    val fa = fp(readVersion(spark, root, a)).withColumnRenamed("__fp", "__fa")
    val fb = fp(readVersion(spark, root, b)).withColumnRenamed("__fp", "__fb")
    fa.join(fb, keyCols, "full_outer")
      .withColumn("status",
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") =!= col("__fb"), "changed"))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Row-level change feed between two committed snapshots — the CDC
    * read (`table_changes` in Delta/Iceberg terms) an incremental
    * consumer replays instead of re-reading whole snapshots: the
    * validity-change propagation job (ST3) at table scale.
    *
    * Output: key cols + value cols + `change_type` in
    * {insert, delete, update_preimage, update_postimage} +
    * `v_from`/`v_to`. Inserts and update_postimage carry `to`-side
    * rows, deletes and update_preimage carry `from`-side rows;
    * unchanged keys emit nothing. Updates emit BOTH images so a
    * consumer can maintain aggregates without another snapshot read.
    *
    * Scale shape — two-phase on purpose: phase 1 is [[diffVersions]]'
    * narrow (key, xxhash64) exchange over both snapshots (8-byte
    * fingerprints travel, rows don't); phase 2 fetches full rows ONLY
    * for affected keys, with the changed-key relation on the broadcast
    * side (the J2 "fact never shuffles" discipline — between adjacent
    * corpus versions the change set is small by construction). A
    * single-pass full-outer join of raw snapshots would shuffle every
    * row at full width; this shape shuffles nothing wide at all when
    * the change relation broadcasts. */
  def changes(
      spark: SparkSession,
      root: String,
      from: Long,
      to: Long,
      keyCols: Seq[String]): DataFrame = {
    val diff = diffVersions(spark, root, from, to, keyCols)
      .localCheckpoint() // change-set sized; feeds two fetch joins
    // Broadcast only while the diff is genuinely small: a wide-range
    // changes() call (first commit → latest, or a fully churned table)
    // makes the change relation snapshot-sized, where a forced
    // broadcast would blow the driver/broadcast limit. One count over
    // the checkpointed blocks decides; above the cap the fetch joins
    // fall back to plain shuffled joins (still key+status columns only
    // on the diff side — rows stay narrow).
    val smallDiff = diff.count() <= ChangesBroadcastMaxKeys
    def fetch(v: Long, statuses: Seq[String], types: Map[String, String]) = {
      val side = readVersion(spark, root, v)
      val wanted0 = diff.filter(col("status").isin(statuses: _*))
      val wanted = if (smallDiff) broadcast(wanted0) else wanted0
      side.join(wanted, keyCols)
        .withColumn("change_type",
          when(col("status") === statuses.head, types(statuses.head))
            .otherwise(types(statuses.last)))
        .drop("status")
    }
    fetch(from, Seq("removed", "changed"),
        Map("removed" -> "delete", "changed" -> "update_preimage"))
      .unionByName(fetch(to, Seq("added", "changed"),
        Map("added" -> "insert", "changed" -> "update_postimage")))
      .withColumn("v_from", lit(from))
      .withColumn("v_to", lit(to))
  }

  /** Retention: keep the newest `keep` committed versions, delete the
    * rest AND any uncommitted orphan data directories (crash debris).
    * Returns the removed committed versions. Deletion order is
    * reader-safe for retained versions: a version's marker goes FIRST,
    * so a concurrent resolver never sees a committed marker whose data
    * is mid-delete. */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val (fs, rootP) = fsOf(spark, root)
    val vs = versions(spark, root)
    val drop = vs.dropRight(keep)
    drop.foreach { v =>
      fs.delete(markerPath(rootP, v), false)
      fs.delete(dataPath(rootP, v), true)
    }
    // orphans: v=N data dirs with no marker (interrupted commits —
    // and any dropped version whose data delete failed above)
    val committed = vs.toSet -- drop
    val DataRe = "v=(\\d+)".r
    if (fs.exists(rootP)) fs.listStatus(rootP).foreach { f =>
      f.getPath.getName match {
        case DataRe(n) if f.isDirectory && !committed.contains(n.toLong) =>
          fs.delete(f.getPath, true)
        case _ => ()
      }
    }
    drop
  }
}
