package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the operational lever every long-running
  * ingest needs: micro-batch sinks (IngestJob, KeyedUpsertSink) produce
  * one file per partition per batch, and a year of hourly batches turns
  * a table scan into an 8760-file metadata storm. Compacts a parquet
  * directory to ceil(bytes / targetBytes) files via a single coalesce
  * write (no shuffle), staged next to the table and atomically swapped.
  */
object Compaction {

  /** @return number of files after compaction */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(hPath)
    // a hive-partitioned layout (key=value subdirectories) must be
    // compacted per partition — a flat rewrite would silently drop the
    // partition columns from the directory structure
    val partitionDirs = entries.filter(e =>
      e.isDirectory && e.getPath.getName.contains("="))
    require(partitionDirs.isEmpty,
      s"$path is hive-partitioned (${partitionDirs.head.getPath.getName}, ...);" +
        " compact each partition directory instead")
    val dataFiles = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    // siblings derived from the NORMALIZED path — raw string concat on a
    // trailing-slash input would nest them INSIDE the table and the
    // final rename would be a rename-into-own-child (fails, after
    // doubling the data on disk)
    val staging = new Path(hPath.getParent, hPath.getName + "__compacting")
    spark.read.parquet(path)
      .coalesce(nOut) // narrow: no shuffle, just fewer output tasks
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    // swap via rename (same-FS, metadata-only; a table format's commit
    // protocol replaces this at multi-writer scale). Hadoop rename
    // reports failure by RETURNING FALSE, so each step is checked and a
    // failed second rename rolls the original back — the backup is only
    // deleted once the new data is in place. (Readers racing the swap
    // can hit the gap between the two renames; single-writer tables
    // only, like every non-committed rename protocol.)
    val backup = new Path(hPath.getParent, hPath.getName + "__precompact")
    if (!fs.rename(hPath, backup))
      throw new java.io.IOException(s"compaction: cannot move $hPath aside")
    if (!fs.rename(staging, hPath)) {
      val restored = fs.rename(backup, hPath)
      throw new java.io.IOException(
        s"compaction: staging swap failed; original " +
          (if (restored) "restored" else s"left at $backup"))
    }
    fs.delete(backup, true)

    fs.listStatus(hPath)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
