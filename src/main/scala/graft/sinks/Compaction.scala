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

  /** Plan the rewrite: guard against hive-partitioned layouts and size
    * the output file count from the on-disk bytes. */
  private def planRewrite(fs: org.apache.hadoop.fs.FileSystem,
      hPath: Path, targetFileBytes: Long): Int = {
    val entries = fs.listStatus(hPath)
    // a hive-partitioned layout (key=value subdirectories) must be
    // rewritten per partition — a flat rewrite would silently drop the
    // partition columns from the directory structure
    val partitionDirs = entries.filter(e =>
      e.isDirectory && e.getPath.getName.contains("="))
    require(partitionDirs.isEmpty,
      s"$hPath is hive-partitioned (${partitionDirs.head.getPath.getName}, ...);" +
        " rewrite each partition directory instead")
    val totalBytes = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
  }

  /** Swap `staging` into `hPath` via checked renames (same-FS,
    * metadata-only; a table format's commit protocol replaces this at
    * multi-writer scale). Hadoop rename reports failure by RETURNING
    * FALSE, so each step is checked and a failed second rename rolls
    * the original back — the backup is only deleted once the new data
    * is in place. (Readers racing the swap can hit the gap between the
    * two renames; single-writer tables only, like every non-committed
    * rename protocol.) */
  private def atomicSwap(fs: org.apache.hadoop.fs.FileSystem,
      hPath: Path, staging: Path): Unit = {
    val backup = new Path(hPath.getParent, hPath.getName + "__prerewrite")
    if (!fs.rename(hPath, backup))
      throw new java.io.IOException(s"rewrite: cannot move $hPath aside")
    if (!fs.rename(staging, hPath)) {
      val restored = fs.rename(backup, hPath)
      throw new java.io.IOException(
        s"rewrite: staging swap failed; original " +
          (if (restored) "restored" else s"left at $backup"))
    }
    fs.delete(backup, true)
  }

  private def countFiles(fs: org.apache.hadoop.fs.FileSystem,
      hPath: Path): Int =
    fs.listStatus(hPath)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** @return number of files after compaction */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val nOut = planRewrite(fs, hPath, targetFileBytes)

    // siblings derived from the NORMALIZED path — raw string concat on a
    // trailing-slash input would nest them INSIDE the table and the
    // final rename would be a rename-into-own-child (fails, after
    // doubling the data on disk)
    val staging = new Path(hPath.getParent, hPath.getName + "__compacting")
    spark.read.parquet(path)
      .coalesce(nOut) // narrow: no shuffle, just fewer output tasks
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    atomicSwap(fs, hPath, staging)
    countFiles(fs, hPath)
  }

  /** OPTIMIZE ... ZORDER BY in one maintenance op: compact a
    * fragmented table to size-targeted files AND re-cluster rows along
    * the Morton curve of `cols` in the SAME atomic swap — the
    * Delta/Iceberg maintenance composition (one rewrite, one commit),
    * instead of a compact pass followed by a separate z-order pass
    * that rewrites the data twice and leaves a non-clustered window
    * between them.
    *
    * Unlike [[compact]]'s narrow coalesce, the z-ordered rewrite is a
    * range shuffle on the curve key (that's what makes BOTH
    * dimensions' file min/max tight) — the cost is one pass over the
    * table either way; clustering rides the pass for free.
    *
    * @return number of files after the rewrite */
  def optimizeZOrder(
      spark: SparkSession,
      path: String,
      cols: Seq[String],
      bits: Int = 16,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val nOut = planRewrite(fs, hPath, targetFileBytes)

    val staging = new Path(hPath.getParent, hPath.getName + "__optimizing")
    ZOrder.writeZOrderedN(
      spark.read.parquet(path), staging.toString, cols, bits, nOut)

    atomicSwap(fs, hPath, staging)
    countFiles(fs, hPath)
  }
}
