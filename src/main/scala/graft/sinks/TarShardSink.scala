package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded tar publisher — the multimodal/packed-corpus export format
  * (the WebDataset convention: training samples as adjacent entries in
  * plain POSIX tar shards, streamed sequentially by data loaders;
  * public spec: the POSIX.1-1988 ustar layout).
  *
  * Layout decisions, all in service of DETERMINISM (re-publishing the
  * same corpus must be byte-identical, so shard content is cacheable
  * and diffs mean data changes):
  *  - entries sort by name within a shard; one tar per shard;
  *  - fixed header metadata (mode 0644, uid/gid 0, mtime 0, no
  *    user/group names) — nothing host- or clock-dependent;
  *  - blocking factor 1: exactly the two terminating zero blocks, no
  *    record padding — so a shard's byte size is the closed-form
  *    `1024 + Σ (512 + 512·ceil(len/512))`, which the publish manifest
  *    gate recomputes engine-independently from the input table.
  *
  * Scale shape: one hash exchange on the shard key, a within-partition
  * sort, and a single sequential pass per shard writing straight to the
  * filesystem — shards never materialize in memory (streaming writes),
  * and `numShards` is the parallelism/file-size knob (O(thousands) in a
  * real publish).
  */
object TarShardSink {

  final case class Entry(name: String, data: Array[Byte])

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL terminator (ustar numeric)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-byte field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  /** One 512-byte ustar header. Spec fields per POSIX.1-1988. */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(US_ASCII)
    require(nameB.length <= 100, s"entry name too long: $name")
    val h = new Array[Byte](Block)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, nameB)                      // name[100]
    put(100, octal(0x1a4, 8))          // mode 0644
    put(108, octal(0, 8))              // uid
    put(116, octal(0, 8))              // gid
    put(124, octal(size, 12))          // size
    put(136, octal(0, 12))             // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                       // typeflag: regular file
    put(257, "ustar\u000000".getBytes(US_ASCII)) // magic[6] "ustar\0" + version "00"
    // uname/gname/devmajor/devminor/prefix stay NUL (deterministic)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    put(148, (f"$sum%06o" + "\u0000 ").getBytes(US_ASCII)) // 6 digits, NUL, space
    h
  }

  /** Serialize entries into one archive (caller supplies final order). */
  def tarBytes(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { e => writeEntry(out, e) }
    out.write(new Array[Byte](2 * Block)) // two terminating zero blocks
    out.toByteArray
  }

  private def writeEntry(out: java.io.OutputStream, e: Entry): Unit = {
    out.write(header(e.name, e.data.length.toLong))
    out.write(e.data)
    val pad = (Block - (e.data.length % Block)) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Minimal ustar reader — the spec's round-trip witness (also reads
    * archives from any conforming tar producer). */
  def untar(bytes: Array[Byte]): Seq[Entry] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var off = 0
    while (off + Block <= bytes.length && bytes(off) != 0) {
      val name = new String(bytes, off, 100, US_ASCII).takeWhile(_ != 0)
      val sizeStr = new String(bytes, off + 124, 12, US_ASCII)
        .takeWhile(c => c != 0 && c != ' ')
      val size = java.lang.Long.parseLong(sizeStr, 8).toInt
      val data = java.util.Arrays.copyOfRange(
        bytes, off + Block, off + Block + size)
      buf += Entry(name, data)
      off += Block + ((size + Block - 1) / Block) * Block
    }
    buf.toSeq
  }

  /** Read a published shard directory back as (shard, name, data) rows
    * — the consumption side of the WebDataset convention (a training
    * loader maps over shards, streaming entries in archive order). One
    * task per archive via the binaryFile source: shards are the
    * parallelism unit on the way IN exactly as they were on the way
    * OUT, and `untar` walks each archive sequentially with no
    * random access — the access pattern tar exists for.
    *
    * Ceiling: the binaryFile source materializes one archive per row,
    * so a shard must fit the 2 GB byte-array bound (and executor
    * memory). Size `shards` so archives land well under it — the
    * WebDataset convention's ~1 GB shards exist for exactly this. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.tar").load(dir)
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.tar$", 1)
          .cast("long").as("shard"),
        col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (s, bytes) =>
        untar(bytes).map(e => (s, e.name, e.data))
      }
      .toDF("shard", "name", "data")
  }

  /** Executor-side body of [[write]]: streams every shard of one
    * partition into an ATTEMPT-UNIQUE temp dir, then atomically renames
    * each finished archive into place — the FileOutputCommitter
    * discipline, so a retried or speculatively re-executed task can
    * never expose a mid-write shard to a concurrent listing (rename is
    * atomic on HDFS/POSIX; content is deterministic, so whichever
    * attempt wins the rename the bytes are identical). A FAILED
    * attempt leaves only its temp dir, never a visible partial shard;
    * [[write]] sweeps orphaned temp dirs after the job commits. */
  private[graft] def writePartition(it: Iterator[Row], outDir: String): Unit = {
    // executor-side FS handle (picks up the cluster's core-site)
    val fs = new Path(outDir).getFileSystem(new Configuration())
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"${tc.stageId()}-${tc.partitionId()}-${tc.taskAttemptId()}")
      .getOrElse(s"local-${java.util.UUID.randomUUID()}")
    val tmpDir = new Path(outDir, s"_tmp-attempt-$attempt")
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = -1L
    var curName: String = null
    var out: java.io.OutputStream = null
    def close(): Unit = if (out != null) {
      out.write(new Array[Byte](2 * Block)); out.close(); out = null
      done += curName
    }
    it.foreach { r =>
      val shard = r.getLong(0)
      if (shard != cur) {
        close(); cur = shard
        curName = f"shard-$shard%05d.tar"
        out = fs.create(new Path(tmpDir, curName), true)
      }
      writeEntry(out, Entry(r.getString(1), r.getAs[Array[Byte]](2)))
    }
    close()
    // commit: every archive of this partition is complete — rename
    // into place. A false return means another attempt won the race;
    // its bytes are identical by determinism, so ours just drop.
    done.foreach { name =>
      if (!fs.rename(new Path(tmpDir, name), new Path(outDir, name)))
        require(fs.exists(new Path(outDir, name)),
          s"rename of $name failed with no committed shard in place")
    }
    fs.delete(tmpDir, true)
  }

  /** Publish `rows` (`shard: BIGINT, name: STRING, data: BINARY`) as
    * `outDir/shard-NNNNN.tar`, one archive per shard, entries sorted by
    * name, each committed via the attempt-scoped temp-write + atomic
    * rename in [[writePartition]]. Returns the manifest a training job
    * consumes — per shard: entry count and payload bytes (from the
    * data), and `tar_bytes` measured from the COMMITTED files actually
    * on disk after the job (so a manifest gate checks the writer, not
    * the writer's intentions; uncommitted attempt debris never
    * matches the shard pattern). */
  def write(rows: DataFrame, outDir: String, numShards: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .repartition(math.max(numShards, 1), col("shard"))
      .sortWithinPartitions(col("shard"), col("name"))
      .select(col("shard").cast("long"), col("name"), col("data"))
      .foreachPartition { it: Iterator[Row] => writePartition(it, outDir) }
    val fs = new Path(outDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // sweep temp dirs orphaned by failed (since-retried) attempts —
    // every surviving task has already renamed its archives into place
    fs.listStatus(new Path(outDir)).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_tmp-attempt-"))
      .foreach(st => fs.delete(st.getPath, true))
    val ShardRe = "shard-(\\d+)\\.tar".r
    val sizes = fs.listStatus(new Path(outDir)).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case ShardRe(n) => Some((n.toLong, st.getLen))
          case _          => None
        }
      }
      .toDF("shard", "tar_bytes") // O(numShards) rows — driver-sized
    rows
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_entries"),
        sum(length(col("data")).cast("long")).as("payload_bytes"))
      .join(sizes, Seq("shard"))
      .select(col("shard"), col("n_entries"), col("payload_bytes"),
        col("tar_bytes"))
  }
}
