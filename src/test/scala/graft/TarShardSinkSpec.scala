package graft

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.sinks.TarShardSink
import graft.sinks.TarShardSink.Entry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ustar writer against the public POSIX.1-1988 layout: header
  * field placement, checksum arithmetic, block padding, the
  * blocking-factor-1 size closed form, round-trips over awkward payload
  * sizes, and the distributed write's determinism + manifest truth. */
class TarShardSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val awkward = Seq(
    Entry("a.txt", "hello".getBytes(UTF_8)),
    Entry("empty.bin", Array.emptyByteArray),
    Entry("block.bin", Array.tabulate(512)(i => (i % 251).toByte)),
    Entry("block1.bin", Array.tabulate(513)(i => (i * 7 % 256).toByte)),
    Entry("utf8.txt", "příliš žluťoučký".getBytes(UTF_8)))

  test("round-trip: names, order, and payload bytes survive exactly") {
    val back = TarShardSink.untar(TarShardSink.tarBytes(awkward))
    assert(back.map(_.name) == awkward.map(_.name))
    awkward.zip(back).foreach { case (in, out) =>
      assert(java.util.Arrays.equals(in.data, out.data), in.name)
    }
  }

  test("archive size matches the blocking-factor-1 closed form") {
    val bytes = TarShardSink.tarBytes(awkward)
    val expected = 1024 + awkward.map(e =>
      512 + 512 * ((e.data.length + 511) / 512)).sum
    assert(bytes.length == expected)
  }

  test("header fields sit at the spec offsets") {
    val bytes = TarShardSink.tarBytes(Seq(awkward.head))
    // magic "ustar\0" at 257, version "00" at 263
    assert(new String(bytes, 257, 5, US_ASCII) == "ustar")
    assert(bytes(262) == 0)
    assert(new String(bytes, 263, 2, US_ASCII) == "00")
    assert(bytes(156) == '0') // typeflag: regular file
    // size field: 11 octal digits + NUL
    assert(new String(bytes, 124, 11, US_ASCII) == "00000000005")
    // mtime 0 (determinism)
    assert(new String(bytes, 136, 11, US_ASCII) == "00000000000")
  }

  test("checksum recomputes: spaces in the field sum to the stored value") {
    val bytes = TarShardSink.tarBytes(Seq(awkward.head))
    val h = java.util.Arrays.copyOf(bytes, 512)
    val stored = java.lang.Long.parseLong(
      new String(h, 148, 6, US_ASCII), 8)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    assert(h.map(_ & 0xff).sum.toLong == stored)
  }

  test("serialization is deterministic") {
    assert(java.util.Arrays.equals(
      TarShardSink.tarBytes(awkward), TarShardSink.tarBytes(awkward)))
  }

  private def publishRows = Seq(
    (0L, "b.txt", "bbbb"), (0L, "a.txt", "aa"),
    (1L, "c.bin", "c" * 600), (3L, "d.txt", "d"))
    .toDF("shard", "name", "payload")
    .select(col("shard"), col("name"), col("payload").cast("binary").as("data"))

  test("write(): one tar per shard, entries sorted, manifest tells the disk truth") {
    val out = java.nio.file.Files.createTempDirectory("tar_spec").toString
    val manifest = TarShardSink.write(publishRows, out, 4)
      .orderBy("shard").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(manifest.keySet == Set(0L, 1L, 3L)) // shard 2 unpopulated
    assert(manifest(0L) == ((2L, 6L, 1024L + 2 * (512 + 512))))
    assert(manifest(1L) == ((1L, 600L, 1024L + 512 + 1024)))
    assert(manifest(3L) == ((1L, 1L, 1024L + 512 + 512)))
    val shard0 = TarShardSink.untar(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "shard-00000.tar")))
    assert(shard0.map(_.name) == Seq("a.txt", "b.txt")) // sorted by name
    assert(new String(shard0.head.data, UTF_8) == "aa")
  }

  test("a failed attempt leaves NO visible shard; the retry converges") {
    val out = java.nio.file.Files.createTempDirectory("tar_fail").toString
    val rows = publishRows.orderBy("shard", "name")
      .select(col("shard").cast("long"), col("name"), col("data"))
      .collect().toSeq
    // attempt 1 dies mid-partition (after the writer has opened and
    // partially filled archives in its temp dir)
    intercept[RuntimeException] {
      TarShardSink.writePartition(
        rows.iterator.map { r =>
          if (r.getString(1) == "d.txt") sys.error("executor lost")
          r
        }, out)
    }
    val visible = new java.io.File(out).listFiles().toSeq.map(_.getName)
    assert(!visible.exists(_.matches("shard-\\d+\\.tar")),
      s"failed attempt exposed a shard: $visible")
    // retry (a fresh attempt) commits; bytes equal the direct
    // serialization of each shard's sorted entries
    TarShardSink.writePartition(rows.iterator, out)
    for ((shard, entries) <- Seq(
        0L -> Seq(Entry("a.txt", "aa".getBytes(UTF_8)),
          Entry("b.txt", "bbbb".getBytes(UTF_8))),
        1L -> Seq(Entry("c.bin", ("c" * 600).getBytes(UTF_8))),
        3L -> Seq(Entry("d.txt", "d".getBytes(UTF_8))))) {
      val got = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, f"shard-$shard%05d.tar"))
      assert(java.util.Arrays.equals(got, TarShardSink.tarBytes(entries)),
        s"shard $shard")
    }
    // the loser of a speculative race drops out silently: re-running
    // the SAME partition against committed shards leaves them intact
    TarShardSink.writePartition(rows.iterator, out)
    assert(TarShardSink.untar(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "shard-00000.tar")))
      .map(_.name) == Seq("a.txt", "b.txt"))
    // no temp debris survives a committed attempt
    val left = new java.io.File(out).listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("_tmp-attempt-"))
    // the failed attempt's dir remains until write()'s driver sweep —
    // assert it is the ONLY debris class present
    assert(left.size <= 1)
  }

  test("read() round-trips the published directory, one task per shard") {
    val out = java.nio.file.Files.createTempDirectory("tar_read").toString
    TarShardSink.write(publishRows, out, 4).collect()
    val back = TarShardSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), UTF_8))).toSet
    assert(back == Set(
      (0L, "a.txt", "aa"), (0L, "b.txt", "bbbb"),
      (1L, "c.bin", "c" * 600), (3L, "d.txt", "d")))
  }

  test("write() twice produces byte-identical shards") {
    val o1 = java.nio.file.Files.createTempDirectory("tar_det1").toString
    val o2 = java.nio.file.Files.createTempDirectory("tar_det2").toString
    TarShardSink.write(publishRows, o1, 4).collect()
    TarShardSink.write(publishRows, o2, 4).collect()
    for (s <- Seq(0, 1, 3)) {
      val f = f"shard-$s%05d.tar"
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(o1, f)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(o2, f))),
        f)
    }
  }
}
