package graft

import java.nio.file.Files

import graft.dedup.IncrementalDedup
import graft.streaming.{AnnMaintainJob, DedupMaintainJob}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Stream≡batch for the standing dedup drain: a checkpointed drain of
  * landed doc-batch files leaves the store equal to the direct
  * processBatch composition, replay converges through the store's own
  * redelivery skip (no version chain needed — the feed is insert-only),
  * and auto-compaction keeps a long drain's file counts bounded. */
class DedupMaintainJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the riverbank " +
      "while birds sing in the morning light across the quiet valley"
  private val other =
    "completely different content about distributed query engines and " +
      "columnar execution with vectorized readers and shuffle services"
  private val third =
    "yet another unrelated document discussing perceptual hashing of " +
      "images audio fingerprints and training corpus quality filters"

  private def docIds(store: String): Set[Long] =
    spark.read.parquet(s"$store/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("drains admit like the direct processBatch composition; replay converges") {
    val dir = Files.createTempDirectory("dedupjob").toString
    val feed = s"$dir/feed"
    val store = s"$dir/corpus"
    // batch 1: two novel docs; batch 2: a near-dup of an ACCEPTED doc
    // (cross-batch rejection), a redelivery, and a novel doc — landed
    // with explicit mtime separation (burst-landing discipline)
    val b1 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val b2 = Seq((10L, base.replace("valley", "meadow")), (2L, other),
      (11L, third)).toDF("doc_id", "text")
    AnnMaintainJob.landDelta(spark, b1, feed)
    AnnMaintainJob.landDelta(spark, b2, feed)

    val r = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r.batches == 2, s"$r")
    assert(r.accepted == 3 && r.rejectedNearDup == 1 &&
      r.skippedRedelivered == 1, s"$r")
    assert(docIds(store) == Set(1L, 2L, 11L))

    // idle re-drain: the checkpoint remembers both files
    val r2 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r2.batches == 0, s"$r2")

    // wholesale replay (fresh checkpoint): the store's own doc_id skip
    // absorbs every row — same store, nothing double-admitted
    val r3 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt2")
    assert(r3.batches == 2 && r3.accepted == 0, s"$r3")
    assert(r3.skippedRedelivered == 4, // docs 1,2 then 2,11 — all known
      s"$r3")
    assert(r3.rejectedNearDup == 1, // doc 10 re-rejects, never admitted
      s"$r3")
    assert(docIds(store) == Set(1L, 2L, 11L))

    // the drained store equals the direct processBatch composition
    val twin = s"$dir/twin"
    IncrementalDedup.processBatch(b1, twin)
    IncrementalDedup.processBatch(b2, twin)
    assert(docIds(store) == docIds(twin))
    val a = spark.read.parquet(s"$store/bands").select("bk", "doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = spark.read.parquet(s"$twin/bands").select("bk", "doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b, "band indexes must mirror the direct composition")
  }

  test("a drain scheduled before the first landing is a no-op, not a crash") {
    val dir = Files.createTempDirectory("dedupjob_empty").toString
    val feed = s"$dir/feed"
    val store = s"$dir/corpus"
    // missing feed directory: empty summary
    val r = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r == DedupMaintainJob.DedupMaintainSummary(0, 0L, 0L, 0L), s"$r")
    // existing but data-less feed directory: same
    new org.apache.hadoop.fs.Path(feed)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .mkdirs(new org.apache.hadoop.fs.Path(feed))
    val r2 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r2 == DedupMaintainJob.DedupMaintainSummary(0, 0L, 0L, 0L))
    // the first real landing drains normally through the same call
    AnnMaintainJob.landDelta(spark,
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), feed)
    val r3 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r3.batches == 1 && r3.accepted == 2, s"$r3")
    assert(docIds(store) == Set(1L, 2L))
  }

  test("re-bucketing between drains keeps every drain decision intact") {
    // the operational composition: drain a feed, re-bucket the live
    // store to a larger count (the corpus outgrew it), keep draining
    // the SAME feed world — redeliveries still skip, cross-batch
    // near-dups still reject, and a fresh-checkpoint replay of
    // everything converges through the re-bucketed layout
    val dir = Files.createTempDirectory("dedupjob_rb").toString
    val feed = s"$dir/feed"
    val store = s"$dir/corpus"
    AnnMaintainJob.landDelta(spark,
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), feed)
    val r1 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r1.accepted == 2, s"$r1")

    IncrementalDedup.rebucketStore(spark, store, 64)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$store/_meta_b64_t800000")),
      "the fused creation record moves to the re-bucketed count")

    AnnMaintainJob.landDelta(spark,
      Seq((10L, base.replace("valley", "meadow")), (2L, other),
        (11L, third)).toDF("doc_id", "text"), feed)
    val r2 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r2.batches == 1 && r2.accepted == 1 &&
      r2.rejectedNearDup == 1 && r2.skippedRedelivered == 1, s"$r2")
    assert(docIds(store) == Set(1L, 2L, 11L))

    // wholesale replay from a fresh checkpoint converges through the
    // 64-bucket layout — nothing double-admits, nothing re-surfaces
    val r3 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt2")
    assert(r3.batches == 2 && r3.accepted == 0 &&
      r3.skippedRedelivered == 4 && r3.rejectedNearDup == 1, s"$r3")
    assert(docIds(store) == Set(1L, 2L, 11L))
  }

  test("takedown between drains: replay never re-admits a removed doc") {
    val dir = Files.createTempDirectory("dedupjob_td").toString
    val feed = s"$dir/feed"
    val store = s"$dir/corpus"
    AnnMaintainJob.landDelta(spark,
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), feed)
    val r1 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r1.accepted == 2, s"$r1")
    // takedown doc 2 between drains
    val rr = IncrementalDedup.removeDocs(spark, store, Seq(2L).toDF("doc_id"))
    assert(rr.tombstoned == 1)
    // the drain continues: the removed CONTENT is re-admittable under
    // a fresh id, novel docs land as always
    AnnMaintainJob.landDelta(spark,
      Seq((11L, other), (3L, third)).toDF("doc_id", "text"), feed)
    val r2 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt")
    assert(r2.batches == 1 && r2.accepted == 2, s"$r2")
    def corpus(): Set[Long] = IncrementalDedup.readDocs(spark, store)
      .collect().map(_.getLong(0)).toSet // docIds would see the tombstone
    assert(corpus() == Set(1L, 3L, 11L))
    // wholesale replay from a FRESH checkpoint: doc 2 redelivers from
    // file 1 and hits the TOMBSTONE's skip — the takedown survives any
    // replay; nothing double-admits, the corpus is unchanged
    val r3 = DedupMaintainJob.runOnce(spark, feed, store, s"$dir/ckpt2")
    assert(r3.batches == 2 && r3.accepted == 0 &&
      r3.skippedRedelivered == 4, s"$r3")
    assert(corpus() == Set(1L, 3L, 11L))
  }

  test("auto-compaction keeps a long drain's file counts bounded") {
    val dir = Files.createTempDirectory("dedupjob_ac").toString
    val feed = s"$dir/feed"
    // four batches of distinct docs fragment every touched bucket
    (0 until 4).foreach { k =>
      val b = (k * 100 until (k + 1) * 100).map(i =>
        (i.toLong, s"$other unique token$i tag${i * 3} z${i % 11}"))
        .toDF("doc_id", "text")
      AnnMaintainJob.landDelta(spark, b, feed)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def maxFilesPerBucket(path: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("b="))
        .map(d => fs.listStatus(d.getPath).count(f =>
          f.isFile && !f.getPath.getName.startsWith("_"))).max
    // control: plain drain fragments
    val plain = s"$dir/plain"
    DedupMaintainJob.runOnce(spark, feed, plain, s"$dir/ckpt_p")
    assert(maxFilesPerBucket(s"$plain/docs") > 2,
      "fixture must fragment for the bound to mean anything")
    // compacting drain stays within the bound, content identical
    val ac = s"$dir/ac"
    val r = DedupMaintainJob.runOnce(spark, feed, ac, s"$dir/ckpt_a",
      autoCompactEvery = 2, autoCompactMaxFiles = 1)
    assert(r.batches == 4 && r.accepted == 400, s"$r")
    assert(maxFilesPerBucket(s"$ac/docs") <= 2, // one batch may land
      "auto-compaction must bound fragmentation") // after the last tick
    assert(docIds(ac) == docIds(plain))
  }
}
