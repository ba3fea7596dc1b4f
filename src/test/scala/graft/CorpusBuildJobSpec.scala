package graft

import java.nio.file.Files

import graft.streaming.CorpusBuildJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming corpus build: scrub -> quality/lang/token gates ->
  * incremental near-dup rejection, checkpointed so each run drains only
  * new files and replay is a no-op. */
class CorpusBuildJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** ~55 gate-passing tokens: English stopword markers + `stem` words. */
  private def tokens(stem: String): Vector[String] =
    (0 until 55).map { i =>
      if (i % 6 == 0) "the" else if (i % 7 == 0) "of" else s"$stem$i"
    }.toVector

  private def writeBatch(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)

  test("gates, scrub, and incremental dedup compose; replay is a no-op") {
    val base = Files.createTempDirectory("corpusjob").toString
    val docsDir = s"$base/incoming"
    val store = s"$base/corpus"
    val ckpt = s"$base/ckpt"

    val a = tokens("alpha").mkString(" ")
    val b = tokens("alpha").updated(30, "changed").mkString(" ")
    val junk = "tiny text"
    val pii = tokens("gamma").mkString(" ") +
      " contact bob@example.com via https://ex.example/page for the info"

    writeBatch(docsDir, Seq(1L -> a, 2L -> b, 3L -> junk, 4L -> pii))
    val r1 = CorpusBuildJob.runOnce(spark, docsDir, store, ckpt)
    assert(r1.arrived == 4 && r1.filteredOut == 1,
      s"junk doc must fail the gates: $r1")
    assert(r1.accepted == 2 && r1.rejectedNearDup == 1,
      s"near-dup of doc 1 must be rejected in-batch: $r1")

    val stored = spark.read.parquet(s"$store/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(stored.keySet == Set(1L, 4L))
    assert(stored(4L).contains("<EMAIL>") && stored(4L).contains("<URL>"))
    assert(!stored(4L).contains("bob@example.com"))

    // nothing new -> the checkpoint drains nothing, the store is stable
    val r2 = CorpusBuildJob.runOnce(spark, docsDir, store, ckpt)
    assert(r2.accepted == 0 && r2.arrived == 0, s"replay must no-op: $r2")
    assert(spark.read.parquet(s"$store/docs").count() == 2)

    // a later file: near-dup of the ACCEPTED corpus rejected via the
    // band index, a fresh doc accepted
    val c = tokens("alpha").updated(40, "other").mkString(" ")
    val d = tokens("delta").mkString(" ")
    writeBatch(docsDir, Seq(5L -> c, 6L -> d))
    val r3 = CorpusBuildJob.runOnce(spark, docsDir, store, ckpt)
    assert(r3.arrived == 2 && r3.accepted == 1 && r3.rejectedNearDup == 1,
      s"store probe must reject the near-dup: $r3")
    assert(spark.read.parquet(s"$store/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap.keySet == Set(1L, 4L, 6L))
  }

  test("cross-corpus probe: stream ≡ batch pairs; index probed, not rescanned") {
    import graft.dedup.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions.col
    val base0 =
      "the quick brown fox jumps over the lazy dog near the riverbank " +
        "while birds sing in the morning light across the quiet valley"
    val other =
      "completely different content about distributed query engines and " +
        "columnar execution with vectorized readers and shuffle services"
    val third =
      "yet another unrelated document discussing perceptual hashing of " +
        "images audio fingerprints and training corpus quality filters"
    val novel =
      "an entirely novel passage about alpine weather stations measuring " +
        "snowfall drift and wind gusts at high ridgeline observatories"

    val dir = Files.createTempDirectory("xprobe").toString
    val store = s"$dir/corpus"
    // published corpus (even ids) — internally dup-free, so the store
    // admits all of it and equals the batch generator's pub relation
    val evens = Seq((2L, base0), (4L, other), (6L, third))
      .toDF("doc_id", "text")
    assert(IncrementalDedup.processBatch(evens, store).accepted == 3)

    // incoming crawl (odd ids): three cross-parity near-dups, one novel
    val odds = Seq(
      (1L, base0.replace("valley", "meadow")),
      (3L, other.replace("services", "stacks")),
      (5L, novel),
      (7L, third.replace("filters", "gates")))
    val oddsDf = odds.toDF("doc_id", "text")

    // batch truth: the one-shot two-relation generator on the same input
    val expected = Dedup.minhashLshPairsBetween(
        evens, oddsDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.map(p => (p._1, p._2)) == Set((2L, 1L), (4L, 3L), (6L, 7L)))

    // deployment form: the odd docs STREAM in; each micro-batch probes
    // the PERSISTED band index read-only (never re-bands the store)
    val incoming = s"$dir/incoming"
    writeBatch(incoming, odds.take(2))
    writeBatch(incoming, odds.drop(2))
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val q = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(incoming)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= IncrementalDedup.probeStorePairs(b, store)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .start()
    q.awaitTermination()
    assert(got.toSet == expected)

    // plan shape: the probe scans the band INDEX once, and the docs
    // store exactly once — UNDER the candidate join, so only matched
    // accepted docs ever re-shingle
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val probe = IncrementalDedup.probeStorePairs(oddsDf, store)
    val plan = probe.queryExecution.optimizedPlan
    def paths(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath).toSeq
          case _ => Nil
        }
      }.flatten
    val all = paths(plan)
    assert(all.count(_.endsWith("/bands")) == 1, s"band index scans: $all")
    assert(all.count(_.endsWith("/docs")) == 1, s"docs scans: $all")
    val docsUnderJoin = plan.collect {
      case j: Join if paths(j).exists(_.endsWith("/docs")) => j
    }
    assert(docsUnderJoin.nonEmpty,
      "the docs scan must sit under the candidate join, not stand free")
  }

  test("the decontamination gate rejects eval-overlapping docs") {
    val base = Files.createTempDirectory("corpusjob2").toString
    val docsDir = s"$base/incoming"
    val store = s"$base/corpus"
    val ckpt = s"$base/ckpt"

    val evalText = tokens("echo").mkString(" ")
    val evalDocs = Seq(900L -> evalText).toDF("doc_id", "text")
    // shares nearly every shingle with the eval doc; passes the quality
    // gates on its own
    val leaked = tokens("echo").updated(50, "tail").mkString(" ")
    val fresh = tokens("foxtrot").mkString(" ")
    writeBatch(docsDir, Seq(10L -> leaked, 11L -> fresh))

    val r = CorpusBuildJob.runOnce(spark, docsDir, store, ckpt,
      evalDocs = Some(evalDocs))
    assert(r.arrived == 2 && r.rejectedContaminated == 1 &&
      r.accepted == 1 && r.filteredOut == 0,
      s"leaked doc must be decontaminated away: $r")
    assert(spark.read.parquet(s"$store/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap.keySet == Set(11L))

    // replay: checkpoint drains nothing, counts stay zero
    val r2 = CorpusBuildJob.runOnce(spark, docsDir, store, ckpt,
      evalDocs = Some(evalDocs))
    assert(r2.arrived == 0 && r2.rejectedContaminated == 0)
  }

  test("stream ≡ batch: multi-drain build equals the one-shot composition") {
    // The corpus_ship claim, proven on the job itself: draining the
    // same documents through TWO checkpointed streaming runs (later
    // drains carrying later ids — the corpus-build arrival order)
    // admits EXACTLY the corpus that one batch application of the same
    // gate chain admits. Sequential-greedy in-batch dedup makes
    // batching invisible by design; this pins it end to end, store
    // bytes included.
    import graft.dedup.{Dedup, IncrementalDedup}
    import org.apache.spark.sql.functions.{broadcast, col}
    val base = Files.createTempDirectory("corpusjob4").toString
    val docsDir = s"$base/incoming"
    val streamStore = s"$base/stream_corpus"
    val batchStore = s"$base/batch_corpus"
    val ckpt = s"$base/ckpt"

    val evalDocs = Seq(900L -> tokens("echo").mkString(" "))
      .toDF("doc_id", "text")
    val drain1 = Seq(
      1L -> tokens("alpha").mkString(" "),
      2L -> tokens("alpha").updated(30, "changed").mkString(" "), // in-batch dup
      3L -> "tiny text",                                          // gate-fail
      4L -> (tokens("gamma").mkString(" ") +
        " contact bob@example.com for the info"),                 // PII
      5L -> tokens("echo").updated(50, "tail").mkString(" "))     // leaked
    val drain2 = Seq(
      6L -> tokens("alpha").updated(40, "other").mkString(" "),   // dup vs store
      7L -> tokens("delta").mkString(" "),
      8L -> (tokens("zeta").mkString(" ") + " mail eve@example.net ok"))

    // STREAM: two incremental checkpointed drains
    writeBatch(docsDir, drain1)
    val r1 = CorpusBuildJob.runOnce(spark, docsDir, streamStore, ckpt,
      evalDocs = Some(evalDocs))
    writeBatch(docsDir, drain2)
    val r2 = CorpusBuildJob.runOnce(spark, docsDir, streamStore, ckpt,
      evalDocs = Some(evalDocs))
    val stream = r1 + r2
    assert(stream.arrived == 8 && stream.filteredOut == 1 &&
      stream.rejectedContaminated == 1 && stream.rejectedNearDup == 2,
      s"fixture must exercise every gate: $stream")

    // BATCH: the same gate chain, applied once to the union
    val all = (drain1 ++ drain2).toDF("doc_id", "text")
    val clean = CorpusBuildJob.cleanAndFilter(all).localCheckpoint()
    val evalHashes = Dedup.evalShingleHashes(evalDocs, "doc_id", "text")
    val bad = Dedup.contaminationAgainstHashes(clean, evalHashes,
        "doc_id", "text", CorpusBuildJob.MinSharedShingles)
      .select(col("doc_id"))
    val kept = clean.join(broadcast(bad), Seq("doc_id"), "left_anti")
    val rb = IncrementalDedup.processBatch(kept, batchStore)

    val streamDocs = spark.read.parquet(s"$streamStore/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val batchDocs = spark.read.parquet(s"$batchStore/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(streamDocs == batchDocs,
      s"stream corpus ${streamDocs.keySet} != batch ${batchDocs.keySet}")
    assert(stream.accepted == rb.accepted)
    assert(streamDocs.keySet == Set(1L, 4L, 7L, 8L))
    assert(streamDocs(4L).contains("<EMAIL>"),
      "the shipped text must be the scrubbed one on both paths")
  }

  test("WARC archives drain into the curated corpus (streaming twin)") {
    import graft.sources.WarcSource
    val base = Files.createTempDirectory("corpusjob3").toString
    val warcDir = s"$base/warc"
    new java.io.File(warcDir).mkdirs()
    val store = s"$base/corpus"
    val ckpt = s"$base/ckpt"

    val a = tokens("alpha").mkString(" ")
    val nearDup = tokens("alpha").updated(30, "changed").mkString(" ")
    val junk = "tiny text"
    val d = tokens("delta").mkString(" ")
    def resp(id: Long, text: String) =
      ("response", s"https://corpus.example/doc/$id",
        "2024-04-01T00:00:00Z", WarcSource.httpTextPayload(text))
    def writeArchive(name: String,
        recs: Seq[(String, String, String, Array[Byte])]): Unit =
      Files.write(java.nio.file.Paths.get(s"$warcDir/$name"),
        WarcSource.gzipMembers(recs))

    // archive 1 carries a warcinfo record the drain must ignore, PLUS
    // a messy-URL variant of doc 1 (case/port/tracking/fragment) whose
    // normalized URI collapses onto the same id BEFORE the gates;
    // splitBytes=256 exercises the SPLIT reader inside the stream
    writeArchive("a1.warc.gz", Seq(
      ("warcinfo", "", "2024-04-01T00:00:00Z",
        "software: graft\r\n".getBytes("ISO-8859-1")),
      resp(1, a), resp(3, junk),
      ("response",
        "HTTPS://Corpus.Example:443/doc/1?utm_source=feed#top",
        "2024-04-01T00:00:00Z", WarcSource.httpTextPayload(a))))
    writeArchive("a2.warc.gz", Seq(resp(2, nearDup), resp(6, d)))

    val r1 = CorpusBuildJob.runOnceFromWarc(spark, warcDir, store, ckpt,
      splitBytes = 256L)
    // 5 response records, 4 rows after URL-level collapse
    assert(r1.arrived == 4 && r1.filteredOut == 1,
      s"junk body must fail the gates: $r1")
    assert(r1.accepted == 2 && r1.rejectedNearDup == 1,
      s"in-batch near-dup of doc 1 must be rejected: $r1")
    val admitted = spark.read.parquet(s"$store/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(admitted.keySet == Set(1L, 6L))
    assert(admitted(1L) == a, "the collapsed variant must not change doc 1")

    // replay: the checkpoint drains nothing
    val r2 = CorpusBuildJob.runOnceFromWarc(spark, warcDir, store, ckpt,
      splitBytes = 256L)
    assert(r2.arrived == 0 && r2.accepted == 0, s"replay must no-op: $r2")

    // a LATE archive: near-dup of the accepted corpus rejected via the
    // band-index probe, a fresh doc accepted
    writeArchive("a3.warc.gz", Seq(
      resp(7, tokens("alpha").updated(40, "other").mkString(" ")),
      resp(8, tokens("zeta").mkString(" "))))
    val r3 = CorpusBuildJob.runOnceFromWarc(spark, warcDir, store, ckpt,
      splitBytes = 256L)
    assert(r3.arrived == 2 && r3.accepted == 1 && r3.rejectedNearDup == 1,
      s"store probe must reject the near-dup: $r3")
    assert(spark.read.parquet(s"$store/docs")
      .select("doc_id", "text").as[(Long, String)].collect().toMap.keySet == Set(1L, 6L, 8L))
  }
}
