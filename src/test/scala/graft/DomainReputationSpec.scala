package graft

import java.nio.file.Files

import graft.streaming.DomainReputationJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Domain reputation is EARNED OVER TIME and sticks: a farm's first
  * clean page passes (no history), its noisy wave drops itself, and a
  * later clean page still drops because the domain's cumulative record
  * condemns it. Redelivery of archived doc_ids is a no-op. */
class DomainReputationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val noisy =
    "spam page !!!*** ### %%% @@@ $$$ ^^^ &&& ((( ))) ??? !!!***"
  private val clean =
    "a perfectly reasonable sentence about the weather today"

  private def landBatch(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "domain", "text")
      .coalesce(1).write.mode("append").parquet(dir)

  test("reputation evolves across batches and sticks") {
    val base = Files.createTempDirectory("domrep").toString
    val in = s"$base/in"; val store = s"$base/store"
    val ckpt = s"$base/ckpt"

    // batch 1: the farm's first page is clean -> no history, passes
    landBatch(in, Seq((1L, "farm.example", clean),
      (2L, "good.example", clean)))
    val s1 = DomainReputationJob.runOnce(spark, in, store, ckpt)
    assert(s1.admitted == 2 && s1.rejectedDomain == 0)

    // batch 2: the noisy wave — cumulative farm stats cross the
    // ceiling, so the unmasking batch itself drops; good stays good
    landBatch(in, Seq((3L, "farm.example", noisy),
      (4L, "farm.example", noisy), (5L, "good.example", clean)))
    val s2 = DomainReputationJob.runOnce(spark, in, store, ckpt)
    assert(s2.admitted == 1, s"batch2: $s2")
    assert(s2.rejectedDomain == 2, s"batch2: $s2")

    // batch 3: a clean-looking farm page STILL drops — reputation
    // attaches to the domain, not the page
    landBatch(in, Seq((6L, "farm.example", clean),
      (7L, "good.example", clean)))
    val s3 = DomainReputationJob.runOnce(spark, in, store, ckpt)
    assert(s3.admitted == 1 && s3.rejectedDomain == 1, s"batch3: $s3")

    // corpus holds exactly the admitted docs; the farm's b1 page is in
    // (admitted before the evidence existed — history is not rewritten)
    val corpus = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus.toSeq == Seq(1L, 2L, 5L, 7L))

    // replay with nothing new: checkpoint drains zero files
    val s4 = DomainReputationJob.runOnce(spark, in, store, ckpt)
    assert(s4.arrived == 0)

    // crash-replay shape: the same doc_ids land again as a "new" file
    // (fresh checkpoint, half-written-batch redelivery) — the archive
    // skip makes them a no-op, stats are not double-counted
    landBatch(in, Seq((6L, "farm.example", clean),
      (5L, "good.example", clean)))
    val s5 = DomainReputationJob.runOnce(spark, in, store,
      s"$base/ckpt2")
    assert(s5.skippedRedelivered >= 2, s"redelivery: $s5")
    assert(s5.admitted == 0 && s5.rejectedDomain == 0, s"redelivery: $s5")
    val corpus2 = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus2.toSeq == Seq(1L, 2L, 5L, 7L), "corpus unchanged")
  }

  test("same-batch duplicate doc_ids collapse to one deterministic row") {
    val base = Files.createTempDirectory("domrep-dup").toString
    val in = s"$base/in"; val store = s"$base/store"
    // doc 1 arrives three times in ONE micro-batch (two identical, one
    // differing payload); the archive anti-join alone would admit all
    // three — stats and corpus must count it once, min-struct winner
    landBatch(in, Seq((1L, "good.example", clean),
      (1L, "good.example", clean), (1L, "zzz.example", noisy),
      (2L, "good.example", clean)))
    val s1 = DomainReputationJob.runOnce(spark, in, store, s"$base/ckpt")
    assert(s1.arrived == 4 && s1.skippedRedelivered == 2, s"dup: $s1")
    assert(s1.admitted == 2, s"dup: $s1")
    val corpus = spark.read.parquet(s"$store/corpus")
    assert(corpus.count() == 2)
    // deterministic winner: min(struct(domain, text)) -> good.example
    assert(corpus.filter($"doc_id" === 1L).select("domain")
      .as[String].head() == "good.example")
    val archive = spark.read.parquet(s"$store/archive")
    assert(archive.count() == 2, "archive holds one row per doc_id")
  }

  test("crash between archive and corpus writes repairs on redelivery") {
    val base = Files.createTempDirectory("domrep-crash").toString
    val store = s"$base/store"
    // simulate the crash window: a half-completed drain wrote doc 1 to
    // the ARCHIVE as admitted but died before the corpus append
    Seq((1L, "good.example", 0L, 40L, true))
      .toDF("doc_id", "domain", "npunct", "nchars", "admitted")
      .coalesce(1).write.parquet(s"$store/archive")
    // redelivery: the same doc arrives again (fresh checkpoint)
    landBatch(s"$base/in", Seq((1L, "good.example", clean),
      (2L, "good.example", clean)))
    val s1 = DomainReputationJob.runOnce(spark, s"$base/in", store,
      s"$base/ckpt")
    // doc 1 is not re-counted (archive skip) but its text IS repaired
    // into the corpus; doc 2 admits normally
    assert(s1.skippedRedelivered == 1 && s1.admitted == 1, s"crash: $s1")
    val corpus = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus.toSeq == Seq(1L, 2L), "orphan repaired exactly once")
    // drain again with nothing new missing: no second copy of doc 1
    landBatch(s"$base/in", Seq((1L, "good.example", clean)))
    DomainReputationJob.runOnce(spark, s"$base/in", store, s"$base/ckpt2")
    val corpus2 = spark.read.parquet(s"$store/corpus")
      .select("doc_id").as[Long].collect().sorted
    assert(corpus2.toSeq == Seq(1L, 2L), "repair is idempotent")
  }

  test("corrupt archive FAILS the job instead of resetting reputation") {
    val base = Files.createTempDirectory("domrep-corrupt").toString
    val store = s"$base/store"
    // a present-but-unreadable archive: the state dir EXISTS, so
    // readOrEmpty must read it — and a garbage footer must propagate
    // as a failure. The old catch-all would have substituted an empty
    // frame: every archived doc_id looks fresh, rejected docs re-admit,
    // corpus rows duplicate — silent state corruption.
    Files.createDirectories(java.nio.file.Paths.get(s"$store/archive"))
    Files.write(
      java.nio.file.Paths.get(s"$store/archive/part-00000.parquet"),
      "this is not a parquet file".getBytes)
    landBatch(s"$base/in", Seq((1L, "good.example", clean)))
    val ex = intercept[Exception] {
      DomainReputationJob.runOnce(spark, s"$base/in", store, s"$base/ckpt")
    }
    // the failure must be the corrupt read surfacing, and the job must
    // not have admitted anything on top of unreadable state
    assert(!new java.io.File(s"$store/corpus").exists(),
      s"no corpus writes on corrupt state (got ${ex.getClass.getName})")
  }
}
