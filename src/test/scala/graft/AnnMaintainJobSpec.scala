package graft

import java.nio.file.Files

import graft.sim.IncrementalAnnIndex
import graft.sinks.VersionedTable
import graft.streaming.AnnMaintainJob
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream≡batch for CDC-driven ANN-index maintenance: checkpointed
  * drains of chained delta files leave the store equal to a direct
  * applyChanges composition, replay skips via the applied-version
  * markers, and out-of-order deltas fail loudly (the delete-then-
  * reinsert sequence is NOT order-commutative through the redelivery
  * skip). */
class AnnMaintainJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Deterministic synthetic embeddings, dim 8 (IncrementalAnnSpec's). */
  private def vecs(ids: Seq[Int]) = ids.map { i =>
    (i.toLong, (0 until 8).map(d =>
      (((i * 31 + d * 7) % 13) - 6).toFloat / 6f).toArray)
  }.toDF("vec_id", "embedding")

  private def listedIds(store: String): Set[Long] =
    spark.read.parquet(s"$store/lists")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("drains maintain the store to the final snapshot; replay skips") {
    val base = Files.createTempDirectory("annjob").toString
    val root = s"$base/vt"
    // v0: 0..149; v1: drop multiples of 10; v2: multiples of 10 are
    // BACK and multiples of 15 leave — the delete-then-reinsert
    // sequence whose order matters
    val v0 = VersionedTable.commit(vecs(0 until 150), root)
    val v1 = VersionedTable.commit(
      vecs((0 until 150).filterNot(_ % 10 == 0)), root)
    val v2 = VersionedTable.commit(
      vecs((0 until 150).filterNot(_ % 15 == 0)), root)
    val store = s"$base/ivf"
    IncrementalAnnIndex.init(VersionedTable.readVersion(spark, root, v0), store)
    val cdc = s"$base/cdc"
    VersionedTable.changes(spark, root, v0, v1, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    VersionedTable.changes(spark, root, v1, v2, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)

    val r = AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt",
      seedSourceVersion = v0)
    assert(r.applied == 2 && r.skippedRedelivered == 0)
    assert(r.appliedThrough == v2)
    assert(listedIds(store) ==
      (0 until 150).filterNot(_ % 15 == 0).map(_.toLong).toSet)

    // idle re-drain: nothing new
    val r2 = AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt",
      seedSourceVersion = v0)
    assert(r2.batches == 0)

    // wholesale redelivery (fresh checkpoint): both batches skip via
    // the applied-version markers — re-applying delta v0->v1 against
    // the v2 store would wrongly delete the re-inserted ids
    val r3 = AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt2",
      seedSourceVersion = v0)
    assert(r3.batches == 2 && r3.applied == 0 && r3.skippedRedelivered == 2)
    assert(listedIds(store) ==
      (0 until 150).filterNot(_ % 15 == 0).map(_.toLong).toSet)

    // the maintained store answers exactly like a direct applyChanges
    // composition over the same feed
    val store2 = s"$base/ivf2"
    IncrementalAnnIndex.init(VersionedTable.readVersion(spark, root, v0), store2)
    IncrementalAnnIndex.applyChanges(
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), store2)
    IncrementalAnnIndex.applyChanges(
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), store2)
    val q = vecs(0 until 5).select(col("vec_id").as("qid"), col("embedding"))
    val a = IncrementalAnnIndex.topK(q, store, 3)
    val b = IncrementalAnnIndex.topK(q, store2, 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("an empty delta (producer no-op commit) advances the chain") {
    val base = Files.createTempDirectory("annjob_noop").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(0 until 100), root)
    val v1 = VersionedTable.commit(vecs(0 until 100), root) // no-op commit
    val v2 = VersionedTable.commit(vecs(0 until 120), root)
    val store = s"$base/ivf"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, v0), store)
    val cdc = s"$base/cdc"
    // changes(v0, v1) is EMPTY — the producer landed a file for a
    // no-op commit; the chain must absorb it, not wedge permanently
    VersionedTable.changes(spark, root, v0, v1, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    VersionedTable.changes(spark, root, v1, v2, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    val r = AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt",
      seedSourceVersion = v0)
    assert(r.applied == 2 && r.appliedThrough == v2)
    assert(listedIds(store) == (0 until 120).map(_.toLong).toSet)

    // wholesale redelivery (fresh checkpoint): the empty file's
    // id-derived v_to is stable across replays, so it SKIPS — the
    // marker never re-advances past the true chain head
    val r2 = AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt2",
      seedSourceVersion = v0)
    assert(r2.applied == 0 && r2.skippedRedelivered == 2)
    assert(r2.appliedThrough == v2)
  }

  test("a mis-sorted empty delta fails loudly instead of masking a real one") {
    // the silent-loss scenario: the v1->v2 EMPTY delta's file sorts
    // (by mtime) BEFORE the real v0->v1 delta. The empty file claims
    // chain slot 0 and advances the marker; under a bare
    // `v_to <= applied-through` skip the real delta would then be
    // silently dropped as a redelivery. The slot check instead sees
    // the real delta's own stamps contradict its shifted slot and
    // aborts the drain with the store untouched.
    val base = Files.createTempDirectory("annjob_missort").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(0 until 100), root)
    val v1 = VersionedTable.commit(vecs(0 until 120), root)
    val v2 = VersionedTable.commit(vecs(0 until 120), root) // no-op commit
    val store = s"$base/ivf"
    IncrementalAnnIndex.init(VersionedTable.readVersion(spark, root, v0), store)
    val cdc = s"$base/cdc"
    // the EMPTY v1->v2 delta lands first (earlier mtime) ...
    VersionedTable.changes(spark, root, v1, v2, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    Thread.sleep(1100) // distinct mtimes: file-source order is pinned
    // ... the REAL v0->v1 delta (inserts 100..119) lands second
    VersionedTable.changes(spark, root, v0, v1, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    val ex = intercept[Exception] {
      AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt",
        seedSourceVersion = v0)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("out of order")))
    assert(listedIds(store) == (0 until 100).map(_.toLong).toSet,
      "the real delta must NOT be silently skipped nor applied")
  }

  test("drain -> rebuild -> cutover -> drain continues the same feed") {
    val base = Files.createTempDirectory("annjob_cut").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(8 until 150), root)
    val v1 = VersionedTable.commit(vecs(0 until 150), root)
    val v2 = VersionedTable.commit(
      vecs((0 until 150).filterNot(_ % 10 == 0)), root)
    val annRoot = s"$base/ann"
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), annRoot)
    assert(IncrementalAnnIndex.servedStore(spark, annRoot)
      .endsWith("gen=0"))
    val cdc = s"$base/cdc"
    val ckpt = s"$base/ckpt"
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), cdc)
    val r1 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r1.applied == 1 && r1.appliedThrough == v1)
    // rebuild + cutover: gen 1 re-trains the quantizer on the v1
    // content (ids 0..7 arrived after init, so the quantizer moves)
    val g = IncrementalAnnIndex.rebuildServed(spark, annRoot)
    assert(g == 1)
    val served = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(served.endsWith("gen=1"))
    // the SAME checkpoint keeps draining: the next delta applies to
    // the new generation at the carried feed position
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), cdc)
    val r2 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r2.applied == 1 && r2.appliedThrough == v2)
    assert(listedIds(served) ==
      (0 until 150).filterNot(_ % 10 == 0).map(_.toLong).toSet)
    // gen 0 is untouched at its own position (readers that resolved
    // before the cutover keep a consistent store)
    assert(listedIds(s"$annRoot/gen=0") == (0 until 150).map(_.toLong).toSet)
    // the final store answers like a fresh build over v1 content
    // maintained with the same last delta
    val twin = s"$base/twin"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, v1), twin)
    IncrementalAnnIndex.applyChanges(
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), twin)
    val q = vecs(0 until 5).select(col("vec_id").as("qid"), col("embedding"))
    val a = IncrementalAnnIndex.topK(q, served, 3)
    val b = IncrementalAnnIndex.topK(q, twin, 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // a crashed rebuild attempt (unmarked gen=2 junk) is discarded and
    // redone; the pointer only ever advances on a completed rebuild
    val fs = new org.apache.hadoop.fs.Path(annRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$annRoot/gen=2/lists"))
    val g2 = IncrementalAnnIndex.rebuildServed(spark, annRoot)
    assert(g2 == 2)
    assert(listedIds(s"$annRoot/gen=2") == listedIds(served))
    // initServed refuses a root that already serves
    val ex = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.initServed(vecs(0 until 10), annRoot)
    }
    assert(ex.getMessage.contains("already serves"))
    // retention: gens 0..2 served along the way; the age guard keeps
    // a generation until its SUCCESSOR's marker is old enough (the
    // "vacuum only after the max query runtime" discipline as a
    // parameter), keep=2 leaves the PRIOR generation as
    // in-flight-reader grace, keep=1 then retires it; the served one
    // stays resolvable and intact, and a re-vacuum is a no-op
    val droppedAge = IncrementalAnnIndex.vacuumGenerations(spark, annRoot,
      keep = 1, minRetiredAgeMs = 3600L * 1000)
    assert(droppedAge.isEmpty,
      "nothing retired less than an hour ago may be vacuumed")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$annRoot/gen=0")))
    val dropped2 = IncrementalAnnIndex.vacuumGenerations(spark, annRoot,
      keep = 2)
    assert(dropped2 == Seq(0L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$annRoot/gen=1")),
      "keep=2 must leave the previous generation for in-flight readers")
    val dropped = IncrementalAnnIndex.vacuumGenerations(spark, annRoot)
    assert(dropped == Seq(1L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$annRoot/gen=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$annRoot/_serve_0")))
    assert(IncrementalAnnIndex.servedStore(spark, annRoot)
      .endsWith("gen=2"))
    assert(listedIds(s"$annRoot/gen=2").nonEmpty)
    assert(IncrementalAnnIndex.vacuumGenerations(spark, annRoot).isEmpty)
  }

  test("ADC-only served root: from-source rotation carries the layout; " +
      "the drain continues") {
    val base = Files.createTempDirectory("annjob_adc").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(
      vecs((0 until 120).filterNot(_ % 10 == 0)), root)
    val v1 = VersionedTable.commit(vecs(0 until 120), root)
    val v2 = VersionedTable.commit(
      vecs((0 until 120).filterNot(_ % 15 == 0)), root)
    val annRoot = s"$base/ann"
    // generation 0: ADC-only at a NON-DEFAULT geometry — the full init
    // layout surface rides through initServed
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), annRoot,
      pq = true, keepRaw = false, pqSegments = 2, pqCodes = 8)
    val gen0 = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(gen0.endsWith("gen=0"))
    assert(!spark.read.parquet(s"$gen0/lists").columns.contains("v"),
      "an ADC-only generation stores no raw vector column")
    val q = vecs(0 until 5).select(col("vec_id").as("qid"), col("embedding"))
    val exRaw = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.topK(q, gen0, 3)
    }
    assert(exRaw.getMessage.contains("ADC-only"))

    val cdc = s"$base/cdc"
    val ckpt = s"$base/ckpt"
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), cdc)
    val r1 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r1.applied == 1 && r1.appliedThrough == v1)

    // a stored-vector rebuild genuinely cannot host this layout — the
    // refusal names the from-source path
    val exReb = intercept[Exception] {
      IncrementalAnnIndex.rebuildServed(spark, annRoot)
    }
    assert(exReb.getMessage.contains("ADC-only") &&
      exReb.getMessage.contains("rebuildServedFromSource"))

    // rotation from the versioned SOURCE at the store's _applied_v
    // position (v1): re-trained quantizer + codebooks from raw source
    // vectors, same layout, chain markers carried, pointer cut over
    val g = IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot, root)
    assert(g == 1)
    val served = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(served.endsWith("gen=1"))
    val fs = new org.apache.hadoop.fs.Path(annRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served/_adc_only")),
      "the ADC-only flag must survive rotation")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served/_pq_s2_c8_i1")),
      "the trained-k geometry must survive rotation")
    assert(!spark.read.parquet(s"$served/lists").columns.contains("v"))

    // the SAME checkpoint keeps draining onto the new generation
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), cdc)
    val r2 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r2.applied == 1 && r2.appliedThrough == v2)
    assert(listedIds(served) ==
      (0 until 120).filterNot(_ % 15 == 0).map(_.toLong).toSet)

    // answers exactly like a fresh ADC-only build at the rotation
    // point maintained with the same last delta
    val twin = s"$base/twin"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, v1), twin,
      pq = true, keepRaw = false, pqSegments = 2, pqCodes = 8)
    IncrementalAnnIndex.applyChanges(
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), twin)
    val a = IncrementalAnnIndex.topKPqAdc(q, served, 3)
    val b = IncrementalAnnIndex.topKPqAdc(q, twin, 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // a source table that does NOT match the store's content refuses
    // loudly: rebuilding from the wrong corpus would cut over to a
    // healthy-looking index that serves the wrong vectors
    val wrongRoot = s"$base/vt_wrong"
    (0 to 2).foreach(_ =>
      VersionedTable.commit(vecs(500 until 620), wrongRoot))
    val exSrc = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot, wrongRoot)
    }
    assert(exSrc.getMessage.contains("disagrees"))
    assert(IncrementalAnnIndex.servedStore(spark, annRoot)
      .endsWith("gen=1"), "a refused rebuild must not cut over")

    // a root whose store never drained a feed has no position to read
    // the source at — loud refusal, not a wrong-version rebuild
    val root2 = s"$base/ann2"
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), root2,
      pq = true, keepRaw = false, pqSegments = 2, pqCodes = 8)
    val exPos = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.rebuildServedFromSource(spark, root2, root)
    }
    assert(exPos.getMessage.contains("_applied_v"))
  }

  test("layout MIGRATION at from-source rotation: raw 4x4 rotates into " +
      "2x8 ADC-only; markers re-stamp; the drain continues") {
    val base = Files.createTempDirectory("annjob_mig").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(
      vecs((0 until 120).filterNot(_ % 10 == 0)), root)
    val v1 = VersionedTable.commit(vecs(0 until 120), root)
    val v2 = VersionedTable.commit(
      vecs((0 until 120).filterNot(_ % 15 == 0)), root)
    val annRoot = s"$base/ann"
    // generation 0: RAW at the default 4x4 geometry, non-default
    // trained-k 12 (the quantizer size must survive the migration too)
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), annRoot,
      nCentroids = 12, pq = true)
    val gen0 = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(spark.read.parquet(s"$gen0/lists").columns.contains("v"),
      "generation 0 is a raw store")
    val cdc = s"$base/cdc"
    val ckpt = s"$base/ckpt"
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), cdc)
    AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)

    // the migration: override the layout at rotation instead of
    // carrying it — raw 4x4 becomes ADC-only 2x8 in the same
    // from-source re-train
    val g = IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot,
      root, keepRaw = Some(false), pqSegments = Some(2),
      pqCodes = Some(8))
    assert(g == 1)
    val served = IncrementalAnnIndex.servedStore(spark, annRoot)
    val fs = new org.apache.hadoop.fs.Path(annRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served/_adc_only")),
      "the migrated generation is ADC-only")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served/_pq_s2_c8_i1")),
      "the geometry marker re-stamps from the OVERRIDE")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served/_ivf_k12")),
      "the trained-k quantizer size carries (not a default reset)")
    assert(!spark.read.parquet(s"$served/lists").columns.contains("v"),
      "no raw vector column survives the migration")
    assert(spark.read.parquet(s"$served/centroids").count() == 12)
    // gen 0 keeps ITS layout (readers that resolved before the
    // cutover still see the raw 4x4 store)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$gen0/_pq_s4_c4_i1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$gen0/_adc_only")))

    // the SAME checkpoint keeps draining onto the migrated generation
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), cdc)
    val r2 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r2.applied == 1 && r2.appliedThrough == v2)
    assert(listedIds(served) ==
      (0 until 120).filterNot(_ % 15 == 0).map(_.toLong).toSet)

    // twin equivalence: the migrated store answers exactly like a
    // store that had always been 2x8 ADC-only from the rotation point
    val twin = s"$base/twin"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, v1), twin,
      nCentroids = 12, pq = true, keepRaw = false,
      pqSegments = 2, pqCodes = 8)
    IncrementalAnnIndex.applyChanges(
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), twin)
    val q = vecs(0 until 5).select(col("vec_id").as("qid"), col("embedding"))
    val a = IncrementalAnnIndex.topKPqAdc(q, served, 3)
    val b = IncrementalAnnIndex.topKPqAdc(q, twin, 3)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // a geometry the dimension cannot host refuses before any cutover
    val exGeo = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot, root,
        pqSegments = Some(3))
    }
    assert(exGeo.getMessage.contains("divide"))
    assert(IncrementalAnnIndex.servedStore(spark, annRoot)
      .endsWith("gen=1"), "a refused migration must not cut over")

    // and the REVERSE migration works too: ADC-only back to raw (the
    // source has the vectors), carrying the 2x8 geometry this time
    val g2 = IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot,
      root, keepRaw = Some(true))
    assert(g2 == 2)
    val served2 = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(spark.read.parquet(s"$served2/lists").columns.contains("v"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$served2/_adc_only")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$served2/_pq_s2_c8_i1")),
      "an un-overridden geometry carries through the reverse migration")
    // the re-raw'd store serves the exact paths again
    val exact = IncrementalAnnIndex.topK(q, served2, 3)
    assert(exact.count() > 0)
  }

  test("from-source rotation refuses a coinciding id space whose " +
      "content diverges (raw generations sample-compare vectors)") {
    val base = Files.createTempDirectory("annjob_div").toString
    def vecsAlt(ids: Seq[Int]) = ids.map { i =>
      (i.toLong, (0 until 8).map(d =>
        (((i * 17 + d * 5) % 11) - 5).toFloat / 5f).toArray)
    }.toDF("vec_id", "embedding")
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(0 until 80), root)
    val v1 = VersionedTable.commit(vecs(0 until 100), root)
    val annRoot = s"$base/ann"
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), annRoot)
    val cdc = s"$base/cdc"
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), cdc)
    AnnMaintainJob.runOnceServed(spark, cdc, annRoot, s"$base/ckpt",
      seedSourceVersion = v0)
    // wrong source: the SAME id space and version history, DIFFERENT
    // embeddings — the id-level check alone cannot tell them apart
    val wrongRoot = s"$base/vt_wrong"
    VersionedTable.commit(vecsAlt(0 until 80), wrongRoot)
    VersionedTable.commit(vecsAlt(0 until 100), wrongRoot)
    val ex = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot,
        wrongRoot)
    }
    assert(ex.getMessage.contains("sampled vector"))
    assert(IncrementalAnnIndex.servedStore(spark, annRoot)
      .endsWith("gen=0"), "a refused rebuild must not cut over")
    // the true source passes the same gate
    assert(IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot,
      root) == 1)
  }

  test("takedown in the served lifecycle: the drain refuses re-inserts, " +
      "the from-source rotation excludes tombstoned ids and carries " +
      "the armor") {
    val base = Files.createTempDirectory("annjob_td").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(0 until 120), root)
    val v1 = VersionedTable.commit(vecs(0 until 140), root)
    val v2 = VersionedTable.commit(
      vecs((0 until 140).filterNot(_ % 15 == 0)), root)
    val annRoot = s"$base/ann"
    IncrementalAnnIndex.initServed(
      VersionedTable.readVersion(spark, root, v0), annRoot, pq = true)
    val gen0 = IncrementalAnnIndex.servedStore(spark, annRoot)
    // two stored ids leave; 130 is a PRE-ARRIVAL blocklist entry (it
    // only enters the corpus at v1 — the drain must refuse it)
    val td = IncrementalAnnIndex.takedownVecs(spark, gen0,
      Seq(7L, 23L, 130L).toDF("vec_id"))
    assert(td.removed == 2 && td.tombstoned == 3)

    val cdc = s"$base/cdc"
    val ckpt = s"$base/ckpt"
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v0, v1, Seq("vec_id")), cdc)
    val r1 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r1.applied == 1 && r1.appliedThrough == v1)
    assert(!listedIds(gen0).exists(Set(7L, 23L, 130L)),
      "the drain must refuse the tombstoned insert (130) and the " +
        "removed ids must stay gone")

    // rotation from the UNREDACTED source: the id verification treats
    // tombstoned ids as expected-but-excluded (no refusal), the new
    // generation's content AND training input exclude them, and the
    // armor carries
    val g = IncrementalAnnIndex.rebuildServedFromSource(spark, annRoot, root)
    assert(g == 1)
    val served = IncrementalAnnIndex.servedStore(spark, annRoot)
    assert(!listedIds(served).exists(Set(7L, 23L, 130L)))
    val fs = new org.apache.hadoop.fs.Path(annRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$served/tombstones")),
      "the tombstones tree must carry to the rotated generation")

    // the SAME checkpoint keeps draining; a late re-insert of a
    // tombstoned id through the feed is refused by the new generation
    AnnMaintainJob.landDelta(spark,
      VersionedTable.changes(spark, root, v1, v2, Seq("vec_id")), cdc)
    val r2 = AnnMaintainJob.runOnceServed(spark, cdc, annRoot, ckpt,
      seedSourceVersion = v0)
    assert(r2.applied == 1 && r2.appliedThrough == v2)
    assert(listedIds(served) ==
      (0 until 140).filterNot(_ % 15 == 0)
        .map(_.toLong).toSet -- Set(7L, 23L, 130L))
    val app = IncrementalAnnIndex.appendBatch(vecs(Seq(7, 23, 130)), served)
    assert(app.appended == 0,
      "the rotated generation must still refuse taken-down ids")
  }

  test("auto-compaction keeps a long drain's file counts bounded") {
    val base = Files.createTempDirectory("annjob_ac").toString
    val root = s"$base/vt"
    // five chained insert deltas, each touching every inverted list —
    // an uncompacted drain accretes one file per delta per partition
    val tiers = (0 to 5).map(n => vecs(0 until 60 + n * 30))
    val versions = tiers.map(t => VersionedTable.commit(t, root))
    val cdc = s"$base/cdc"
    versions.sliding(2).foreach { w =>
      AnnMaintainJob.landDelta(spark,
        VersionedTable.changes(spark, root, w(0), w(1), Seq("vec_id")), cdc)
    }
    def maxFilesPerPart(store: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/lists")).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("cid="))
        .map(d => fs.listStatus(d.getPath).count(f =>
          f.isFile && !f.getPath.getName.startsWith("_"))).max
    }
    // control: no auto-compaction — fragmentation grows with the drain
    val plain = s"$base/plain"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, versions.head), plain)
    AnnMaintainJob.runOnce(spark, cdc, plain, s"$base/ckpt_p",
      seedSourceVersion = versions.head)
    assert(maxFilesPerPart(plain) > 2,
      "fixture must fragment for the bound to mean anything")
    // compacting drain: every partition stays within the bound with no
    // manual compact() call anywhere
    val ac = s"$base/ac"
    IncrementalAnnIndex.init(
      VersionedTable.readVersion(spark, root, versions.head), ac)
    val r = AnnMaintainJob.runOnce(spark, cdc, ac, s"$base/ckpt_a",
      seedSourceVersion = versions.head,
      autoCompactEvery = 2, autoCompactMaxFiles = 1)
    assert(r.applied == 5)
    assert(maxFilesPerPart(ac) <= 2, // one delta may land after the
      "auto-compaction must bound fragmentation") // last compact tick
    // content identical to the uncompacted twin, replay still skips
    assert(listedIds(ac) == listedIds(plain))
    val r2 = AnnMaintainJob.runOnce(spark, cdc, ac, s"$base/ckpt_a2",
      seedSourceVersion = versions.head)
    assert(r2.applied == 0 && r2.skippedRedelivered == 5)
  }

  test("an out-of-order delta fails loudly; the store is untouched") {
    val base = Files.createTempDirectory("annjob_ooo").toString
    val root = s"$base/vt"
    val v0 = VersionedTable.commit(vecs(0 until 100), root)
    val v1 = VersionedTable.commit(
      vecs((0 until 100).filterNot(_ % 10 == 0)), root)
    val v2 = VersionedTable.commit(vecs(0 until 100), root)
    val store = s"$base/ivf"
    IncrementalAnnIndex.init(VersionedTable.readVersion(spark, root, v0), store)
    val cdc = s"$base/cdc"
    // the v1->v2 delta lands FIRST
    VersionedTable.changes(spark, root, v1, v2, Seq("vec_id"))
      .coalesce(1).write.mode("append").parquet(cdc)
    val ex = intercept[Exception] {
      AnnMaintainJob.runOnce(spark, cdc, store, s"$base/ckpt",
        seedSourceVersion = v0)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("out of order")))
    assert(listedIds(store) == (0 until 100).map(_.toLong).toSet)
  }
}
