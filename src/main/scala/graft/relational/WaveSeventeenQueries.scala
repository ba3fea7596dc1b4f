package graft.relational

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.relational.TrainingDataQueries.{AnnK, AnnQueries}
import graft.sim.IncrementalAnnIndex

/** Seventeenth-wave surface: layout MIGRATION at from-source rotation
  * (the r18 lifecycle could only CARRY a layout across a rotation;
  * the from-source re-train is exactly the moment an operator changes
  * geometry or goes codes-only, because the raw source vectors are in
  * hand either way), plus the dedup store's admission-regime rebuild.
  */
object WaveSeventeenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Seq[Q] = Seq(

    // GEOMETRY MIGRATION at rotation — ann_rebuild_standing_adc's
    // missing sibling: generation 0 is a RAW store at the DEFAULT 4x4
    // PQ geometry, the standing drain applies the v0->v1 delta, and
    // the rotation OVERRIDES the layout instead of carrying it —
    // rebuildServedFromSource(keepRaw = false, 2x8) re-trains
    // quantizer + codebooks from the versioned corpus at the store's
    // _applied_v position (v1) and re-inits gen 1 ADC-ONLY at the new
    // geometry (markers re-stamp from the override), reclaiming the
    // raw-vector footprint in the same rotation that re-trains. The
    // SAME checkpointed drain then lands the v1->v2 delta on the
    // migrated generation. The search is pure ADC; the oracle
    // recomputes the whole IVFADC pipeline at the NEW 2x8 geometry
    // from the rebuild-point corpus (v1) over the final content (v2)
    // — i.e. the migrated store answers exactly like a store that had
    // always been 2x8 ADC-only from the rotation point.
    Q("ann_rotate_migrate", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.streaming.AnnMaintainJob
      val base = java.nio.file.Files
        .createTempDirectory("ann_rot_mig").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 8), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 1), root)
      val v2 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 5), root)
      val annRoot = s"$base/ann"
      // gen 0: RAW at the default 4x4 geometry
      IncrementalAnnIndex.initServed(
        VersionedTable.readVersion(s, root, v0), annRoot, pq = true)
      val cdcDir = s"$base/cdc"
      val ckpt = s"$base/ckpt"
      AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), cdcDir)
      AnnMaintainJob.runOnceServed(s, cdcDir, annRoot, ckpt,
        seedSourceVersion = v0)
      // the migration: rotate INTO 2x8 ADC-only (override, not carry)
      IncrementalAnnIndex.rebuildServedFromSource(s, annRoot, root,
        keepRaw = Some(false), pqSegments = Some(2), pqCodes = Some(8))
      AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v1, v2, Seq("vec_id")), cdcDir)
      AnnMaintainJob.runOnceServed(s, cdcDir, annRoot, ckpt,
        seedSourceVersion = v0) // same checkpoint: drains delta 2
      IncrementalAnnIndex.topKPqAdc(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          IncrementalAnnIndex.servedStore(s, annRoot), AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(WaveFourteenQueries.pqOracle(
      "vec_id % 10 != 1", "vec_id % 10 != 5", None,
      adcOnly = true, segs = 2, kc = 8))),

    // ADMISSION-REGIME REBUILD on the persisted dedup store — the
    // operator the creation record's refusal message points at: the
    // published corpus (even ids) ingested LOOSE (threshold 1.01
    // admits everything, near-dups included), doc_id % 8 == 0 taken
    // down, then the whole store rebuilt into the DEFAULT (tighter)
    // regime: tombstones carry (removed ids stay down), and the live
    // corpus replays in doc_id order — sequential-greedy lowest-id-
    // first admission, so the rebuilt corpus is the greedy maximal
    // independent set over the near-dup pair graph among live evens.
    // The incoming crawl (odd ids) then probes the REBUILT store. The
    // oracle unrolls the greedy rounds as CTEs (the LPA discipline):
    // per round, accept every live even doc with no smaller-id
    // UNDECIDED near-dup, reject its neighbors, iterate — then keeps
    // exactly the cross-parity LSH pairs whose even side survived.
    Q("cross_corpus_dups_rebuilt", (s, dir) => {
      import graft.dedup.IncrementalDedup
      val base = java.nio.file.Files
        .createTempDirectory("xdup_rebuilt").toString
      val store = s"$base/corpus"
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      IncrementalDedup.processBatch(
        d.filter(col("doc_id") % 4 === 0), store, threshold = 1.01)
      IncrementalDedup.processBatch(
        d.filter(col("doc_id") % 4 === 2), store, threshold = 1.01)
      IncrementalDedup.removeDocs(s, store,
        d.filter(col("doc_id") % 8 === 0).select("doc_id"))
      val rebuilt = s"$base/corpus_rebuilt"
      IncrementalDedup.rebuildStoreThreshold(s, store, rebuilt,
        graft.dedup.Dedup.JaccardThreshold)
      IncrementalDedup.probeStorePairs(
          d.filter(col("doc_id") % 2 =!= 0), rebuilt)
        .orderBy(col("pub_id"), col("new_id"))
    }, Some {
      // every round CTE MATERIALIZED: DuckDB inlines plain CTEs per
      // reference, and 8 unrolled rounds referencing back up the chain
      // would re-expand the whole LSH pipeline exponentially (the LPA
      // oracle's discipline)
      val rounds = (1 to 8).map { i =>
        s"""e$i AS MATERIALIZED (
           |  SELECT da, db FROM ee
           |  WHERE da IN (SELECT doc_id FROM u${i - 1})
           |    AND db IN (SELECT doc_id FROM u${i - 1})),
           |m$i AS MATERIALIZED (
           |  SELECT doc_id FROM u${i - 1}
           |  WHERE doc_id NOT IN (SELECT db FROM e$i)),
           |x$i AS MATERIALIZED (
           |  SELECT DISTINCT db AS doc_id FROM e$i
           |  WHERE da IN (SELECT doc_id FROM m$i)),
           |u$i AS MATERIALIZED (
           |  SELECT doc_id FROM u${i - 1}
           |  WHERE doc_id NOT IN (SELECT doc_id FROM m$i)
           |    AND doc_id NOT IN (SELECT doc_id FROM x$i))""".stripMargin
      }.mkString(",\n")
      val accepted = (1 to 8).map(i => s"SELECT doc_id FROM m$i")
        .mkString(" UNION ALL ")
      s"""WITH ${graft.dedup.Dedup.minhashLshCtes("documents",
            graft.dedup.Dedup.JaccardThreshold)},
         |pairs AS MATERIALIZED (SELECT da, db, jaccard FROM lshpairs),
         |ee AS MATERIALIZED (
         |  SELECT da, db FROM pairs
         |  WHERE da % 2 = 0 AND db % 2 = 0
         |    AND da % 8 <> 0 AND db % 8 <> 0),
         |u0 AS MATERIALIZED (
         |  SELECT DISTINCT doc_id FROM documents
         |  WHERE doc_id % 2 = 0 AND doc_id % 8 <> 0),
         |$rounds,
         |acc AS ($accepted)
         |SELECT CASE WHEN da % 2 = 0 THEN da ELSE db END AS pub_id,
         |  CASE WHEN da % 2 = 0 THEN db ELSE da END AS new_id, jaccard
         |FROM pairs WHERE (da % 2 = 0) <> (db % 2 = 0)
         |  AND (CASE WHEN da % 2 = 0 THEN da ELSE db END)
         |    IN (SELECT doc_id FROM acc)
         |ORDER BY pub_id, new_id""".stripMargin
    }),

    // TAKEDOWN in the ANN serving lifecycle — the vector-index twin of
    // cross_corpus_dups_takedown, with the composition hazard only the
    // serve-latest chain exposes: a from-source rotation reads the
    // UNREDACTED corpus (the rights request redacted the INDEX, not
    // the versioned table), so without armor the rotation would
    // quietly re-admit every taken-down vector behind a
    // healthy-looking cutover. Here the ADC-only 2x8 store drains
    // v0->v1, vec_id % 9 == 4 is taken down (some ids stored, some
    // pre-arrival — the blocklist shape), the rotation re-trains on
    // the REDACTED source at the store's _applied_v position (armor
    // excluded from content AND training input, tombstones carried),
    // and the SAME checkpointed drain lands v1->v2 — whose inserts
    // include tombstoned ids the new generation must refuse. The
    // oracle recomputes IVFADC at the 2x8 geometry with the takedown
    // exclusion folded into BOTH corpus filters.
    Q("ann_takedown_rotate", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.streaming.AnnMaintainJob
      val base = java.nio.file.Files
        .createTempDirectory("ann_td_rot").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 8), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 1), root)
      val v2 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 5), root)
      val annRoot = s"$base/ann"
      IncrementalAnnIndex.initServed(
        VersionedTable.readVersion(s, root, v0), annRoot,
        pq = true, keepRaw = false, pqSegments = 2, pqCodes = 8)
      val cdcDir = s"$base/cdc"
      val ckpt = s"$base/ckpt"
      AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), cdcDir)
      AnnMaintainJob.runOnceServed(s, cdcDir, annRoot, ckpt,
        seedSourceVersion = v0)
      // the takedown: every vec_id % 9 == 4, whether currently stored
      // (most), pre-arrival (% 10 == 1 ids return at v2), or never
      // coming — one armor for all three
      IncrementalAnnIndex.takedownVecs(s,
        IncrementalAnnIndex.servedStore(s, annRoot),
        emb.filter(col("vec_id") % 9 === 4).select("vec_id"))
      // rotation from the UNREDACTED versioned table: content and
      // training input redact via the carried tombstones
      IncrementalAnnIndex.rebuildServedFromSource(s, annRoot, root)
      AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v1, v2, Seq("vec_id")), cdcDir)
      AnnMaintainJob.runOnceServed(s, cdcDir, annRoot, ckpt,
        seedSourceVersion = v0) // same checkpoint: drains delta 2
      IncrementalAnnIndex.topKPqAdc(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          IncrementalAnnIndex.servedStore(s, annRoot), AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(WaveFourteenQueries.pqOracle(
      "vec_id % 10 != 1 AND vec_id % 9 != 4",
      "vec_id % 10 != 5 AND vec_id % 9 != 4", None,
      adcOnly = true, segs = 2, kc = 8))),
  )
}
