package graft.relational

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.relational.TrainingDataQueries.{AnnK, AnnQueries, AnnRerank}
import graft.sim.{IncrementalAnnIndex, IvfPq}

/** Sixteenth-wave surface: the round-17 layouts composed into the
  * serve-latest lifecycle — a served ADC-only store at a non-default
  * PQ geometry rotating through `rebuildServedFromSource` (codes
  * cannot retrain a quantizer; the versioned source corpus at the
  * store's `_applied_v` position can) with the standing drain
  * continuing across the cutover.
  */
object WaveSixteenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Seq[Q] = Seq(

    // ann_rebuild_standing's twin for the layouts a stored-vector
    // rebuild cannot host, END TO END: generation 0 is ADC-ONLY at the
    // non-default 2x8 geometry (initServed passes the full init layout
    // surface through), the standing drain applies the v0->v1 delta,
    // then the rotation the r17 lifecycle was missing —
    // rebuildServedFromSource reads the VERSIONED corpus at the
    // store's _applied_v position (v1), re-trains quantizer + 2x8
    // codebooks from those raw source vectors, re-inits gen 1 in the
    // SAME layout (ADC-only flag and _pq_* geometry both carry),
    // copies the chain markers, cuts the pointer over — and the SAME
    // checkpointed drain keeps going, landing the v1->v2 delta on the
    // new generation. The search is pure ADC (no scan anywhere reads a
    // raw vector — none is stored); the oracle recomputes the whole
    // IVFADC pipeline at the 2x8 geometry from the REBUILD-POINT
    // corpus (v1 quantizer + codebooks) over the FINAL content (v2),
    // cut at the ADC ranking.
    Q("ann_rebuild_standing_adc", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.streaming.AnnMaintainJob
      val base = java.nio.file.Files
        .createTempDirectory("ann_rbs_adc").toString
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
      // rotation: re-init gen 1 from the corpus at _applied_v (= v1)
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
      "vec_id % 10 != 1", "vec_id % 10 != 5", None,
      adcOnly = true, segs = 2, kc = 8))),

    // Filtered search on the ADC-ONLY store — the form a codes-only
    // deployment was otherwise locked out of: the store keeps NO raw
    // vectors (init keepRaw = false), the allowlist (English
    // documents) semi-joins the probed CODED candidates before ADC
    // ranking, and ranks are dense within the permitted set. No scan
    // in the whole query reads a raw vector column, because none
    // exists on disk. The oracle carries the allowlist inside its ADC
    // stage and cuts at the ADC ranking.
    Q("ann_adc_filtered", (s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("ann_adcf").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val store = s"$base/ivfpq"
      IncrementalAnnIndex.init(emb, store, pq = true, keepRaw = false)
      val allowed = s.read.parquet(t(dir, "documents"))
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      IncrementalAnnIndex.topKPqAdcAmong(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK, allowed)
        .orderBy(col("qid"), col("rank"))
    }, Some(WaveFourteenQueries.pqOracle("TRUE", "TRUE",
      Some("SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'"),
      adcOnly = true))),

    // TAKEDOWN on the persisted dedup store — the removal a real
    // training corpus needs (rights requests, policy strikes), with
    // the replay-convergence twist a naive delete would break: the
    // removed doc's text and band-index rows leave the store, but its
    // doc_id stays as a TOMBSTONE so the redelivery skip keeps
    // recognizing it (a replayed feed file must never re-admit a
    // taken-down doc). The published corpus (even ids) ingests, every
    // doc_id % 8 == 0 is taken down, and the incoming crawl (odd ids)
    // probes: pairs against removed pubs are gone, pairs against
    // surviving pubs are untouched — so the oracle is the cross-parity
    // LSH chain with the taken-down pub ids excluded.
    Q("cross_corpus_dups_takedown", (s, dir) => {
      import graft.dedup.IncrementalDedup
      val store = java.nio.file.Files
        .createTempDirectory("xdup_takedown").toString + "/corpus"
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      IncrementalDedup.processBatch(
        d.filter(col("doc_id") % 4 === 0), store, threshold = 1.01)
      IncrementalDedup.processBatch(
        d.filter(col("doc_id") % 4 === 2), store, threshold = 1.01)
      IncrementalDedup.removeDocs(s, store,
        d.filter(col("doc_id") % 8 === 0).select("doc_id"))
      IncrementalDedup.probeStorePairs(
          d.filter(col("doc_id") % 2 =!= 0), store)
        .orderBy(col("pub_id"), col("new_id"))
    }, Some(
      s"""WITH ${graft.dedup.Dedup.minhashLshCtes("documents",
            graft.dedup.Dedup.JaccardThreshold)}
         |SELECT CASE WHEN da % 2 = 0 THEN da ELSE db END AS pub_id,
         |  CASE WHEN da % 2 = 0 THEN db ELSE da END AS new_id, jaccard
         |FROM lshpairs WHERE (da % 2 = 0) <> (db % 2 = 0)
         |  AND (CASE WHEN da % 2 = 0 THEN da ELSE db END) % 8 <> 0
         |ORDER BY pub_id, new_id""".stripMargin)),

    // The ONE-SHOT IVFADC path at a non-default geometry (2 segments x
    // 8 codes, 3 probes over 8 coarse lists) — IvfPq.Geom lifts what
    // were compile-time constants to a per-call value, the twin of the
    // maintained store's per-store `_pq_*` geometry: the ad-hoc /
    // benchmark form can now express the same dim-768 x 48-segment
    // shapes. The oracle generator takes the SAME Geom, so the DuckDB
    // twin recomputes coarse training, 2 residual codebook chains of 8
    // exact-integer centroids, 32-wide segment tables, 3-probe ADC,
    // shortlist, and exact rerank at that geometry.
    Q("ann_topk_rerank_geom", (s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      IvfPq.topKRerank(emb, AnnQueries, AnnK, AnnRerank,
          IvfPq.Geom(segments = 2, codes = 8, nProbe = 3))
        .orderBy(col("qid"), col("rank"))
    }, Some(IvfPq.topKRerankOracle("embeddings", AnnQueries, AnnK,
      AnnRerank, IvfPq.Geom(segments = 2, codes = 8, nProbe = 3)))),
  )
}
