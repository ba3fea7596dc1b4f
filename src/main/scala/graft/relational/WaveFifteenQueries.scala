package graft.relational

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.relational.TrainingDataQueries.{AnnK, AnnQueries, AnnRerank}
import graft.sim.{IncrementalAnnIndex, IvfPq}

/** Fifteenth-wave surface: the round-16 verdict's scale-parameterization
  * seams closed as first-class operators — the standing dedup drain
  * (the crawl-feed wiring of the persisted dedup store), the ADC-only
  * (raw-vectors-dropped) maintained ANN store, and filtered search on
  * the one-shot IVFADC path.
  */
object WaveFifteenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Seq[Q] = Seq(

    // The ADC-only deployment form of the compressed maintained store,
    // END TO END: init(pq = true, keepRaw = false) writes the lists
    // tree WITHOUT the raw vector column (the codes ARE the content —
    // the 8x-plus storage win the PQ layout exists for), the real
    // VersionedTable CDC feed maintains it (deletes rewrite touched
    // partitions; inserts probe-assign and ENCODE — the raw vector
    // exists only in flight), and the search is pure ADC: no scan in
    // the whole lifecycle ever reads a stored raw vector, because
    // none is stored. The oracle is the full-pipeline IVFADC
    // recomputation cut at the ADC ranking — codes-only storage must
    // answer exactly like the raw-keeping store's ADC search.
    Q("ann_adc_codes_only", (s, dir) => {
      import graft.sinks.VersionedTable
      val base = java.nio.file.Files
        .createTempDirectory("ann_adconly").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 5), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 2), root)
      val store = s"$base/ivfpq"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store, pq = true,
        keepRaw = false)
      IncrementalAnnIndex.applyChanges(
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), store)
      IncrementalAnnIndex.topKPqAdc(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(WaveFourteenQueries.pqOracle(
      "vec_id % 10 != 5", "vec_id % 10 != 2", None, adcOnly = true))),

    // The compressed maintained store at a NON-DEFAULT geometry (2
    // segments x 8 codes instead of the 4x4 default) under the real
    // CDC lifecycle: the geometry is an init parameter recorded in the
    // store's _pq_* marker, every encode/table/search path reads it
    // back from the books, and this oracle recomputes the WHOLE IVFADC
    // pipeline at that geometry in DuckDB — 2 residual-codebook
    // k-means chains of 8 exact-integer centroids seeded from the 8
    // lowest init ids, 32-wide segments, per-probe 8-entry ADC tables,
    // shortlist, exact rerank. Pins that nothing anywhere hard-wires
    // the default geometry at the value level.
    Q("ann_incremental_pq_geometry", (s, dir) => {
      import graft.sinks.VersionedTable
      val base = java.nio.file.Files
        .createTempDirectory("ann_ipqg").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 6), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 1), root)
      val store = s"$base/ivfpq"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store, pq = true,
        pqSegments = 2, pqCodes = 8)
      IncrementalAnnIndex.applyChanges(
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), store)
      IncrementalAnnIndex.topKPq(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK, WaveFourteenQueries.PqShortlist)
        .orderBy(col("qid"), col("rank"))
    }, Some(WaveFourteenQueries.pqOracle(
      "vec_id % 10 != 6", "vec_id % 10 != 1", None,
      segs = 2, kc = 8))),

    // Filtered search over the ONE-SHOT IVFADC path — topKRerankAmong:
    // the allowlist (English documents) semi-joins the coded
    // candidates before ADC ranking, so the shortlist and the final
    // ranks are dense within the permitted set; the maintained-store
    // twin is ann_topk_filtered_ivfpq. The oracle carries the same
    // allowlist join inside its ADC stage.
    Q("ann_topk_filtered_ivfpq_oneshot", (s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val allowed = s.read.parquet(t(dir, "documents"))
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      IvfPq.topKRerankAmong(emb, AnnQueries, AnnK, AnnRerank, allowed)
        .orderBy(col("qid"), col("rank"))
    }, Some(IvfPq.topKRerankAmongOracle("embeddings", AnnQueries, AnnK,
      AnnRerank,
      "SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'"))),

    // The persisted dedup store under its PRODUCTION wiring: the
    // published corpus (even doc_ids) lands as two feed FILES and a
    // checkpointed streaming drain ingests them (batch = processBatch,
    // threshold > 1 admits everything — the ingest-all-then-probe
    // shape; the band index still builds, the redelivery skip still
    // binds), then the incoming crawl (odd ids) probes the bucketed
    // store. Same decision surface as cross_corpus_dups_store, now
    // proving the DRAIN: checkpointed AvailableNow, one file per
    // micro-batch, mtime-stamped landing — so the oracle is the same
    // cross-parity LSH chain.
    Q("cross_corpus_dups_standing", (s, dir) => {
      import graft.dedup.IncrementalDedup
      import graft.streaming.{AnnMaintainJob, DedupMaintainJob}
      val base = java.nio.file.Files
        .createTempDirectory("xdup_standing").toString
      val store = s"$base/corpus"
      val feed = s"$base/feed"
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      AnnMaintainJob.landDelta(s, d.filter(col("doc_id") % 4 === 0), feed)
      AnnMaintainJob.landDelta(s, d.filter(col("doc_id") % 4 === 2), feed)
      DedupMaintainJob.runOnce(s, feed, store, s"$base/ckpt",
        threshold = 1.01)
      IncrementalDedup.probeStorePairs(
          d.filter(col("doc_id") % 2 =!= 0), store)
        .orderBy(col("pub_id"), col("new_id"))
    }, Some(
      s"""WITH ${graft.dedup.Dedup.minhashLshCtes("documents",
            graft.dedup.Dedup.JaccardThreshold)}
         |SELECT CASE WHEN da % 2 = 0 THEN da ELSE db END AS pub_id,
         |  CASE WHEN da % 2 = 0 THEN db ELSE da END AS new_id, jaccard
         |FROM lshpairs WHERE (da % 2 = 0) <> (db % 2 = 0)
         |ORDER BY pub_id, new_id""".stripMargin)),
  )
}
