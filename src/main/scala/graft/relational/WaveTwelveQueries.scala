package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q
import graft.relational.TrainingDataQueries.{AnnK, AnnQueries}

/** Twelfth-wave surface: the round-13 closures of the incremental
  * lifecycle — roll-up routing through the materialized-summary
  * optimizer rule, and ANN index maintenance fed by the real CDC read.
  */
object WaveTwelveQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Custkey cutoff for the roll-up gate's scan-side filter — below the
    * smallest SF's customer count (150 at sf0.001), so the filter
    * demonstrably BINDS at every scale factor. */
  val RollupCustCap = 100L

  val all: Seq[Q] = Seq(

    // Roll-up routing: the summary is registered on the FINE grouping
    // (o_custkey, o_orderstatus); the user query below groups by a
    // strict SUBSET (o_orderstatus) and filters on a summary key it no
    // longer groups by (o_custkey). SummaryRewrite must serve it by
    // RE-AGGREGATING the summary — count(*) re-sums the maintained
    // counts, sum re-sums, min/max re-extremize — with the filter
    // remapped BELOW the re-aggregation (it keeps or drops whole
    // summary rows exactly as it keeps or drops the base rows they
    // summarize). The daily-view/monthly-query shape: the plan reads
    // O(summary), the fact table never appears. Base is a
    // session-private snapshot COPY (the mv_rewrite isolation
    // discipline — the standing registration can route nothing else).
    // The driver gate pins the SEMANTICS (values equal a DuckDB
    // recompute from base); SummaryRewriteSpec pins the ROUTING.
    Q("mv_rewrite_rollup", (s, dir) => {
      import graft.plans.SummaryRewrite
      import graft.plans.SummaryRewrite.MaterializedSummary
      val tmp = java.nio.file.Files.createTempDirectory("mv_ru")
      val base = tmp.resolve("base").toString
      val sumPath = tmp.resolve("s").toString
      s.read.parquet(t(dir, "orders")).write.parquet(base)
      s.read.parquet(base)
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("s_okey"),
          min(col("o_totalprice")).as("mn_price"),
          max(col("o_totalprice")).as("mx_price"))
        .write.parquet(sumPath) // in deployment: recomputed on refresh
      SummaryRewrite.enable(s)
      SummaryRewrite.register(MaterializedSummary(base, sumPath,
        Seq("o_custkey", "o_orderstatus"),
        Map(("count", "*") -> "n", ("sum", "o_orderkey") -> "s_okey",
          ("min", "o_totalprice") -> "mn_price",
          ("max", "o_totalprice") -> "mx_price"),
        rebuildMaintained = true)) // extrema: rebuild-only freshness
      s.read.parquet(base)
        .filter(col("o_custkey") <= RollupCustCap)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("sum_okey"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_orderstatus"))
    }, Some(
      s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
         |  min(o_totalprice) AS min_price,
         |  max(o_totalprice) AS max_price
         |FROM orders WHERE o_custkey <= $RollupCustCap
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ...and the avg decomposition through the SAME roll-up: avg is
    // algebraic but not distributive, so the rule serves it only from
    // a registered (sum(col), count(col)) PAIR — sum(sum_okey) /
    // sum(cnt_okey) here, where the per-column count (never count(*))
    // licenses it because avg ignores NULLs. The user query below
    // groups by a strict subset and never mentions the decomposition;
    // the gate pins values against DuckDB's avg from base.
    Q("mv_rewrite_avg", (s, dir) => {
      import graft.plans.SummaryRewrite
      import graft.plans.SummaryRewrite.MaterializedSummary
      val tmp = java.nio.file.Files.createTempDirectory("mv_avg")
      val base = tmp.resolve("base").toString
      val sumPath = tmp.resolve("s").toString
      s.read.parquet(t(dir, "orders")).write.parquet(base)
      s.read.parquet(base)
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          count(col("o_orderkey")).as("cnt_okey"),
          sum(col("o_orderkey")).as("sum_okey"))
        .write.parquet(sumPath)
      SummaryRewrite.enable(s)
      SummaryRewrite.register(MaterializedSummary(base, sumPath,
        Seq("o_custkey", "o_orderstatus"),
        Map(("count", "*") -> "n", ("count", "o_orderkey") -> "cnt_okey",
          ("sum", "o_orderkey") -> "sum_okey")))
      s.read.parquet(base)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          avg(col("o_orderkey")).as("avg_raw"))
        .select(col("o_orderstatus"), col("n_orders"),
          round(col("avg_raw"), 6).as("avg_okey"))
        .orderBy(col("o_orderstatus"))
    }, Some(
      s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |  round(avg(o_orderkey), 6) AS avg_okey
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin)),

    // ANN index maintenance off the REAL CDC feed: embeddings v0
    // initializes the IVF store (fixed quantizer = the 8 lowest-id v0
    // vectors), the v0->v1 change feed comes off the real
    // VersionedTable.changes read (inserts: vec_id ≡ 3 mod 10;
    // deletes: ≡ 7 mod 10), and applyChanges maintains the index —
    // inserts probe-assigned to the frozen centroids, deletes removed
    // by rewriting ONLY the touched inverted-list partitions. The
    // oracle recomputes the search from the v1 snapshot with the SAME
    // v0-derived quantizer, so the gate pins maintained-index ==
    // rebuilt-index, query-for-query: the mv_incremental contract
    // applied to similarity search.
    Q("ann_incremental_cdc", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.sim.IncrementalAnnIndex
      val base = java.nio.file.Files
        .createTempDirectory("ann_cdc").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 3), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 7), root)
      val store = s"$base/ivf"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store)
      IncrementalAnnIndex.applyChanges(
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), store)
      IncrementalAnnIndex.topK(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(
      s"""WITH f AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM f WHERE vec_id % 10 != 7),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM f
         |          WHERE vec_id % 10 != 3 ORDER BY vec_id
         |          LIMIT ${graft.sim.Similarity.IvfCentroids}),
         |q AS (SELECT vec_id AS qid, v AS qv FROM f
         |      WHERE vec_id < $AnnQueries),
         |asg AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT c.vec_id, c.v, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY round(list_cosine_similarity(c.v, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM corpus c CROSS JOIN cents ct) x
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qv, cent_id FROM (
         |    SELECT q.qid, q.qv, ct.cent_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY round(list_cosine_similarity(q.qv, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM q CROSS JOIN cents ct) x
         |  WHERE rn <= ${graft.sim.Similarity.IvfProbes}),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes p JOIN asg a ON p.cent_id = a.cent_id
         |  WHERE p.qid != a.vec_id),
         |rk AS (
         |  SELECT qid, cid, sim,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
         |FROM rk WHERE rank <= $AnnK ORDER BY qid, rank""".stripMargin)),

    // ...and the STREAMING twin: three chained embedding snapshots
    // commit through the real VersionedTable, the two CDC feeds land
    // as files, and AnnMaintainJob drains them through a checkpointed
    // stream — one applyChanges per micro-batch, `_applied_v` markers
    // as the replay ledger, the v_from chain verified per batch. The
    // v1->v2 delta RE-INSERTS ids the v0->v1 delta never touched and
    // deletes ids it inserted is exactly the sequence where unordered
    // application corrupts (re-insert hits the redelivery skip) — the
    // gate pins the maintained store ≡ a DuckDB search over the FINAL
    // snapshot with the v0 quantizer: mv_standing's discipline for
    // similarity search.
    Q("ann_standing", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.sim.IncrementalAnnIndex
      val base = java.nio.file.Files
        .createTempDirectory("ann_stand").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 3), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 7), root)
      val v2 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 9), root)
      val store = s"$base/ivf"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store)
      val cdcDir = s"$base/cdc"
      // one file per delta, mtimes stamped in landing order — the
      // MvMaintainJob feed-layout contract (a same-timestamp tie
      // between the two burst writes would otherwise let the file
      // source mis-order them and trip the drain's slot check)
      graft.streaming.AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), cdcDir)
      graft.streaming.AnnMaintainJob.landDelta(s,
        VersionedTable.changes(s, root, v1, v2, Seq("vec_id")), cdcDir)
      graft.streaming.AnnMaintainJob.runOnce(
        s, cdcDir, store, s"$base/ckpt", seedSourceVersion = v0)
      IncrementalAnnIndex.topK(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(
      s"""WITH f AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM f WHERE vec_id % 10 != 9),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM f
         |          WHERE vec_id % 10 != 3 ORDER BY vec_id
         |          LIMIT ${graft.sim.Similarity.IvfCentroids}),
         |q AS (SELECT vec_id AS qid, v AS qv FROM f
         |      WHERE vec_id < $AnnQueries),
         |asg AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT c.vec_id, c.v, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY round(list_cosine_similarity(c.v, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM corpus c CROSS JOIN cents ct) x
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qv, cent_id FROM (
         |    SELECT q.qid, q.qv, ct.cent_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY round(list_cosine_similarity(q.qv, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM q CROSS JOIN cents ct) x
         |  WHERE rn <= ${graft.sim.Similarity.IvfProbes}),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes p JOIN asg a ON p.cent_id = a.cent_id
         |  WHERE p.qid != a.vec_id),
         |rk AS (
         |  SELECT qid, cid, sim,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
         |FROM rk WHERE rank <= $AnnK ORDER BY qid, rank""".stripMargin)),

    // ...and the lifecycle's third act: REBUILD. A store maintained
    // off the CDC feed (init on v0, applyChanges to v1) re-trains its
    // quantizer over its own CURRENT content into a fresh destination
    // — the operation IVF cannot do incrementally, run as an MVCC
    // cutover (readers keep the old store until the pointer swap).
    // The oracle recomputes the search from the v1 snapshot with a
    // V1-TRAINED quantizer (first-8 rule over the v1 corpus), so the
    // gate pins rebuilt-after-maintenance == built-fresh-from-current,
    // quantizer INCLUDED — the drift a maintained index accumulates
    // against its frozen v0 centroids is exactly what the rebuild
    // must erase.
    Q("ann_rebuild", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.sim.IncrementalAnnIndex
      val base = java.nio.file.Files
        .createTempDirectory("ann_rb").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 3), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 7), root)
      val store = s"$base/ivf"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store)
      IncrementalAnnIndex.applyChanges(
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), store)
      val store2 = s"$base/ivf_rebuilt"
      IncrementalAnnIndex.rebuild(s, store, store2)
      IncrementalAnnIndex.topK(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store2, AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(
      s"""WITH f AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM f WHERE vec_id % 10 != 7),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM corpus
         |          ORDER BY vec_id
         |          LIMIT ${graft.sim.Similarity.IvfCentroids}),
         |q AS (SELECT vec_id AS qid, v AS qv FROM f
         |      WHERE vec_id < $AnnQueries),
         |asg AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT c.vec_id, c.v, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY round(list_cosine_similarity(c.v, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM corpus c CROSS JOIN cents ct) x
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qv, cent_id FROM (
         |    SELECT q.qid, q.qv, ct.cent_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY round(list_cosine_similarity(q.qv, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM q CROSS JOIN cents ct) x
         |  WHERE rn <= ${graft.sim.Similarity.IvfProbes}),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes p JOIN asg a ON p.cent_id = a.cent_id
         |  WHERE p.qid != a.vec_id),
         |rk AS (
         |  SELECT qid, cid, sim,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
         |FROM rk WHERE rank <= $AnnK ORDER BY qid, rank""".stripMargin)),

    // Small-file compaction under the CDC lifecycle: the maintained
    // store's partitions fragment (init + every delta appends one
    // file per touched partition); compact(maxFiles = 1) rewrites
    // every fragmented partition in BOTH trees through the same
    // staged-transaction protocol, and the search afterwards must be
    // bit-identical — the oracle is ann_incremental_cdc's exactly, so
    // the gate pins content preservation through the rewrite.
    Q("ann_compact", (s, dir) => {
      import graft.sinks.VersionedTable
      import graft.sim.IncrementalAnnIndex
      val base = java.nio.file.Files
        .createTempDirectory("ann_cp").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 3), root)
      val v1 = VersionedTable.commit(
        emb.filter(col("vec_id") % 10 =!= 7), root)
      val store = s"$base/ivf"
      IncrementalAnnIndex.init(
        VersionedTable.readVersion(s, root, v0), store)
      IncrementalAnnIndex.applyChanges(
        VersionedTable.changes(s, root, v0, v1, Seq("vec_id")), store)
      IncrementalAnnIndex.compact(s, store, maxFiles = 1)
      IncrementalAnnIndex.topK(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK)
        .orderBy(col("qid"), col("rank"))
    }, Some(
      s"""WITH f AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |corpus AS (SELECT vec_id, v FROM f WHERE vec_id % 10 != 7),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM f
         |          WHERE vec_id % 10 != 3 ORDER BY vec_id
         |          LIMIT ${graft.sim.Similarity.IvfCentroids}),
         |q AS (SELECT vec_id AS qid, v AS qv FROM f
         |      WHERE vec_id < $AnnQueries),
         |asg AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT c.vec_id, c.v, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY round(list_cosine_similarity(c.v, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM corpus c CROSS JOIN cents ct) x
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qv, cent_id FROM (
         |    SELECT q.qid, q.qv, ct.cent_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY round(list_cosine_similarity(q.qv, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM q CROSS JOIN cents ct) x
         |  WHERE rn <= ${graft.sim.Similarity.IvfProbes}),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes p JOIN asg a ON p.cent_id = a.cent_id
         |  WHERE p.qid != a.vec_id),
         |rk AS (
         |  SELECT qid, cid, sim,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
         |FROM rk WHERE rank <= $AnnK ORDER BY qid, rank""".stripMargin)),

    // Filtered vector search — "top-k WHERE metadata predicate", the
    // production retrieval shape (search only English documents): the
    // allowlist (doc ids with lang = 'en') semi-joins the PROBED
    // candidates before ranking, so each query's top-k is dense
    // within the permitted set. Probing and partition pruning are
    // topK's unchanged; the filter costs |probed lists| join rows,
    // never the index.
    Q("ann_topk_filtered", (s, dir) => {
      import graft.sim.IncrementalAnnIndex
      val base = java.nio.file.Files
        .createTempDirectory("ann_flt").toString
      val emb = s.read.parquet(t(dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val store = s"$base/ivf"
      IncrementalAnnIndex.init(emb, store)
      val allowed = s.read.parquet(t(dir, "documents"))
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      IncrementalAnnIndex.topKAmong(
          emb.filter(col("vec_id") < AnnQueries)
            .select(col("vec_id").as("qid"), col("embedding")),
          store, AnnK, allowed)
        .orderBy(col("qid"), col("rank"))
    }, Some(
      s"""WITH f AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, v AS cv FROM f
         |          ORDER BY vec_id
         |          LIMIT ${graft.sim.Similarity.IvfCentroids}),
         |allowed AS (SELECT doc_id AS vec_id FROM documents
         |            WHERE lang = 'en'),
         |q AS (SELECT vec_id AS qid, v AS qv FROM f
         |      WHERE vec_id < $AnnQueries),
         |asg AS (
         |  SELECT vec_id, v, cent_id FROM (
         |    SELECT c.vec_id, c.v, ct.cent_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY round(list_cosine_similarity(c.v, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM f c CROSS JOIN cents ct) x
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT qid, qv, cent_id FROM (
         |    SELECT q.qid, q.qv, ct.cent_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY round(list_cosine_similarity(q.qv, ct.cv), 4)
         |          DESC, ct.cent_id) AS rn
         |    FROM q CROSS JOIN cents ct) x
         |  WHERE rn <= ${graft.sim.Similarity.IvfProbes}),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cid,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS sim
         |  FROM probes p JOIN asg a ON p.cent_id = a.cent_id
         |  JOIN allowed w ON w.vec_id = a.vec_id
         |  WHERE p.qid != a.vec_id),
         |rk AS (
         |  SELECT qid, cid, sim,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, cid) AS rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
         |FROM rk WHERE rank <= $AnnK ORDER BY qid, rank""".stripMargin)),

    // Tar round-trip: publish the corpus as real ustar shards on disk
    // (the corpus_tar_publish writer, atomic-commit path included),
    // then READ THE FILES BACK through the source side and prove every
    // entry's identity — shard assignment, name, byte length, and the
    // md5 of the payload — against a DuckDB recompute from the input
    // table alone. The write gate checks archive geometry; this one
    // checks CONTENT end to end through the bytes on disk.
    Q("corpus_tar_roundtrip", (s, dir) => {
      import graft.dedup.Dedup
      import graft.sinks.TarShardSink
      val rows = s.read.parquet(t(dir, "documents")).select(
        (Dedup.md5Hash32(col("doc_id").cast("string"), "tar:")
          % WaveElevenQueries.TarShards).as("shard"),
        concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        col("text").cast("binary").as("data"))
      val out = java.nio.file.Files
        .createTempDirectory("tar_rt").toString
      TarShardSink.write(rows, out, WaveElevenQueries.TarShards).collect()
      TarShardSink.read(s, out)
        .select(col("shard"), col("name"),
          length(col("data")).cast("long").as("n_bytes"),
          md5(col("data")).as("h"))
        .orderBy(col("name"))
    }, Some(
      s"""SELECT ${graft.dedup.Dedup.md5Hash32Sql(
            "CAST(doc_id AS VARCHAR)", "tar:")}
         |    % ${WaveElevenQueries.TarShards} AS shard,
         |  concat(CAST(doc_id AS VARCHAR), '.txt') AS name,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes,
         |  md5(text) AS h
         |FROM documents ORDER BY name""".stripMargin)),
  )
}
