package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.relational.RelationalQueries.Q
import graft.relational.TrainingDataQueries.{AnnK, AnnQueries}
import graft.sim.Similarity

/** Eleventh-wave surface: the incremental-consumer and publish-side
  * operators around the corpus lifecycle — view maintenance off the CDC
  * feed, a leakage-safe train/val split, hard-negative mining for
  * embedding-model training, and the tar-shard publish manifest.
  */
object WaveElevenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "documents"))

  /** Cosine at/above this is "positive" (embedding near-dup / paraphrase
    * tier) for hard-negative mining; below it, the nearest survivors are
    * the hard negatives. 0.40 sits under the corpus' max query-pair
    * similarity at every SF, so the exclusion demonstrably BINDS (2-19
    * would-be top-k rows displaced per SF, fixture-measured). */
  val HardNegPosThreshold = 0.40

  /** Shard count for the tar publish gate — matches corpus_shard's gate
    * scale; O(thousands) in a real 100 TB publish. */
  val TarShards = 16

  val all: Seq[Q] = Seq(

    // Incremental materialized-view maintenance: aggregate orders v0
    // per customer, then MAINTAIN the view across the v0->v1 CDC feed
    // (WaveNine's snapshot derivations: inserts ≡3, deletes ≡7 mod 10,
    // price updates ≡0 mod 4) — the delta rule applied through the REAL
    // VersionedTable.changes read. The oracle recomputes the aggregate
    // from the v1 derivation directly, so the gate pins
    // maintain(agg(v0), changes(v0,v1)) == agg(v1): the 100 TB fact
    // table is never rescanned, only the view-sized join and the
    // delta-sized feed move.
    Q("mv_incremental", (s, dir) => {
      import graft.sinks.{IncrementalView, VersionedTable}
      val root = java.nio.file.Files
        .createTempDirectory("vt_mv").resolve("t").toString
      val (a, b) = WaveNineQueries.snapshots(s, dir)
      val v0 = VersionedTable.commit(a, root)
      val v1 = VersionedTable.commit(b, root)
      val mv0 = VersionedTable.readVersion(s, root, v0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("sum_price"))
      val ch = VersionedTable.changes(s, root, v0, v1, Seq("o_orderkey"))
      IncrementalView.maintain(mv0, ch, Seq("o_custkey"),
          "n_orders", Seq("price_cents" -> "sum_price"))
        .orderBy(col("o_custkey"))
    }, Some(
      s"""WITH base AS (
         |  SELECT o_orderkey, o_custkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         |  FROM orders),
         |b AS (
         |  SELECT o_orderkey, o_custkey,
         |    price_cents + CASE WHEN o_orderkey % 4 = 0 THEN 100
         |      ELSE 0 END AS price_cents
         |  FROM base WHERE o_orderkey % 10 != 7)
         |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(price_cents) AS BIGINT) AS sum_price
         |FROM b GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Leakage-safe train/val split: near-duplicate documents must land
    // on the SAME side of an eval split or the held-out set leaks into
    // training. Pairs come from the LSH near-dup path, groups from
    // connected components, and the split is hashed from the COMPONENT
    // id (singletons fall back to their own doc_id) — so same component
    // => same hash => same side, structurally. The md5-derived 32-bit
    // hash is the engine-neutral q_hash_sample primitive; ~90/10 at the
    // gate (both sides populated at every SF).
    Q("leakage_safe_split", (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text")
      val comps = graft.operators.ConnectedComponents.run(pairs, "da", "db")
      d.select(col("doc_id"))
        .join(comps, col("doc_id") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("split",
          when(Dedup.md5Hash32(col("component").cast("string"), "sp:")
            % 100 < 90, "train").otherwise("val"))
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH RECURSIVE ${Dedup.minhashLshCtes(
            "documents", Dedup.JaccardThreshold)},
         |${graft.operators.ConnectedComponents.oracleSql("lshpairs")},
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN components c ON d.doc_id = c.node)
         |SELECT doc_id, component,
         |  CASE WHEN ${Dedup.md5Hash32Sql(
            "CAST(component AS VARCHAR)", "sp:")} % 100 < 90
         |    THEN 'train' ELSE 'val' END AS split
         |FROM assigned ORDER BY doc_id""".stripMargin)),

    // Hard-negative mining for contrastive/embedding training: per
    // query, the k nearest vectors BELOW the positive threshold (the
    // negatives that actually move a contrastive loss; positives and
    // self are excluded before ranking). Exact brute form at the gate;
    // the IVF probe is the drop-in candidate generator at corpus scale.
    Q("ann_hard_negatives", (s, dir) => {
      Similarity.hardNegativesTopK(
          s.read.parquet(t(dir, "embeddings")),
          AnnQueries, AnnK, HardNegPosThreshold)
        .orderBy(col("qid"), col("rank"))
    }, Some(Similarity.hardNegativesTopKOracle(
      "embeddings", AnnQueries, AnnK, HardNegPosThreshold))),

    // Tar-shard publish manifest: documents hash to TarShards archives
    // by the engine-neutral md5 shard key, each shard written as a REAL
    // deterministic POSIX ustar file by TarShardSink, and the manifest
    // reports tar_bytes from the files ON DISK. The oracle recomputes
    // every column — including the exact archive byte size, via the
    // blocking-factor-1 closed form 1024 + Σ(512 + 512·ceil(len/512))
    // — from the input table alone, so the gate checks the writer's
    // actual output geometry, not its intentions.
    Q("corpus_tar_publish", (s, dir) => {
      import graft.sinks.TarShardSink
      val rows = docs(s, dir).select(
        (Dedup.md5Hash32(col("doc_id").cast("string"), "tar:")
          % TarShards).as("shard"),
        concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        col("text").cast("binary").as("data"))
      val out = java.nio.file.Files
        .createTempDirectory("tar_publish").toString
      TarShardSink.write(rows, out, TarShards).orderBy(col("shard"))
    }, Some(
      s"""WITH sh AS (
         |  SELECT ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "tar:")}
         |      % $TarShards AS shard,
         |    strlen(text) AS len
         |  FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_entries,
         |  CAST(sum(len) AS BIGINT) AS payload_bytes,
         |  CAST(1024 + sum(512 + 512 * ((len + 511) // 512)) AS BIGINT)
         |    AS tar_bytes
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin)),
  )
}
