package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q

/** Ninth-wave surface: incremental-consumer primitives over the
  * versioned table layer — the CDC read an ST3-style propagation job
  * replays at table scale instead of re-reading snapshots.
  */
object WaveNineQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Two deterministic snapshot derivations of `orders` (the fixture
    * for the CDC gate): v0 drops keys ≡3 (mod 10), v1 drops keys ≡7
    * and bumps price_cents by 100 on keys ≡0 (mod 4) — so the change
    * feed must contain inserts (≡3), deletes (≡7), and update
    * pre/post pairs (≡0 mod 4, minus the inserted/deleted residues). */
  private[relational] def snapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    val a = base.filter(col("o_orderkey") % 10 =!= 3)
    val b = base.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("price_cents", col("price_cents") +
        when(col("o_orderkey") % 4 === 0, 100L).otherwise(0L))
    (a, b)
  }

  val all: Seq[Q] = Seq(

    // Versioned-table CDC read: commit two derived snapshots of orders
    // into a scratch VersionedTable, then read the row-level change
    // feed between them through the REAL table layer (markers, time
    // travel, two-phase narrow-diff + broadcast-fetch plan). The
    // oracle is the direct full-outer join of the same two snapshot
    // derivations — the Spark side must reproduce it from disk.
    Q("table_changes", (s, dir) => {
      import graft.sinks.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("vt_changes").resolve("t").toString
      val (a, b) = snapshots(s, dir)
      val v0 = VersionedTable.commit(a, root)
      val v1 = VersionedTable.commit(b, root)
      VersionedTable.changes(s, root, v0, v1, Seq("o_orderkey"))
    }, Some(
      s"""WITH base AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         |  FROM orders),
         |a AS (SELECT * FROM base WHERE o_orderkey % 10 != 3),
         |b AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    price_cents + CASE WHEN o_orderkey % 4 = 0 THEN 100
         |      ELSE 0 END AS price_cents
         |  FROM base WHERE o_orderkey % 10 != 7),
         |j AS MATERIALIZED (
         |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         |    a.o_orderkey IS NULL AS ins,
         |    b.o_orderkey IS NULL AS del,
         |    a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL AND
         |      (a.o_custkey, a.o_orderstatus, a.price_cents)
         |        IS DISTINCT FROM
         |      (b.o_custkey, b.o_orderstatus, b.price_cents) AS upd,
         |    a.o_custkey AS a_ck, a.o_orderstatus AS a_st,
         |    a.price_cents AS a_pc,
         |    b.o_custkey AS b_ck, b.o_orderstatus AS b_st,
         |    b.price_cents AS b_pc
         |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         |SELECT k AS o_orderkey, a_ck AS o_custkey,
         |  a_st AS o_orderstatus, a_pc AS price_cents,
         |  'delete' AS change_type,
         |  CAST(0 AS BIGINT) AS v_from, CAST(1 AS BIGINT) AS v_to
         |FROM j WHERE del
         |UNION ALL
         |SELECT k, a_ck, a_st, a_pc, 'update_preimage',
         |  CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM j WHERE upd
         |UNION ALL
         |SELECT k, b_ck, b_st, b_pc, 'insert',
         |  CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM j WHERE ins
         |UNION ALL
         |SELECT k, b_ck, b_st, b_pc, 'update_postimage',
         |  CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM j WHERE upd""".stripMargin)),

    // The standing-query hybrid stream, ORACLE-GATED end to end: land
    // the corpus in three micro-batch files, drain them through the
    // REAL StandingSearchJob (checkpointed AvailableNow, persisted
    // postings/vector state, lens-anchored idempotence), and return
    // the standing result from state. The oracle is the BATCH fusion's
    // oracle over the full corpus — so the stream/batch equivalence
    // (and the index write/read round-trip) is pinned by the driver's
    // hash gate, not only by StandingSearchJobSpec.
    Q("search_rrf_standing", (s, dir) => {
      val terms = TrainingDataQueries.Bm25Terms
      val base = java.nio.file.Files
        .createTempDirectory("standing_q").toString
      val in = s"$base/in"
      // LEFT join: every document streams (lexical side needs the full
      // corpus stats); docs without a vector ride with a NULL embedding
      // exactly like the batch fusion's full-outer semantics
      val joined = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
        .join(s.read.parquet(t(dir, "embeddings"))
          .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          col("embedding").cast("array<double>").as("embedding"))
      for (m <- 0 until 3)
        joined.filter(col("doc_id") % 3 === m)
          .coalesce(1).write.mode("append").parquet(in)
      // one stream startup, three incremental drains (1 file/batch)
      graft.streaming.StandingSearchJob.runOnce(
        s, in, s"$base/store", s"$base/ckpt", terms,
        maxFilesPerTrigger = 1)
      graft.streaming.StandingSearchJob.results(s, s"$base/store")
    }, Some(graft.search.HybridSearch.rrfOracle("documents",
      "embeddings", TrainingDataQueries.Bm25Terms))),
  )
}
