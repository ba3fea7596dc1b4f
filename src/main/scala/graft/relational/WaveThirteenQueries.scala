package graft.relational

import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q

/** Thirteenth-wave surface: the self-maintainability frontier of the
  * materialized-view story, closed. Count/sum maintain by the pure
  * delta rule (`mv_incremental`); extrema need a bounded dirty-group
  * rescan and count-distinct needs an auxiliary view — both land here
  * composed through the REAL VersionedTable CDC read, each pinned
  * against a DuckDB recompute from the post-change snapshot.
  */
object WaveThirteenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Modulus for the distinct gate's value class: wide enough that
    * classes are informative, narrow enough that same-group collisions
    * exist at every SF (the case where a naive distinct-count delta
    * rule is wrong and the aux view is the fix). */
  val DistinctMod = 97L

  /** The shared v0/v1 oracle scaffold (WaveNine's snapshot
    * derivations: inserts ≡3, deletes ≡7 mod 10, +100 price updates
    * ≡0 mod 4). */
  private val snapshotCtes =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
       |  FROM orders),
       |b AS (
       |  SELECT o_orderkey, o_custkey,
       |    price_cents + CASE WHEN o_orderkey % 4 = 0 THEN 100
       |      ELSE 0 END AS price_cents
       |  FROM base WHERE o_orderkey % 10 != 7)""".stripMargin

  val all: Seq[Q] = Seq(

    // Extrema maintenance: min/max are NOT self-maintainable under
    // deletes (the runner-up to a removed extremum lives only in the
    // base), so maintainWithExtrema folds insert-side extrema for free
    // and recomputes ONLY the dirty groups — those a delete or update
    // preimage touched — from the post-change snapshot, restricted by
    // a delta-sized semi-join. The feed's deletes (≡7 mod 10) remove
    // real group maxima and its insert-only groups (≡3 arrivals) take
    // the fold path, so both regimes bind at every SF; the oracle is
    // the full recompute from the v1 derivation.
    Q("mv_incremental_minmax", (s, dir) => {
      import graft.sinks.{IncrementalView, VersionedTable}
      val root = java.nio.file.Files
        .createTempDirectory("vt_mm").resolve("t").toString
      val (a, b) = WaveNineQueries.snapshots(s, dir)
      val v0 = VersionedTable.commit(a, root)
      val v1 = VersionedTable.commit(b, root)
      val mv0 = VersionedTable.readVersion(s, root, v0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("sum_price"),
          min(col("price_cents")).as("min_price"),
          max(col("price_cents")).as("max_price"))
      val ch = VersionedTable.changes(s, root, v0, v1, Seq("o_orderkey"))
      IncrementalView.maintainWithExtrema(
          mv0, ch, VersionedTable.readVersion(s, root, v1),
          Seq("o_custkey"), "n_orders",
          Seq("price_cents" -> "sum_price"),
          Seq("price_cents" -> "min_price"),
          Seq("price_cents" -> "max_price"))
        .orderBy(col("o_custkey"))
    }, Some(
      s"""$snapshotCtes
         |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(price_cents) AS BIGINT) AS sum_price,
         |  min(price_cents) AS min_price, max(price_cents) AS max_price
         |FROM b GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Count-distinct maintenance: not self-maintainable directly (a
    // delete cannot tell you whether another row still carries the
    // value) — but the auxiliary view keyed (group, value) that counts
    // the rows BEHIND each value is, by the plain delta rule. The
    // distinct count is then a view-sized re-aggregation of live,
    // non-NULL aux rows. The +100 price updates move rows between
    // value classes (aux keys) via their pre/post pairs, and same-group
    // class collisions make the naive delta rule observably wrong —
    // the regime the aux view exists for.
    Q("mv_incremental_distinct", (s, dir) => {
      import graft.sinks.{IncrementalView, VersionedTable}
      val root = java.nio.file.Files
        .createTempDirectory("vt_nd").resolve("t").toString
      val (a, b) = WaveNineQueries.snapshots(s, dir)
      val cls = (df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("pclass", col("price_cents") % DistinctMod)
      val v0 = VersionedTable.commit(cls(a), root)
      val v1 = VersionedTable.commit(cls(b), root)
      val aux0 = VersionedTable.readVersion(s, root, v0)
        .groupBy(col("o_custkey"), col("pclass"))
        .agg(count(lit(1)).as("n_rows"))
      val ch = VersionedTable.changes(s, root, v0, v1, Seq("o_orderkey"))
      val aux1 = IncrementalView.maintainDistinctAux(
        aux0, ch, Seq("o_custkey"), "pclass")
      IncrementalView.distinctCounts(
          aux1, Seq("o_custkey"), "pclass", "nd")
        .orderBy(col("o_custkey"))
    }, Some(
      s"""$snapshotCtes
         |SELECT o_custkey,
         |  CAST(count(DISTINCT price_cents % $DistinctMod) AS BIGINT)
         |    AS nd
         |FROM b GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ...and the composition the two halves exist for: the extrema
    // summary is maintained INCREMENTALLY across the real CDC feed
    // (dirty-group rescan included), persisted, registered
    // rebuildMaintained — and then a min/max roll-up over the BASE
    // table is served from it transparently by the optimizer rule.
    // The user query never mentions the summary; the oracle recomputes
    // from the v1 derivation, and the PLANS capture shows the
    // summary-only plan. Registration is against a session-private
    // temp base copy (the mv_rewrite pattern — registry leak inert).
    Q("mv_rewrite_extrema_cdc", (s, dir) => {
      import graft.plans.SummaryRewrite
      import graft.plans.SummaryRewrite.MaterializedSummary
      import graft.sinks.{IncrementalView, VersionedTable}
      val tmp = java.nio.file.Files.createTempDirectory("mv_excdc")
      val root = tmp.resolve("t").toString
      val basePath = tmp.resolve("base").toString
      val sumPath = tmp.resolve("s").toString
      val (a, b) = WaveNineQueries.snapshots(s, dir)
      val v0 = VersionedTable.commit(a, root)
      val v1 = VersionedTable.commit(b, root)
      val mv0 = VersionedTable.readVersion(s, root, v0)
        .groupBy(col("o_custkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price_cents")).as("sum_price"),
          min(col("price_cents")).as("min_price"),
          max(col("price_cents")).as("max_price"))
      val ch = VersionedTable.changes(s, root, v0, v1, Seq("o_orderkey"))
      val snapV1 = VersionedTable.readVersion(s, root, v1)
      IncrementalView.maintainWithExtrema(
          mv0, ch, snapV1, Seq("o_custkey", "o_orderstatus"), "n",
          Seq("price_cents" -> "sum_price"),
          Seq("price_cents" -> "min_price"),
          Seq("price_cents" -> "max_price"))
        .write.parquet(sumPath)
      snapV1.write.parquet(basePath)
      SummaryRewrite.enable(s)
      SummaryRewrite.register(MaterializedSummary(basePath, sumPath,
        Seq("o_custkey", "o_orderstatus"),
        Map(("count", "*") -> "n", ("sum", "price_cents") -> "sum_price",
          ("min", "price_cents") -> "min_price",
          ("max", "price_cents") -> "max_price"),
        rebuildMaintained = true))
      s.read.parquet(basePath)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("price_cents")).as("min_price"),
          max(col("price_cents")).as("max_price"))
        .orderBy(col("o_orderstatus"))
    }, Some(
      s"""$snapshotCtes,
         |b2 AS (
         |  SELECT b.*, o.o_orderstatus FROM b
         |  JOIN orders o USING (o_orderkey))
         |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
         |  min(price_cents) AS min_price, max(price_cents) AS max_price
         |FROM b2 GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin)),

    // Epoch-repetition mixing: the UP-sampling half of a Dolma/LLaMA
    // mix recipe (corpus_mix's rates clamp at 1.0 by design). src0
    // repeats 2.5 epochs (two full copies + a deterministic half of
    // its docs a third time), src1 exactly once, the tail hash-samples
    // at 0.4 — full-copy, integral, and fractional regimes all bind.
    // Row-local: one sequence fan-out, no shuffle, copy_idx auditable.
    Q("corpus_mix_epochs", (s, dir) => {
      graft.analysis.CorpusMix.epochMix(
          s.read.parquet(t(dir, "documents")),
          "doc_id", "source",
          Map("src0" -> 2500000L, "src1" -> 1000000L),
          defaultPpm = 400000L)
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }, Some(
      graft.analysis.CorpusMix.epochMixSql("documents",
        "CASE source WHEN 'src0' THEN 2500000 WHEN 'src1' THEN 1000000" +
          " ELSE 400000 END") +
        "\nORDER BY doc_id, copy_idx")),

    // Epoch mixing COMPOSED INTO THE PUBLISH FUNNEL: the mix recipe's
    // repeated copies flow through sequence packing and deterministic
    // sharding, keyed (doc_id, copy_idx) — encoded as one packing key
    // sid = doc_id * 4 + copy_idx (bijective: the recipe's copies stay
    // under 4), so copies of a document pack ADJACENTLY and
    // deterministically, and a re-publish is byte-identical. The
    // manifest AUDITS the repetition: per packed sequence, `n_copies`
    // counts the rows that are epoch copies (copy_idx > 0), so the
    // shipped corpus discloses exactly where up-sampling landed. Scale
    // shape: the mix is row-local, packing is the bounded
    // per-group loop, sharding is one hash exchange — the funnel's
    // cost is the sum of its stages.
    Q("corpus_ship_epochs", (s, dir) => {
      import graft.analysis.{CorpusMix, SeqPack}
      import graft.dedup.Dedup
      val keyed = CorpusMix.epochMix(
          s.read.parquet(t(dir, "documents"))
            .select(col("doc_id"), col("source"), col("text")),
          "doc_id", "source",
          Map("src0" -> 2500000L, "src1" -> 1000000L),
          defaultPpm = 400000L)
        .select((col("doc_id") * 4 + col("copy_idx")).as("doc_id"),
          col("text"))
      val perDoc = SeqPack.packDocs(keyed, 256, 256)
      val seqs = perDoc.groupBy(col("grp"), col("seq_idx"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
          sum(when(col("doc_id") % 4 > 0, 1L).otherwise(0L))
            .as("n_copies"))
      // CorpusShard.assign's deterministic hash permutation, inlined
      // over the audited rollup (same engine-neutral primitive)
      val h = Dedup.md5Hash32(
        concat_ws(":", col("grp").cast("string"),
          col("seq_idx").cast("string")), "shard:")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("h"), col("grp"), col("seq_idx"))
      seqs.withColumn("h", h)
        .withColumn("shard", col("h") % 16)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("shard"), col("pos"), col("grp"), col("seq_idx"),
          col("n_docs"), col("n_tokens"), col("n_copies"))
        .orderBy(col("shard"), col("pos"))
    }, Some {
      import graft.dedup.Dedup
      s"""WITH RECURSIVE ep0 AS (
         |  SELECT doc_id, text,
         |    CASE source WHEN 'src0' THEN 2500000
         |      WHEN 'src1' THEN 1000000 ELSE 400000 END AS eps
         |  FROM documents),
         |epx AS (
         |  SELECT doc_id, text, eps,
         |    unnest(range(0, eps // 1000000 + 1)) AS copy_idx
         |  FROM ep0),
         |epk AS (
         |  SELECT doc_id * 4 + copy_idx AS sid, text FROM epx
         |  WHERE copy_idx < eps // 1000000
         |     OR ${Dedup.md5Hash32Sql("CAST(doc_id AS VARCHAR)", "ep:")}
         |       % 1000000 < eps % 1000000),
         |ep AS MATERIALIZED (SELECT sid AS doc_id, text FROM epk),
         |${graft.analysis.SeqPack.oracleCtes("ep", 256, 256)},
         |pd AS (
         |  SELECT p.grp, p.seq_idx, d.doc_id, p.tok
         |  FROM pk p JOIN docs_o d ON d.grp = p.grp AND d.rn = p.rn),
         |sq AS (
         |  SELECT grp, CAST(seq_idx AS BIGINT) AS seq_idx,
         |    count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_copies
         |  FROM pd GROUP BY grp, seq_idx),
         |shrd AS (
         |  SELECT h % 16 AS shard, h, grp, seq_idx, n_docs, n_tokens,
         |    n_copies
         |  FROM (SELECT *, ${Dedup.md5Hash32Sql(
               "(grp::VARCHAR || ':' || seq_idx::VARCHAR)", "shard:")} AS h
         |        FROM sq) __h)
         |SELECT shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY h, grp, seq_idx) AS BIGINT) AS pos,
         |  grp, seq_idx, n_docs, n_tokens, n_copies
         |FROM shrd ORDER BY shard, pos""".stripMargin
    }),
  )
}
