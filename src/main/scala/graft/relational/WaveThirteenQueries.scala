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
  )
}
