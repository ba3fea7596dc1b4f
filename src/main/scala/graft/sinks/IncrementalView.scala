package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a CDC change feed.
  *
  * The 100 TB shape: a keyed aggregate (count + integer sums per group)
  * is maintained by APPLYING the row-level change feed between two table
  * versions ([[VersionedTable.changes]]) instead of re-aggregating the
  * new snapshot — the classic delta rule for self-maintainable
  * aggregates (count/sum are self-maintainable under inserts, deletes
  * and update pre/post pairs; no base-table rescan, ever). Cost is
  * O(|delta| + |view|): the feed aggregates map-side to per-group
  * deltas, then one keyed full-outer join against the view — the fact
  * table's 100 TB never moves. Groups whose maintained count reaches
  * zero leave the view (the count IS the liveness witness, which is why
  * self-maintainability needs it even when the consumer only wants the
  * sums). Update rows that MOVE a row between groups maintain both
  * sides for free: the preimage decrements its old group, the postimage
  * increments the new one.
  *
  * Maintained aggregates are count + integer sums ONLY — min/max are
  * deliberately absent because they are NOT self-maintainable under
  * deletes (removing the current extremum needs a group rescan the
  * delta rule never performs). A summary carrying extrema must be
  * recomputed on refresh, and [[graft.plans.SummaryRewrite.register]]
  * enforces that declaration (`rebuildMaintained`) before it will
  * route min/max to one.
  *
  * Deployment note: persist the maintained view with
  * [[VersionedTable.merge]] keyed on the group columns — the delta
  * output here is exactly merge's upsert input.
  *
  * Reference behavior anchor: the reference pipeline recomputes its
  * validity/notification state from full snapshots each run
  * (update_validity.py); this is the incremental-consumer form of the
  * same state next to the CDC read it composes with.
  */
object IncrementalView {

  /** +1 for rows entering the group, -1 for rows leaving it. An
    * unrecognized change_type fails the job loudly — a CDC consumer
    * that silently drops feed rows it doesn't understand corrupts the
    * view without a trace (the requireExact discipline). */
  private def sign: Column =
    when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(
        lit("IncrementalView: unknown change_type '"),
        col("change_type"), lit("'"))).cast("long"))

  /** Apply `changes` (a [[VersionedTable.changes]]-shaped feed: value
    * columns + `change_type`) to the maintained view `mv`.
    *
    * @param mv        current view: `groupCols` ++ (`countName`, sum and
    *                  count outputs)
    * @param changes   CDC feed carrying `groupCols` and every sum/count
    *                  source
    * @param groupCols grouping key of the view
    * @param countName maintained `count(*)` column name in `mv`
    * @param sumCols   (source column in feed, sum column in view); sum
    *                  sources must be non-null integral (exact deltas)
    * @param cntCols   (source column in feed, count column in view):
    *                  maintained per-column NON-NULL counts (`count(x)`
    *                  semantics — a NULL source row moves no count).
    *                  Self-maintainable like count(*), and exactly what
    *                  licenses [[graft.plans.SummaryRewrite]]'s avg
    *                  decomposition on a CDC-maintained summary
    */
  def maintain(
      mv: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)],
      cntCols: Seq[(String, String)] = Nil): DataFrame = {
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__sign")).as("__dcnt"),
        (sumCols.map { case (src, out) =>
          sum(col(src) * col("__sign")).as(s"__d_$out")
        } ++ cntCols.map { case (src, out) =>
          sum(when(col(src).isNotNull, col("__sign")).otherwise(0L))
            .as(s"__d_$out")
        }): _*)
    // keyed full-outer: brand-new groups arrive from the delta side,
    // untouched groups pass through from the view side. Both sides are
    // view-/delta-sized — never fact-sized. NULL-SAFE key equality
    // (<=>): a NULL group key is a legal GROUP BY group, and a plain
    // equi-join would never match its view row to its delta row —
    // yielding a stale view row PLUS a delta-only row, a silent
    // divergence from agg(v1).
    val joined = mv.as("__mv").join(delta.as("__d"),
      groupCols.map(g => col(s"__mv.$g") <=> col(s"__d.$g"))
        .reduce(_ && _),
      "full_outer")
    // per key: whichever side is PRESENT carries the group's value
    // (both NULL only when the group key itself is NULL on the present
    // side — in which case both agree)
    val keys = groupCols.map(g =>
      when(col("__dcnt").isNull, col(s"__mv.$g"))
        .otherwise(col(s"__d.$g")).as(g))
    val maintainedCnt =
      coalesce(col(countName), lit(0L)) + coalesce(col("__dcnt"), lit(0L))
    val maintainedSums = (sumCols ++ cntCols).map { case (_, out) =>
      (coalesce(col(out), lit(0L)) + coalesce(col(s"__d_$out"), lit(0L)))
        .as(out)
    }
    joined
      .select(keys ++ (maintainedCnt.as(countName) +: maintainedSums): _*)
      .filter(col(countName) > 0)
  }
}
