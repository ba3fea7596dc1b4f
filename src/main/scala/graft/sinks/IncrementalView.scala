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
    * @param mv        current view: `groupCols` ++ (`countName`, sum outputs)
    * @param changes   CDC feed carrying `groupCols` and every sum source
    * @param groupCols grouping key of the view
    * @param countName maintained `count(*)` column name in `mv`
    * @param sumCols   (source column in feed, sum column in view); sum
    *                  sources must be non-null integral (exact deltas)
    */
  def maintain(
      mv: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)]): DataFrame = {
    val keys = groupCols.map(col)
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(keys: _*)
      .agg(
        sum(col("__sign")).as("__dcnt"),
        sumCols.map { case (src, out) =>
          sum(col(src) * col("__sign")).as(s"__d_$out")
        }: _*)
    // keyed full-outer: brand-new groups arrive from the delta side,
    // untouched groups pass through from the view side. Both sides are
    // view-/delta-sized — never fact-sized.
    val joined = mv.join(delta, groupCols, "full_outer")
    val maintainedCnt =
      coalesce(col(countName), lit(0L)) + coalesce(col("__dcnt"), lit(0L))
    val maintainedSums = sumCols.map { case (_, out) =>
      (coalesce(col(out), lit(0L)) + coalesce(col(s"__d_$out"), lit(0L)))
        .as(out)
    }
    joined
      .select(keys ++ (maintainedCnt.as(countName) +: maintainedSums): _*)
      .filter(col(countName) > 0)
  }
}
