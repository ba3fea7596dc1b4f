package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  * [[maintain]] handles count + integer sums ONLY — min/max are NOT
  * self-maintainable under deletes (removing the current extremum
  * needs a group rescan the delta rule never performs). They ARE
  * maintainable with a bounded rescan: [[maintainWithExtrema]] folds
  * insert-side extrema for free and recomputes extrema from the base
  * table for exactly the DIRTY groups (those a delete or update
  * preimage touched) — cost O(facts of dirty groups), never a full
  * rescan. That partial rebuild satisfies the `rebuildMaintained`
  * declaration [[graft.plans.SummaryRewrite.register]] demands before
  * routing min/max to a summary. Count-distinct is likewise not
  * self-maintainable directly but becomes so through an auxiliary
  * view that is — see [[maintainDistinctAux]].
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
    *                  sources must be non-null integral (exact deltas).
    *                  Integrality is ENFORCED (require below);
    *                  non-nullness stays the producer's contract — a
    *                  NULL source row contributes no sum delta (sum
    *                  skips NULLs) while still moving the count, the
    *                  same divergence sum(x) itself has, so maintain
    *                  nullable sums only via a rebuild-maintained
    *                  summary
    * @param cntCols   (source column in feed, count column in view):
    *                  maintained per-column NON-NULL counts (`count(x)`
    *                  semantics — a NULL source row moves no count).
    *                  Self-maintainable like count(*), and what
    *                  licenses [[graft.plans.SummaryRewrite]]'s avg
    *                  decomposition on a CDC-maintained summary — note
    *                  the pair is only maintainable for NON-NULL
    *                  sources (sumCols requires them; a nullable
    *                  column's count maintains here, but its sum — and
    *                  therefore its avg — needs a rebuild-maintained
    *                  summary)
    */
  def maintain(
      mv: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)],
      cntCols: Seq[(String, String)] = Nil): DataFrame = {
    // the delta rule is exact only in exact arithmetic: a double-typed
    // sum source would accumulate floating drift across deltas (each
    // +x then -x round-trip can leave a residue), silently diverging
    // from a recompute. ENFORCED, not just documented — keep money in
    // integer cents (the engine-wide discipline) or maintain the
    // summary by rebuild instead. DecimalType is excluded on different
    // grounds: decimal arithmetic is exact (no drift), but Spark
    // widens sum(decimal(p, s)) to decimal(p+10, s), so a maintained
    // decimal sum would drift the view SCHEMA across maintenance
    // generations (seed vs v1 vs vN types diverge) — the integer-cents
    // policy sidesteps both problems with one encoding.
    val integral: Set[DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    sumCols.foreach { case (src, out) =>
      val t = changes.schema(src).dataType
      require(integral.contains(t),
        s"maintain: sum source '$src' is ${t.simpleString} — non-" +
          "integral sums accumulate floating drift across deltas; use " +
          "an exact integer encoding (e.g. decimal cents as BIGINT) " +
          "or refresh this summary by rebuild")
      mv.schema.find(_.name == out).foreach { f =>
        require(integral.contains(f.dataType),
          s"maintain: view sum column '$out' is ${f.dataType.simpleString}" +
            " — the maintained sum must stay integral (exact) end to end")
      }
    }
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

  /** [[maintain]] extended with min/max columns — the delta rule where
    * it is exact, a DIRTY-GROUP rescan where it cannot be.
    *
    * Extrema are self-maintainable under INSERTS alone (the new
    * extremum is the fold of the old one with the arriving rows'), but
    * a delete may remove the current extremum, and only the base table
    * knows what the runner-up was. So groups split three ways:
    *  - untouched: extrema pass through from the view;
    *  - insert-only touched: `least`/`greatest` of the old value and
    *    the arriving rows' extremum (both sides NULL-skipping, matching
    *    min/max semantics);
    *  - DIRTY (any delete or update preimage): extrema recomputed from
    *    `base` — the post-change snapshot — restricted to the dirty
    *    keys by a semi-join. The dirty set is delta-sized, so the
    *    rescan reads O(facts of dirty groups): with the base
    *    partitioned or bucketed on the group key this is the classic
    *    dirty-partition rescan, never a 100 TB pass.
    *
    * Counts and sums go through [[maintain]] unchanged and define which
    * groups survive. A surviving group whose values are all NULL keeps
    * NULL extrema, exactly as min/max over the base would.
    *
    * @param base  CURRENT (post-change) base table carrying `groupCols`
    *              and every min/max source column; read ONLY for dirty
    *              groups
    */
  def maintainWithExtrema(
      mv: DataFrame,
      changes: DataFrame,
      base: DataFrame,
      groupCols: Seq[String],
      countName: String,
      sumCols: Seq[(String, String)],
      minCols: Seq[(String, String)],
      maxCols: Seq[(String, String)],
      cntCols: Seq[(String, String)] = Nil): DataFrame = {
    val exCols = minCols ++ maxCols
    require(exCols.nonEmpty,
      "maintainWithExtrema without extrema columns — use maintain()")
    val rExprs =
      minCols.map { case (src, out) => min(col(src)).as(s"__r_$out") } ++
        maxCols.map { case (src, out) => max(col(src)).as(s"__r_$out") }
    val counts = maintain(
      mv.drop(exCols.map(_._2): _*), changes, groupCols,
      countName, sumCols, cntCols)

    // one delta pass: per-group dirty flag + insert-side extrema
    // (keys renamed so the three left joins below stay unambiguous)
    val deltaEx = changes
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__sign") < 0, 1).otherwise(0)).as("__dirty"),
        (minCols.map { case (src, out) =>
          min(when(col("__sign") > 0, col(src))).as(s"__i_$out")
        } ++ maxCols.map { case (src, out) =>
          max(when(col("__sign") > 0, col(src))).as(s"__i_$out")
        }): _*)
      .withColumnsRenamed(groupCols.map(g => g -> s"__dk_$g").toMap)

    // dirty keys are delta-sized; the base reads only their facts
    val dirtyKeys = deltaEx.filter(col("__dirty") === 1)
      .select(groupCols.map(g => col(s"__dk_$g")): _*)
    val recomputed = base
      .join(dirtyKeys,
        groupCols.map(g => base(g) <=> dirtyKeys(s"__dk_$g"))
          .reduce(_ && _),
        "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(rExprs.head, rExprs.tail: _*)
      .withColumnsRenamed(groupCols.map(g => g -> s"__rk_$g").toMap)

    val oldEx = mv.select(
      groupCols.map(g => col(g).as(s"__ok_$g")) ++
        exCols.map { case (_, out) => col(out).as(s"__old_$out") }: _*)

    val joined = counts
      .join(oldEx,
        groupCols.map(g => col(g) <=> col(s"__ok_$g")).reduce(_ && _),
        "left")
      .join(deltaEx,
        groupCols.map(g => col(g) <=> col(s"__dk_$g")).reduce(_ && _),
        "left")
      .join(recomputed,
        groupCols.map(g => col(g) <=> col(s"__rk_$g")).reduce(_ && _),
        "left")

    val passThrough =
      (groupCols ++ (countName +: (sumCols ++ cntCols).map(_._2))).map(col)
    val extrema = minCols.map { case (_, out) =>
      when(col("__dirty") === 1, col(s"__r_$out"))
        .otherwise(least(col(s"__old_$out"), col(s"__i_$out"))).as(out)
    } ++ maxCols.map { case (_, out) =>
      when(col("__dirty") === 1, col(s"__r_$out"))
        .otherwise(greatest(col(s"__old_$out"), col(s"__i_$out"))).as(out)
    }
    joined.select(passThrough ++ extrema: _*)
  }

  /** Count-distinct through the auxiliary view that IS
    * self-maintainable: `aux` keys (groupCols, valueCol) and counts the
    * rows behind each distinct value, so it maintains with the plain
    * delta rule — this call is literally [[maintain]] with the value
    * column adjoined to the key. Values die with their last row (the
    * count>0 filter), values are born from the delta side, and an
    * update that CHANGES the value moves its row between aux keys via
    * the pre/post pair. [[distinctCounts]] then derives
    * `count(distinct valueCol)` per group as a view-sized
    * re-aggregation — the fact table never rescans, which is the whole
    * point: count(distinct) itself is not self-maintainable (a delete
    * cannot tell you whether another row still carries the value), but
    * the aux view remembers exactly that. */
  def maintainDistinctAux(
      aux: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      countName: String = "n_rows"): DataFrame =
    maintain(aux, changes, groupCols :+ valueCol, countName, Nil)

  /** Derive per-group distinct counts from a [[maintainDistinctAux]]
    * view. NULL values are excluded, matching `count(distinct x)`. */
  def distinctCounts(
      aux: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outName: String): DataFrame =
    aux.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(outName))
}
