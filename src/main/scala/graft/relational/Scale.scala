package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale levers that change the PLAN, not the RESULT — salting for skewed
  * keys and bucketed co-located joins. Outputs are defined to be identical
  * to the unsalted/unbucketed formulations, so the driver oracle checks
  * them against plain SQL.
  */
object Scale {

  /** Spread a narrow input across the cluster ONLY when it under-fills
    * it: CPU-heavy narrow stages (regex scoring, hashing, shingling)
    * inherit the input's split count, so a single-row-group test file
    * would run them on one core. A well-split production input passes
    * through untouched — an unconditional repartition would shuffle the
    * raw bodies for nothing (and even REDUCE parallelism when the input
    * has more splits than cores). */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Global row_number WITHOUT the single-partition window.
    *
    * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves every
    * row to one task (Spark even warns "No Partition Defined for Window
    * operation") — the canonical 100 TB non-starter. The scalable
    * formulation: range-repartition on the sort key (so partition i
    * holds globally-smaller rows than partition i+1), rank WITHIN each
    * partition, then add the partition's global offset (cumulative count
    * of earlier partitions — a tiny driver-side array, one count per
    * partition, broadcast back as a literal map).
    *
    * `sortCols` must be a TOTAL order (include a unique key): rows equal
    * on the sort key may straddle a range boundary, and only a total
    * order pins every row's rank to the same value the window form
    * produces. Output = input columns + `rn` (1-based, dense ordering by
    * sortCols). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    globalRowNumberCounted(df, sortCols)._1

  /** [[globalRowNumber]] plus the total row count — the count comes from
    * the per-partition offsets already sitting on the driver, so callers
    * that need N (ntile, percent_rank) don't pay a second job. */
  def globalRowNumberCounted(
      df: DataFrame, sortCols: Seq[Column]): (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts = math.max(2, spark.sparkContext.defaultParallelism)
    // persist the INPUT (lazily) before range partitioning:
    // repartitionByRange runs a sampling pass over its child, so an
    // expensive upstream (a groupBy, a join) would otherwise execute
    // twice — once to sample the bounds, once to shuffle. The sample
    // stage populates the cache and the shuffle stage reads it — no
    // extra job, upstream runs once; released right after the range
    // split is pinned.
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranged = pinned.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin the (sampled) range split: offsets and
                         // ranks below must see the SAME partitioning
    pinned.unpersist(blocking = false)
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val entries: Seq[Column] = // empty input still needs a valid map literal
      if (counts.isEmpty) Seq(lit(-1), lit(0L))
      else counts.map(_._1).zip(offsets).toSeq.flatMap { case (p, o) =>
        Seq(lit(p), lit(o)) }
    val offsetOf = map(entries: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val out = ranged
      .withColumn("rn",
        row_number().over(w).cast("long") + element_at(offsetOf, col("__pid")))
      .drop("__pid")
    (out, counts.map(_._2).sum)
  }

  /** Global running (prefix) sum WITHOUT the single-partition window.
    *
    * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` moves every
    * row through one task. Same offset discipline as
    * [[globalRowNumber]]: range-partition on the sort key, run the
    * running sum WITHIN each partition, and add the cumulative totals of
    * earlier partitions (one long per partition, collected to the driver
    * and broadcast back as a literal map).
    *
    * `sortCols` must be a total order; `valueCol` must be integral and
    * non-null (prefix sums only hash-match engines when exact — keep
    * values in integer domain). Output = input + `outName` (INCLUSIVE
    * prefix sum, cast long). */
  def globalRunningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: Column,
      outName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts = math.max(2, spark.sparkContext.defaultParallelism)
    val pinned = df.withColumn("__v", valueCol.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranged = pinned.repartitionByRange(nParts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin the sampled range split (see globalRowNumber)
    pinned.unpersist(blocking = false)
    val sums = ranged.groupBy(col("__pid")).agg(sum(col("__v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft(0L)(_ + _._2).init
    val entries: Seq[Column] =
      if (sums.isEmpty) Seq(lit(-1), lit(0L))
      else sums.map(_._1).zip(offsets).toSeq.flatMap { case (p, o) =>
        Seq(lit(p), lit(o)) }
    val offsetOf = map(entries: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(outName,
        sum(col("__v")).over(w) + element_at(offsetOf, col("__pid")))
      .drop("__pid", "__v")
  }

  /** PER-GROUP global running sum WITHOUT per-group single-task windows.
    *
    * `sum(v) OVER (PARTITION BY g ORDER BY ...)` funnels each group
    * through one task — fine when groups are many and small (the usual
    * case, and the form most queries here use), FATAL when a few giant
    * groups dominate (one user with a billion events). This is the
    * huge-group regime's lever: range-partition on (group, sortKey) so
    * each group occupies a contiguous partition span, run the running
    * sum within (partition, group), and close the cross-partition gap
    * with per-(partition, group) offsets — driver state is one row per
    * (partition, group-in-partition) pair, which in the few-huge-groups
    * regime is O(partitions), never O(rows).
    *
    * Regime guidance (both forms are result-identical): high-cardinality
    * small groups -> plain partitioned window (driver offsets would
    * scale with group count); low-cardinality huge groups -> this.
    *
    * `groupCol` values must not contain U+0001 (the offset-map key
    * separator). `sortCols` must totally order rows WITHIN each group;
    * `valueCol` must be integral and non-null. Output = input +
    * `outName` (inclusive per-group prefix sum, long). */
  def groupedRunningSum(
      df: DataFrame,
      groupCol: Column,
      sortCols: Seq[Column],
      valueCol: Column,
      outName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts = math.max(2, spark.sparkContext.defaultParallelism)
    val pinned = df.withColumn("__g", groupCol.cast("string"))
      .withColumn("__v", valueCol.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranged = pinned
      .repartitionByRange(nParts, col("__g") +: sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin the sampled range split (see globalRowNumber)
    pinned.unpersist(blocking = false)
    // per-(partition, group) totals -> per-group cumulative offsets in
    // partition order; one row per group-span on the driver
    val sums = ranged.groupBy(col("__pid"), col("__g"))
      .agg(sum(col("__v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets: Seq[(String, Long)] = sums
      .groupBy(_._2).toSeq
      .flatMap { case (g, rows) =>
        val ordered = rows.sortBy(_._1)
        val offs = ordered.map(_._3).scanLeft(0L)(_ + _).init
        ordered.map(_._1).zip(offs).map { case (pid, off) =>
          s"$pid\u0001$g" -> off
        }
      }
    val entries: Seq[Column] =
      if (offsets.isEmpty) Seq(lit("\u0001"), lit(0L))
      else offsets.flatMap { case (k, o) => Seq(lit(k), lit(o)) }
    val offsetOf = map(entries: _*)
    val w = Window.partitionBy(col("__pid"), col("__g"))
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(outName,
        sum(col("__v")).over(w) + element_at(offsetOf,
          concat(col("__pid").cast("string"), lit("\u0001"), col("__g"))))
      .drop("__pid", "__g", "__v")
  }

  /** PER-GROUP row numbers for the same few-giant-groups regime: a
    * per-group prefix count IS a per-group prefix sum of ones, so this
    * inherits [[groupedRunningSum]]'s whole offset discipline (and its
    * contracts: total order within group, U+0001-free group values).
    * Output = input + `outName` (1-based rank within group, long). */
  def groupedRowNumber(
      df: DataFrame,
      groupCol: Column,
      sortCols: Seq[Column],
      outName: String): DataFrame =
    groupedRunningSum(df, groupCol, sortCols, lit(1L), outName)

  /** The whole SQL ranking family — `rank`, `dense_rank`, `ntile(k)`,
    * `percent_rank` over a GLOBAL order — without any single-partition
    * window. `rank() OVER (ORDER BY v)` funnels every row through one
    * task; here everything derives from [[globalRowNumber]]'s
    * range-partitioned `rn`:
    *   - `rnk`  = min(rn) within the tie group (a window partitioned by
    *     the tie VALUE, so its width is the tie-group size, not N);
    *   - `drnk` = rn over the DISTINCT tie values, broadcast-joined back;
    *   - `ntl`  = SQL-standard ntile bucket arithmetic on rn (first
    *     N mod k buckets get ceil(N/k) rows) — pure per-row math;
    *   - `pct`  = (rnk - 1) / (N - 1), N from the driver-side offsets.
    * Results are DEFINED identical to the window forms given
    * (tie, tiebreak) is a total order — ntile consumes rows in exactly
    * that order on both paths.
    *
    * `tie` names the ranking value column; `tiebreak` must make
    * (tie, tiebreak) unique. Output = input columns + rn/rnk/drnk/ntl/pct.
    */
  def rankingFamily(
      df: DataFrame,
      tie: String,
      tieDesc: Boolean,
      tiebreak: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val tieCol = if (tieDesc) col(tie).desc else col(tie).asc
    val (ranked, n) = globalRowNumberCounted(df, Seq(tieCol, tiebreak))
    // everything group-level derives from ONE tie-level aggregate over
    // the pinned ranked rows (map-side combine shrinks it to one row per
    // distinct tie before the shuffle): rank = the group's min rn (ties
    // are contiguous in rn order), dense rank = the group's position in
    // the tie order — a second globalRowNumber over the tiny tie
    // relation, not over the full N rows
    val ties = ranked.groupBy(col(tie)).agg(min(col("rn")).as("rnk"))
    val (tieInfo, _) = globalRowNumberCounted(ties, Seq(tieCol))
    val dense = tieInfo.withColumnRenamed("rn", "drnk")
    // ntile: q full buckets of size q+1 come first (r = N mod k of them),
    // the rest hold q rows; the dead `otherwise` branch still evaluates
    // under ANSI when q = 0, so the divisor is clamped
    val q = n / nBuckets
    val r = n % nBuckets
    val ntl =
      when(col("rn") <= lit(r * (q + 1)),
        floor((col("rn") - 1) / lit((q + 1).toDouble)) + 1)
        .otherwise(lit(r) +
          floor((col("rn") - lit(r * (q + 1)) - 1) /
            lit(math.max(q, 1L).toDouble)) + 1)
    val pct =
      if (n <= 1) lit(0.0)
      else (col("rnk") - 1).cast("double") / lit((n - 1).toDouble)
    ranked
      // plain equi-join on the tie value: AQE broadcasts the tie
      // relation when it is small and falls back to a shuffle join when
      // the ranking value is near-unique (distinct ≈ N) — no size
      // assumption baked in
      .join(dense, Seq(tie))
      .withColumn("ntl", ntl.cast("long"))
      .withColumn("pct", pct)
  }

  /** Exact interpolated percentiles (SQL `percentile(v, p)` semantics,
    * Spark's own weighting formula replicated bit-for-bit) per group —
    * WITHOUT the per-group value buffer the builtin builds.
    *
    * The builtin exact `percentile`/`median` is an ObjectHashAggregate
    * whose state holds EVERY value of a group at once: correct, but the
    * buffer grows with row count — the 100 TB killer. This formulation
    * aggregates the (group, value) HISTOGRAM instead, so state is
    * bounded by DISTINCT values (fixed for integer/cents/quantity
    * domains no matter how many rows pass through), then brackets each
    * percentile by its global index range in the cumulative histogram:
    *
    *   k  = p * (n - 1)                    (fractional index)
    *   lo = the value whose [cumBefore, cumBefore+count) range holds
    *        floor(k);  hi = same for ceil(k)
    *   result = (ceil(k) - k) * lo + (k - floor(k)) * hi
    *
    * — the exact expression Percentile.getPercentile evaluates, so
    * outputs are DEFINED identical to the builtin (StatsAtScaleSpec pins
    * equality, the q_stats_aggs oracle hash-checks it against DuckDB's
    * quantile_cont). The cumulative window partitions by GROUP but runs
    * over the histogram — its width is the distinct-value count, never
    * the row count. Null VALUES are ignored (builtin behavior), but a
    * group whose values are ALL null is still emitted with a NULL
    * percentile — exactly what `percentile`/`median` return for it, so
    * the drop-in swap `base.join(pct, key)` loses no groups.
    *
    * Output: one row per group — `groupCol`, then one double column per
    * (name, p) requested. */
  def groupedExactPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      ps: Seq[(String, Double)]): DataFrame =
    groupedExactPercentiles(df, Seq(groupCol), valueCol, ps)

  /** Multi-column-group overload — e.g. (group, metric) after a `stack`
    * unpivot, which lets ONE scan and ONE histogram shuffle serve
    * percentiles over several source columns at once (q_stats_aggs). */
  def groupedExactPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty, "groupedExactPercentiles needs at least one (name, p)")
    require(ps.map(_._1).distinct.size == ps.size,
      s"percentile output names must be unique, got ${ps.map(_._1)}")
    val gcs = groupCols.map(col)
    // null VALUES stay in the histogram with ZERO weight (instead of a
    // pre-filter): they can never satisfy a bracket, but they keep a
    // group alive when ALL its values are null — such a group emits __n
    // = 0, no bracket matches, and the percentile comes out NULL, which
    // is exactly the builtin's answer for it. A filter would silently
    // drop the group from the output instead.
    val hist = df
      .groupBy(gcs :+ valueCol.cast("double").as("__v"): _*)
      .agg(sum(when(valueCol.isNotNull, 1L).otherwise(0L)).as("__c"))
    val w = Window.partitionBy(gcs: _*).orderBy(col("__v"))
    val cum = hist.withColumn("__hi", sum(col("__c")).over(w))
      .withColumn("__lo", col("__hi") - col("__c"))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(gcs: _*)))
    val aggs = ps.flatMap { case (name, p) =>
      val k = (col("__n") - 1).cast("double") * lit(p)
      Seq(
        max(when(col("__lo") <= floor(k) && floor(k) < col("__hi"),
          col("__v"))).as(s"__lo_$name"),
        max(when(col("__lo") <= ceil(k) && ceil(k) < col("__hi"),
          col("__v"))).as(s"__hi_$name"),
        max(k).as(s"__k_$name"))
    }
    val picked = cum.groupBy(gcs: _*).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(picked) { case (acc, (name, _)) =>
      val k = col(s"__k_$name")
      val lo = col(s"__lo_$name")
      val hi = col(s"__hi_$name")
      acc.withColumn(name,
          when(floor(k) === ceil(k), lo)
            .otherwise((ceil(k) - k) * lo + (k - floor(k)) * hi))
        .drop(s"__lo_$name", s"__hi_$name", s"__k_$name")
    }
  }

  /** Skew-safe equi-join: the fact side gets a deterministic (seeded)
    * random salt, the dim side is replicated once per salt value, and the
    * join key becomes (key, salt) — a hot key's rows spread over `nSalts`
    * reducers instead of one. Complements AQE's runtime skew splitting
    * when skew is known a priori; result set is exactly the plain join. */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      nSalts: Int = 8,
      seed: Long = 42L): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      (rand(seed) * nSalts).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * combine partials per key. For algebraic aggregates the result equals
    * the direct groupBy; the win is bounded per-reducer state under hot
    * keys. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      nSalts: Int = 8,
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * nSalts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(col(key))
      .agg(round(sum(col("__ps")), 2).as("total"), sum(col("__pc")).as("n"))
}
