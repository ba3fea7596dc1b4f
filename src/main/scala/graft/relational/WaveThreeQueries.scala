package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.Q

/** Third-wave relational surface: exact distribution statistics, integer-
  * domain histograms, deterministic stratified sampling, gaps-and-islands,
  * semi-structured parsing, market-basket co-occurrence, and cumulative
  * distinct counting. Every entry carries a DuckDB oracle; float parity
  * follows the integer-domain and input-passthrough rules that kept the
  * first two waves hash-clean (see COVERAGE.md).
  */
object WaveThreeQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Seq[Q] = Seq(

    // exact (interpolated) per-group percentiles — percentile() is the
    // EXACT sort-based aggregate, not percentile_approx; quantities are
    // small integers so the interpolated values carry one decimal and
    // round(2) can never sit on a half boundary
    Q("q_percentiles_exact", (s, dir) => {
      Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(l_quantity, 0.5)"), 2).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 2).as("p90_qty"))
        .orderBy(col("l_returnflag"))
    }, Some(
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 2) AS p90_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // the AT-SCALE exact-percentile path, oracle-checked in its own
    // right: Scale.groupedExactPercentiles aggregates the (group, value)
    // HISTOGRAM (state bounded by distinct values) instead of the
    // builtin's per-group value buffer (state grows with row count — the
    // 100 TB killer). Same interpolation formula, so the same
    // quantile_cont oracle as q_stats_aggs hash-checks it. Quantities
    // are integers and quartile weights are exact binary fractions, so
    // round(2) cannot sit on a half boundary on either engine.
    Q("q_stats_at_scale", (s, dir) => {
      Scale.groupedExactPercentiles(
          Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem"))),
          "l_returnflag", col("l_quantity"),
          Seq("p25_qty" -> 0.25, "med_qty" -> 0.5, "p90_qty" -> 0.9))
        .select(col("l_returnflag"),
          round(col("p25_qty"), 2).as("p25_qty"),
          round(col("med_qty"), 2).as("med_qty"),
          round(col("p90_qty"), 2).as("p90_qty"))
        .orderBy(col("l_returnflag"))
    }, Some(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25_qty,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 2) AS p90_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // NTILE decile bands: equal-height buckets over a fully-deterministic
    // order (acctbal then custkey so duplicate balances cannot reshuffle
    // bucket edges across engines); min/max pass input doubles through
    // untouched (bit-identical on both sides — no arithmetic)
    Q("q_ntile_deciles", (s, dir) => {
      // NTILE without the single-partition window: global rank via the
      // scalable range+offset formulation, then NTILE's bucket rule as
      // pure arithmetic — with c rows and n buckets (q = c div n,
      // r = c mod n), the first r buckets hold q+1 rows. Result is
      // defined identical to ntile(10) OVER (ORDER BY ...), which is
      // what the oracle runs.
      val cust = s.read.parquet(t(dir, "customer"))
      val c = cust.count()
      val n = 10L
      val q = c / n
      val r = c % n
      Scale.globalRowNumber(cust, Seq(col("c_acctbal"), col("c_custkey")))
        .withColumn("decile",
          when(lit(q) === 0 || col("rn") <= lit(r * (q + 1)),
            (col("rn") - 1) / lit(q + 1) + 1)
            .otherwise(lit(r) + (col("rn") - lit(r * (q + 1)) - 1) / lit(q) + 1)
            .cast("int"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"),
          max(col("c_acctbal")).as("hi"))
        .orderBy(col("decile"))
    }, Some(
      """SELECT decile, count(*) AS n,
        |  min(c_acctbal) AS lo, max(c_acctbal) AS hi
        |FROM (SELECT c_acctbal,
        |        CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey)
        |             AS INTEGER) AS decile
        |      FROM customer)
        |GROUP BY decile ORDER BY decile""".stripMargin)),

    // equi-width histogram in pure integer domain: bucket edges computed
    // on exact cents via integer division (25000.00-wide buckets), so no
    // float division can flip a boundary row on either engine
    Q("q_price_histogram", (s, dir) => {
      s.read.parquet(t(dir, "orders"))
        .withColumn("bucket",
          expr("cast(round(o_totalprice * 100) as bigint) div 2500000"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("first_key"),
          max(col("o_orderkey")).as("last_key"))
        .orderBy(col("bucket"))
    }, Some(
      """SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2500000
        |    AS bucket,
        |  count(*) AS n,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // deterministic stratified sampling: per-stratum rates applied via a
    // content hash of the key (reproducible across engines, retries, and
    // cluster sizes — same discipline as q_hash_sample, per-group rates);
    // sampled rows carry input doubles through untouched
    Q("q_stratified_sample", (s, dir) => {
      s.read.parquet(t(dir, "customer"))
        .withColumn("h",
          expr("conv(substring(md5(cast(c_custkey as string)), 1, 8), " +
            "16, 10) % 100"))
        .filter(
          when(col("c_mktsegment") === "BUILDING", col("h") < 20)
            .otherwise(col("h") < 5))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }, Some(
      """SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM (SELECT *,
        |        ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
        |          ::BIGINT % 100 AS h
        |      FROM customer)
        |WHERE CASE WHEN c_mktsegment = 'BUILDING' THEN h < 20
        |           ELSE h < 5 END
        |ORDER BY c_custkey""".stripMargin)),

    // deterministic FIXED-SIZE sample per group: md5-priority ranking
    // inside each stratum (window is PARTITIONED — scales), exactly k
    // rows per segment, reproducible across engines/retries/cluster
    // sizes. Complements the fraction-based q_stratified_sample.
    Q("q_fixed_sample", (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("h"), col("c_custkey"))
      s.read.parquet(t(dir, "customer"))
        .withColumn("h",
          expr("cast(conv(substring(md5(concat('fs:', " +
            "cast(c_custkey as string))), 1, 8), 16, 10) as bigint)"))
        .withColumn("pick", row_number().over(w))
        .filter(col("pick") <= 50)
        .select(col("c_mktsegment"), col("pick").as("pick"),
          col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("pick"))
    }, Some(
      """SELECT c_mktsegment, CAST(pick AS INTEGER) AS pick,
        |  c_custkey, c_acctbal
        |FROM (SELECT *,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY ('0x' || substr(md5('fs:' ||
        |            CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT,
        |          c_custkey) AS pick
        |      FROM customer)
        |WHERE pick <= 50 ORDER BY c_mktsegment, pick""".stripMargin)),

    // gaps-and-islands over the orderkey sequence: runs of consecutive
    // keys collapse via the classic key - row_number() group label; pure
    // integer arithmetic end to end
    Q("q_key_islands", (s, dir) => {
      Scale.globalRowNumber(
          s.read.parquet(t(dir, "orders"))
            .filter(col("o_orderkey") <= 20000)
            .select(col("o_orderkey")),
          Seq(col("o_orderkey")))
        .withColumn("grp", col("o_orderkey") - col("rn"))
        .drop("rn")
        .groupBy(col("grp"))
        .agg(min(col("o_orderkey")).as("island_start"),
          max(col("o_orderkey")).as("island_end"),
          count(lit(1)).as("island_len"))
        .drop("grp")
        .orderBy(col("island_start"))
    }, Some(
      """SELECT min(o_orderkey) AS island_start,
        |  max(o_orderkey) AS island_end, count(*) AS island_len
        |FROM (SELECT o_orderkey,
        |        o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS grp
        |      FROM orders WHERE o_orderkey <= 20000)
        |GROUP BY grp ORDER BY island_start""".stripMargin)),

    // semi-structured payload parsing: JSON props field extracted and
    // aggregated in integer domain (the declared-schema from_json path is
    // exercised by json_boundary; this is the ad-hoc extraction path)
    Q("q_props_parse", (s, dir) => {
      StreamingQueries.events(s, dir)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }, Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(json_extract_string(props, '$.k')::INTEGER) AS BIGINT)
        |    AS sum_k,
        |  min(json_extract_string(props, '$.k')::INTEGER) AS min_k,
        |  max(json_extract_string(props, '$.k')::INTEGER) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // market-basket pair co-occurrence. The Spark plan deliberately does
    // NOT self-join: one groupBy(orderkey) collects each order's distinct
    // parts and the pair fan-out happens map-side from the sorted array —
    // one shuffle total, versus a self-join's two shuffle-scans of
    // lineitem plus a potentially skewed join. Order sizes are bounded
    // (TPC-H ~7 lines), so the quadratic fan-out is per-row constant.
    // Full (n desc, pa, pb) tiebreak keeps the top-20 engine-neutral.
    Q("q_pair_cooccur", (s, dir) => {
      // the pair rides as ONE fused long (pa in the high 32 bits —
      // partkeys are < 2^31), not a (pa, pb) struct: the pair relation
      // is ~unique-keyed (map-side combine can't shrink it), so the
      // fan-out exchange + hash aggregate carry 8-byte keys instead of
      // 16 and hash/compare one word. Since pa is the high word,
      // ORDER BY (n DESC, pk) == ORDER BY (n DESC, pa, pb); the pair
      // decodes back AFTER the top-20.
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")) > 1)
        .select(explode(expr(
          """flatten(transform(sequence(1, size(ps) - 1),
            |  i -> transform(slice(ps, i + 1, size(ps) - i),
            |       j -> element_at(ps, i) * 4294967296 + j)))"""
            .stripMargin)).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pk"))
        .limit(20)
        .select(shiftright(col("pk"), 32).as("pa"),
          col("pk").bitwiseAND(lit(4294967295L)).as("pb"), col("n"))
    }, Some(
      """SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 ORDER BY n DESC, pa, pb LIMIT 20""".stripMargin)),

    // Bloom-filter semi-join reduction: the dim side builds a compact
    // bloom filter that pre-filters the fact scan BEFORE the shuffle —
    // at scale this is the difference between shuffling every fact row
    // and shuffling ~|matching| + fpp. False positives pass the filter
    // and are dropped by the exact join that follows, so the result is
    // DEFINED identical to the plain join (which is what the oracle
    // runs). Same discipline as Spark's own runtime row-level filtering,
    // made explicit and testable.
    Q("q_bloom_join", (s, dir) => {
      val dim = s.read.parquet(t(dir, "customer"))
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bf = dim.stat.bloomFilter("c_custkey", 100000, 0.01)
      s.read.parquet(t(dir, "orders"))
        .filter(graft.functions.BloomMightContain
          .bloom_might_contain_long(col("o_custkey"), bf))
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)"))
            .as("total_cents"))
        .orderBy(col("o_orderpriority"))
    }, Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // global ranking WITHOUT the single-partition window: range
    // repartition + within-partition rank + partition offsets
    // (Scale.globalRowNumber). Result defined identical to plain
    // row_number() OVER (ORDER BY ...), which is exactly what the oracle
    // runs — the scale lever discipline of q_salted_join/q_salted_agg.
    Q("q_global_rank", (s, dir) => {
      Scale.globalRowNumber(
          s.read.parquet(t(dir, "customer"))
            .select(col("c_custkey"), col("c_acctbal")),
          Seq(col("c_acctbal").desc, col("c_custkey")))
        .filter(col("rn") <= 500)
        .select(col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("rn"))
    }, Some(
      """SELECT CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
        |       AS BIGINT) AS rn,
        |  c_custkey, c_acctbal
        |FROM customer
        |QUALIFY rn <= 500 ORDER BY rn""".stripMargin)),

    // cumulative distinct users by day: first-seen reduction then a
    // running sum — the scalable form of COUNT(DISTINCT) OVER (ORDER BY
    // day), which Spark rejects and which would hold the full user set
    // per frame anyway; integers and dates only
    Q("q_cumulative_users", (s, dir) => {
      val firstSeen = StreamingQueries.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
      firstSeen
        .groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          // a partitionless window is DELIBERATE here: its input is one
          // row per DAY (bounded — decades fit in thousands of rows no
          // matter the fact-table size), so the single task holds a
          // trivially small series; the unbounded-cardinality work
          // (distinct users) already collapsed in the groupBys above
          sum(col("new_users")).over(
            Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("day"))
    }, Some(
      """WITH fs AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1)
        |SELECT day, count(*) AS new_users,
        |  CAST(sum(count(*)) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM fs GROUP BY day ORDER BY day""".stripMargin)),

    // MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    // Spark built-ins) — the approximate-analytics workhorse at 100 TB,
    // where partial sketches from every partition/day union into
    // register-wise maxima (no re-scan). The sketch bytes are
    // engine-specific, so the oracle pins what IS engine-neutral: the
    // exact distinct count, a bounded-error CLAIM (HLL lgK=12 carries
    // ~1.6% relative standard error; 5% is many sigma), and the
    // PARTITION-INDEPENDENCE claim: unioning sub-sketches built under
    // two DIFFERENT groupings yields bit-equal estimates, because union
    // register state is the item-wise maximum regardless of how rows
    // were split. REGIME CONSTRAINT (r8): that argument needs DENSE
    // HLL-mode inputs — union marks them out-of-order and answers with
    // the register-only composite estimator. Coupon/SET-mode inputs
    // keep the HIP estimator through the merge, and HIP is PATH-
    // dependent when promotion to HLL happens mid-union (observed at
    // sf0.001: ~1100 distinct sits on the lgK=12 promotion boundary
    // and 2-way vs 7-way merges answered 1073 vs 1079). The merge-
    // consistency pair therefore runs at lgK=4 (16 registers: dense at
    // every SF's subgroup cardinality); the accuracy claim keeps
    // lgK=12. (Union-vs-direct is deliberately NOT the claim: a direct
    // sketch answers with HIP, which any union invalidates.)
    Q("q_hll_sketch", (s, dir) => {
      val li = Scale.spreadIfNarrow(s.read.parquet(t(dir, "lineitem")))
      val direct = li.groupBy(col("l_returnflag"))
        .agg(
          expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("est"),
          countDistinct(col("l_orderkey")).as("exact_distinct"))
      def unionEst(subKey: org.apache.spark.sql.Column, name: String) =
        li.groupBy(col("l_returnflag"), subKey.as("__sub"))
          .agg(expr("hll_sketch_agg(l_orderkey, 4)").as("sk"))
          .groupBy(col("l_returnflag"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as(name))
      val m1 = unionEst(col("l_linestatus"), "est_m1")
      val m2 = unionEst(col("l_suppkey") % 7, "est_m2")
      direct.join(m1, Seq("l_returnflag")).join(m2, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_distinct"),
          (abs(col("est") - col("exact_distinct"))
            <= col("exact_distinct") * 0.05).as("within_5pct"),
          (col("est_m1") === col("est_m2")).as("merge_consistent"))
        .orderBy(col("l_returnflag"))
    }, Some(
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_distinct,
        |  true AS within_5pct,
        |  true AS merge_consistent
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // THETA sketches (DataSketches) — the set-operation sketch family
    // HLL cannot provide: union AND intersection AND difference. The
    // audience-overlap question (customers with open vs fulfilled
    // orders) answered from two mergeable sketches; below the 2^16
    // nominal-entry budget theta is EXACT, so all five outputs
    // hash-check as integers against DuckDB's exact set algebra (the
    // 100 TB regime degrades to the published bounded error —
    // ThetaSketchSpec pins that). Partials per partition + distributed
    // union merge: the shuffle carries sketch bytes, never keys; the
    // one collected row per side is model-sized.
    Q("q_theta_sketch", (s, dir) => {
      import s.implicits._
      import graft.functions.ThetaSketchOps
      val o = Scale.spreadIfNarrow(s.read.parquet(t(dir, "orders")))
      def keys(status: String) =
        o.filter(col("o_orderstatus") === status)
          .select(col("o_custkey")).as[Long]
      val skA = ThetaSketchOps.sketch(keys("O"))
      val skB = ThetaSketchOps.sketch(keys("F"))
      val (un, in, anb) = ThetaSketchOps.setOps(skA, skB)
      Seq((
        Math.round(ThetaSketchOps.estimate(skA)),
        Math.round(ThetaSketchOps.estimate(skB)),
        Math.round(un), Math.round(in), Math.round(anb)))
        .toDF("a_distinct", "b_distinct", "union_distinct",
          "inter_distinct", "anotb_distinct")
    }, Some(
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderstatus = 'O'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderstatus = 'F')
        |SELECT
        |  (SELECT count(*) FROM a) AS a_distinct,
        |  (SELECT count(*) FROM b) AS b_distinct,
        |  (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b) u)
        |    AS union_distinct,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) i)
        |    AS inter_distinct,
        |  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) d)
        |    AS anotb_distinct""".stripMargin)))
}
