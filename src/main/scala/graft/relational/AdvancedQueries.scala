package graft.relational

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.relational.RelationalQueries.Q

/** Second-wave relational surface: SCD2 interval construction, unpivot
  * (melt), deterministic hash sampling, and lateral per-group top-k —
  * shapes a production warehouse/pipeline needs beyond the classic TPC-H
  * queries. Every entry carries a DuckDB oracle.
  */
object AdvancedQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  val all: Seq[Q] = Seq(
    // SCD2 (slowly-changing-dimension) history: each customer's order
    // status timeline as half-open validity intervals [from, to) with a
    // current-row flag — one window pass, no self-join
    Q("scd2_intervals", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      s.read.parquet(t(dir, "orders"))
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_from", col("o_orderdate"))
        // open intervals close at the conventional SCD2 high-date (also
        // keeps the compare null-free: NaT != NaT under pandas)
        .withColumn("valid_to",
          coalesce(lead(col("o_orderdate"), 1).over(w),
            to_date(lit("9999-12-31"))))
        .withColumn("is_current", col("valid_to") === to_date(lit("9999-12-31")))
        .select(col("o_custkey"), col("version"), col("o_orderkey"),
          col("o_orderstatus"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .orderBy(col("o_custkey"), col("version"))
    }, Some(
      """SELECT o_custkey,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  o_orderkey, o_orderstatus,
        |  o_orderdate AS valid_from,
        |  coalesce(lead(o_orderdate, 1) OVER w, DATE '9999-12-31') AS valid_to,
        |  coalesce(lead(o_orderdate, 1) OVER w, DATE '9999-12-31')
        |    = DATE '9999-12-31' AS is_current
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin)),

    // unpivot (melt): order counts pivoted wide by status, melted back to
    // (priority, status, n) — the Dataset.unpivot API surface
    Q("q_unpivot", (s, dir) => {
      val wide = s.read.parquet(t(dir, "orders"))
        .groupBy(col("o_orderpriority"))
        .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")),
          "status", "n_orders")
        .orderBy(col("o_orderpriority"), col("status"))
    }, Some(
      """SELECT p.o_orderpriority, st.status,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        |FROM (SELECT DISTINCT o_orderpriority FROM orders) p
        |CROSS JOIN (VALUES ('F'), ('O'), ('P')) st(status)
        |LEFT JOIN (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |  FROM orders GROUP BY 1, 2) c
        |  ON c.o_orderpriority = p.o_orderpriority
        | AND c.o_orderstatus = st.status
        |ORDER BY p.o_orderpriority, st.status""".stripMargin)),

    // deterministic ~10% sample: md5-bucket on the row key instead of an
    // RNG — reproducible across engines, retries, and cluster sizes (the
    // only sampling discipline that survives a distributed re-run)
    Q("q_hash_sample", (s, dir) => {
      val key = concat_ws(":", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"))
      s.read.parquet(t(dir, "lineitem"))
        .filter(Dedup.md5Hash32(key, "smp:") % 10 === 0)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
    }, Some(
      s"""SELECT count(*) AS n_rows,
         |  round(sum(l_extendedprice), 2) AS sum_price,
         |  round(avg(l_quantity), 4) AS avg_qty
         |FROM lineitem
         |WHERE ${Dedup.md5Hash32Sql(
              "(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR)",
              "smp:")} % 10 = 0""".stripMargin)),

    // value-range window frame: per customer, revenue of their orders in
    // the trailing 30 days (RANGE, not ROWS — equal-date rows share one
    // frame, so the result is set-determined and engine-independent)
    Q("q_window_range", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      s.read.parquet(t(dir, "orders"))
        .filter(col("o_custkey") <= 200)
        .withColumn("trailing_30d",
          round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("trailing_30d"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
        |    AS trailing_30d
        |FROM orders WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // correlated NOT EXISTS through the SQL front-end (planned as a
    // broadcast null-aware anti join)
    Q("q_not_exists", (s, dir) => {
      s.read.parquet(t(dir, "customer")).createOrReplaceTempView("customer")
      s.read.parquet(t(dir, "orders")).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_mktsegment
          |FROM customer c
          |WHERE c_custkey <= 500 AND NOT EXISTS (
          |  SELECT 1 FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |    AND o.o_orderdate BETWEEN DATE '1995-01-01'
          |                          AND DATE '1995-12-31')
          |ORDER BY c_custkey""".stripMargin)
    }, Some(
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE c_custkey <= 500 AND NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate BETWEEN DATE '1995-01-01'
        |                          AND DATE '1995-12-31')
        |ORDER BY c_custkey""".stripMargin)),

    // typed Dataset escape hatch with a full oracle: per-customer order
    // cadence via groupByKey + mapGroups (imperative per-group logic the
    // relational surface can also express — proven by the SQL twin)
    Q("q_map_groups", (s, dir) => {
      import s.implicits._
      val orders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_custkey") <= 300)
        .select(col("o_custkey").as("custkey"),
          col("o_orderdate").cast("date").cast("string").as("d"))
        .as[(Long, String)]
      orders.groupByKey(_._1)
        .mapGroups { (ck, rows) =>
          val ds = rows.map(_._2).toSeq.sorted
          val gaps = ds.zip(ds.tail).map { case (a, b) =>
            java.time.temporal.ChronoUnit.DAYS.between(
              java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
          }
          (ck, ds.length.toLong, if (gaps.isEmpty) 0L else gaps.max)
        }
        .toDF("custkey", "n_orders", "max_gap_days")
        .orderBy(col("custkey"))
    }, Some(
      """WITH g AS (
        |  SELECT o_custkey AS custkey,
        |    datediff('day',
        |      lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate),
        |      o_orderdate) AS gap
        |  FROM orders WHERE o_custkey <= 300)
        |SELECT custkey, count(*) AS n_orders,
        |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days
        |FROM g GROUP BY custkey ORDER BY custkey""".stripMargin)),

    // higher-order array functions over grouped data: per-order price
    // arrays processed with filter/transform/aggregate/sort — the lambda
    // surface, oracle-checked via DuckDB's list_* twins. The aggregate
    // lambda folds in index order over a sorted array, so the float sum
    // is deterministic cross-engine.
    Q("q_array_funcs", (s, dir) => {
      // The whole query lives in integer-cents domain: the r02 driver
      // hasher flagged the double-valued variant even though a value
      // diff agreed exactly, so no DOUBLE column leaves this query.
      // (Lambda surface — filter/transform/aggregate/sort — unchanged.)
      s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(
          expr("cast(round(l_extendedprice * 100) as bigint)")))
          .as("prices"))
        .select(col("l_orderkey"),
          size(col("prices")).as("n"),
          expr("size(filter(prices, p -> p > 2000000))").as("n_over_20k"),
          // 10% discount in tenths-of-cents, one exact half-up integer
          // division back to cents — engine-identical by construction.
          expr("(aggregate(transform(prices, p -> p * 9), " +
            "cast(0 as bigint), (acc, p) -> acc + p) + 5) div 10")
            .as("discounted_total_cents"),
          element_at(col("prices"), 1).as("cheapest_cents"),
          element_at(col("prices"), -1).as("dearest_cents"))
        .orderBy(col("l_orderkey"))
    }, Some(
      """SELECT l_orderkey,
        |  CAST(len(prices) AS INTEGER) AS n,
        |  CAST(len(list_filter(prices, p -> p > 2000000)) AS INTEGER)
        |    AS n_over_20k,
        |  (list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(prices,
        |      p -> p * 9)),
        |    (acc, p) -> acc + p) + 5) // 10 AS discounted_total_cents,
        |  prices[1] AS cheapest_cents,
        |  prices[-1] AS dearest_cents
        |FROM (
        |  SELECT l_orderkey,
        |    list_sort(list(CAST(round(l_extendedprice * 100) AS BIGINT)))
        |      AS prices
        |  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY 1)
        |ORDER BY l_orderkey""".stripMargin)),

    // multiset set-ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicity (distinct physical operators from the plain variants)
    Q("q_setops_all", (s, dir) => {
      val o = s.read.parquet(t(dir, "orders"))
      val a = o.filter(col("o_custkey") <= 400).select(col("o_orderpriority"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
      a.intersectAll(b).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_intersect"))
        .join(
          a.exceptAll(b).groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_except")),
          Seq("o_orderpriority"), "full_outer")
        .na.fill(0L, Seq("n_intersect", "n_except"))
        .orderBy(col("o_orderpriority"))
    }, Some(
      """WITH a AS (SELECT o_orderpriority FROM orders WHERE o_custkey <= 400),
        |b AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
        |i AS (SELECT o_orderpriority, count(*) AS n_intersect
        |      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) x
        |      GROUP BY 1),
        |e AS (SELECT o_orderpriority, count(*) AS n_except
        |      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) y
        |      GROUP BY 1)
        |SELECT coalesce(i.o_orderpriority, e.o_orderpriority)
        |    AS o_orderpriority,
        |  coalesce(n_intersect, 0) AS n_intersect,
        |  coalesce(n_except, 0) AS n_except
        |FROM i FULL OUTER JOIN e ON i.o_orderpriority = e.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // explode_outer: rows whose array is EMPTY survive with a NULL
    // element (plain explode silently drops them — the classic data-loss
    // footgun in fan-out pipelines)
    Q("q_explode_outer", (s, dir) => {
      val words = split(col("p_name"), " ")
      s.read.parquet(t(dir, "part"))
        .filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          explode_outer(filter(words, w => length(w) > 7)).as("long_word"))
        .orderBy(col("p_partkey"), col("long_word"))
    }, Some(
      """SELECT p_partkey, unnest(
        |    CASE WHEN len(lw) = 0 THEN [NULL] ELSE lw END) AS long_word
        |FROM (
        |  SELECT p_partkey,
        |    list_filter(string_split(p_name, ' '),
        |                w -> length(w) > 7) AS lw
        |  FROM part WHERE p_partkey <= 300) x
        |ORDER BY p_partkey, long_word""".stripMargin)),

    // fuzzy self-match on edit distance — the OCR-adjacent string
    // similarity surface (levenshtein is codegen'd in Spark and native
    // in DuckDB, so the oracle is exact)
    Q("q_fuzzy_names", (s, dir) => {
      // spread: the quadratic BNLJ parallelizes over the probe side's
      // input splits, and a single-file supplier table would run every
      // banded-levenshtein pair on one core
      val sup = graft.relational.Scale.spreadIfNarrow(
        s.read.parquet(t(dir, "supplier"))
          .select(col("s_suppkey"), col("s_name")))
      // 3-arg levenshtein short-circuits the DP once the threshold is
      // exceeded (returns -1) — on a quadratic self-join that bounds the
      // per-pair cost to the band, not the full edit matrix
      val d = levenshtein(col("a.s_name"), col("b.s_name"), 1)
      sup.as("a").join(sup.as("b"),
          col("a.s_suppkey") < col("b.s_suppkey") && d >= 0)
        .select(col("a.s_suppkey").as("ka"), col("b.s_suppkey").as("kb"),
          d.as("dist"))
        .orderBy(col("ka"), col("kb"))
    }, Some(
      """SELECT a.s_suppkey AS ka, b.s_suppkey AS kb,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey < b.s_suppkey
        | AND levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY ka, kb""".stripMargin)),

    // lateral correlated subquery: top-2 suppliers per nation through the
    // SQL front-end (LATERAL), planned by Catalyst as a ranked window
    Q("q_lateral_topk", (s, dir) => {
      s.read.parquet(t(dir, "supplier")).createOrReplaceTempView("supplier")
      s.read.parquet(t(dir, "nation")).createOrReplaceTempView("nation")
      s.sql(
        """SELECT n.n_name, t.s_name, round(t.s_acctbal, 2) AS acctbal
          |FROM nation n,
          |LATERAL (SELECT s_name, s_acctbal FROM supplier s
          |         WHERE s.s_nationkey = n.n_nationkey
          |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
          |ORDER BY n.n_name, acctbal DESC, t.s_name""".stripMargin)
    }, Some(
      """SELECT n.n_name, t.s_name, round(t.s_acctbal, 2) AS acctbal
        |FROM nation n,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier s
        |         WHERE s.s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        |ORDER BY n.n_name, acctbal DESC, t.s_name""".stripMargin)),
  )
}
