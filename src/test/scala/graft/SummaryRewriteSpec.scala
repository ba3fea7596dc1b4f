package graft

import graft.plans.SummaryRewrite
import graft.plans.SummaryRewrite.MaterializedSummary
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Routing proof for the materialized-summary rewrite: matching
  * aggregates read the summary relation (no Aggregate survives in the
  * optimized plan), everything else — filters, other groupings,
  * unregistered aggregates, distinct — is left alone, and the rewritten
  * output keeps the original attribute ids so downstream operators
  * re-bind nothing. */
class SummaryRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val (basePath, summaryPath): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("sumrw").toString
    val base = s"$dir/base.parquet"
    val sumP = s"$dir/summary.parquet"
    Seq((1L, 10L, 1.5), (1L, 20L, 0.5), (2L, 30L, 9.0), (3L, 40L, 4.0))
      .toDF("g", "v", "d").write.parquet(base)
    spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("d")).as("mx"))
      .write.parquet(sumP)
    SummaryRewrite.enable(spark)
    SummaryRewrite.register(MaterializedSummary(
      base, sumP, Seq("g"),
      Map(("count", "*") -> "n", ("sum", "v") -> "sv", ("max", "d") -> "mx"),
      rebuildMaintained = true))
    (base, sumP)
  }

  /** Two-key fixture for the roll-up path: summary on (g, g2). */
  private lazy val (base2Path, summary2Path): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("sumru").toString
    val base = s"$dir/base2.parquet"
    val sumP = s"$dir/summary2.parquet"
    Seq((1L, 10L, 100L, 1.0), (1L, 10L, 200L, 2.0), (1L, 20L, 300L, 3.0),
        (2L, 10L, 400L, 4.0), (2L, 20L, 500L, 5.0))
      .toDF("g", "g2", "v", "d").write.parquet(base)
    spark.read.parquet(base).groupBy(col("g"), col("g2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("d")).as("mn"), max(col("d")).as("mx"))
      .write.parquet(sumP)
    SummaryRewrite.enable(spark)
    SummaryRewrite.register(MaterializedSummary(
      base, sumP, Seq("g", "g2"),
      Map(("count", "*") -> "n", ("sum", "v") -> "sv",
        ("min", "d") -> "mn", ("max", "d") -> "mx"),
      rebuildMaintained = true))
    (base, sumP)
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath).toSeq
        case _ => Nil
      }
    }.flatten

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  private def userAgg: DataFrame =
    spark.read.parquet(basePath).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("d")).as("mx"))

  test("matching aggregate routes to the summary scan") {
    val df = userAgg
    assert(scanPaths(df) == Seq(summaryPath))
    assert(!hasAggregate(df))
  }

  test("rewritten results equal the direct aggregation") {
    val got = userAgg.orderBy("g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((1L, 2L, 30L, 1.5), (2L, 1L, 30L, 9.0),
      (3L, 1L, 40L, 4.0)))
  }

  test("original attribute ids survive: downstream ops re-bind nothing") {
    // filter + join on the REWRITTEN output exercises the preserved ids
    val df = userAgg
    val joined = df.filter(col("n") >= 1)
      .join(Seq((1L, "x"), (3L, "y")).toDF("g", "tag"), Seq("g"))
      .orderBy("g")
    assert(scanPaths(joined).contains(summaryPath))
    assert(joined.select("g", "n", "tag").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 2L, "x"), (3L, 1L, "y")))
  }

  test("group-column filter commutes: still routes, filter re-applies") {
    val df = spark.read.parquet(basePath).filter(col("g") =!= 2L)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df) == Seq(summaryPath))
    assert(df.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("filtered aggregate is NOT rewritten") {
    val df = spark.read.parquet(basePath).filter(col("v") > 15)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df) == Seq(basePath))
    assert(hasAggregate(df))
  }

  test("different grouping is NOT rewritten") {
    val df = spark.read.parquet(basePath)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df) == Seq(basePath))
  }

  test("unregistered aggregate function is NOT rewritten") {
    val df = spark.read.parquet(basePath).groupBy(col("g"))
      .agg(avg(col("v")).as("a"))
    assert(scanPaths(df) == Seq(basePath))
  }

  test("distinct aggregate is NOT rewritten") {
    val df = spark.read.parquet(basePath).groupBy(col("g"))
      .agg(countDistinct(col("v")).as("n"))
    assert(scanPaths(df) == Seq(basePath))
  }

  test("a subset of the registered outputs still routes") {
    val df = spark.read.parquet(basePath).groupBy(col("g"))
      .agg(sum(col("v")).as("just_sum"))
    assert(scanPaths(df) == Seq(summaryPath))
    assert(df.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 30L), (2L, 30L), (3L, 40L)))
  }

  test("deregister restores the base scan") {
    val tmpBase = basePath // force fixture init first
    SummaryRewrite.deregister(tmpBase)
    try {
      assert(scanPaths(userAgg) == Seq(tmpBase))
    } finally {
      SummaryRewrite.register(MaterializedSummary(
        tmpBase, summaryPath, Seq("g"),
        Map(("count", "*") -> "n", ("sum", "v") -> "sv",
          ("max", "d") -> "mx"),
        rebuildMaintained = true))
    }
  }

  /** Nullable-value fixture for the avg decomposition: summary on
    * (g, g2) carrying count(*), count(v) AND sum(v). */
  private lazy val (base3Path, summary3Path): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("sumavg").toString
    val base = s"$dir/base3.parquet"
    val sumP = s"$dir/summary3.parquet"
    Seq((1L, 10L, Option(10L)), (1L, 10L, Option.empty[Long]),
        (1L, 20L, Option(20L)), (2L, 10L, Option.empty[Long]),
        (2L, 20L, Option.empty[Long]), (3L, 10L, Option(7L)),
        (3L, 10L, Option(9L)))
      .toDF("g", "g2", "v").write.parquet(base)
    spark.read.parquet(base).groupBy(col("g"), col("g2"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("cnt_v"),
        sum(col("v")).as("sv"))
      .write.parquet(sumP)
    SummaryRewrite.enable(spark)
    SummaryRewrite.register(MaterializedSummary(
      base, sumP, Seq("g", "g2"),
      Map(("count", "*") -> "n", ("count", "v") -> "cnt_v",
        ("sum", "v") -> "sv")))
    (base, sumP)
  }

  test("avg decomposes onto (sum, count) and honors NULLs — direct") {
    val df = spark.read.parquet(base3Path).groupBy(col("g"), col("g2"))
      .agg(count(col("v")).as("cnt_v"), avg(col("v")).as("a"))
    assert(scanPaths(df) == Seq(summary3Path))
    val got = df.orderBy("g", "g2").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(
      (1L, 10L, 1L, Some(10.0)), (1L, 20L, 1L, Some(20.0)),
      (2L, 10L, 0L, None), (2L, 20L, 0L, None),
      (3L, 10L, 2L, Some(8.0))))
  }

  test("avg rolls up as sum(sum)/sum(count); count(col) re-sums") {
    val df = spark.read.parquet(base3Path).groupBy(col("g"))
      .agg(count(col("v")).as("cnt_v"), avg(col("v")).as("a"))
    assert(scanPaths(df) == Seq(summary3Path))
    assert(hasAggregate(df))
    val got = df.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq((1L, 2L, Some(15.0)), (2L, 0L, None),
      (3L, 2L, Some(8.0))))
  }

  test("scalar wrappers route: round(avg) direct, arithmetic roll-up") {
    // CollapseProject folds a post-aggregation select INTO the
    // aggregate's output list — `round(avg(v), 6)` arrives as
    // Alias(Round(AggregateExpression)) and must still route
    val direct = spark.read.parquet(base3Path)
      .groupBy(col("g"), col("g2"))
      .agg(avg(col("v")).as("a_raw"), count(lit(1)).as("n_raw"))
      .select(col("g"), col("g2"), round(col("a_raw"), 6).as("a"),
        (col("n_raw") * 2 + col("g")).as("n2g"))
    assert(scanPaths(direct) == Seq(summary3Path))
    val gotD = direct.orderBy("g", "g2").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3))).toSeq
    assert(gotD == Seq(
      (1L, 10L, Some(10.0), 5L), (1L, 20L, Some(20.0), 3L),
      (2L, 10L, None, 4L), (2L, 20L, None, 4L),
      (3L, 10L, Some(8.0), 7L)))

    val rolledUp = spark.read.parquet(base3Path).groupBy(col("g"))
      .agg(avg(col("v")).as("a_raw"))
      .select(col("g"), round(col("a_raw"), 6).as("a"))
    assert(scanPaths(rolledUp) == Seq(summary3Path))
    assert(hasAggregate(rolledUp))
    val gotR = rolledUp.orderBy("g").collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    assert(gotR == Seq((1L, Some(15.0)), (2L, None), (3L, Some(8.0))))
  }

  test("a non-deterministic wrapper never routes") {
    val df = spark.read.parquet(base3Path).groupBy(col("g"), col("g2"))
      .agg(count(lit(1)).as("n_raw"))
      .select(col("g"), (col("n_raw") + rand()).as("x"))
    assert(scanPaths(df) == Seq(base3Path))
  }

  test("count(*) never licenses avg: no (count, col) mapping, no route") {
    // summary2 registers count(*) and sum(v) but NOT count(v) — with a
    // nullable-blind decomposition this would silently mis-serve avg
    val df = spark.read.parquet(base2Path).groupBy(col("g"), col("g2"))
      .agg(avg(col("v")).as("a"))
    assert(scanPaths(df) == Seq(base2Path))
  }

  test("HAVING and SQL-path aggregates route too (same plan shape)") {
    // HAVING is a Filter ABOVE the Aggregate — the rule matches the
    // Aggregate node itself, so the filter rides on the routed result
    val having = spark.read.parquet(base3Path).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 2)
    assert(scanPaths(having) == Seq(summary3Path))
    assert(having.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet == Set((1L, 3L)))

    // the SQL front end plans to the same Aggregate shape
    spark.read.parquet(base3Path).createOrReplaceTempView("sr_base3")
    val viaSql = spark.sql(
      "SELECT g, g2, round(avg(v), 6) AS a FROM sr_base3 GROUP BY g, g2")
    assert(scanPaths(viaSql) == Seq(summary3Path))
  }

  test("register refuses min/max without rebuildMaintained") {
    val e = intercept[IllegalArgumentException] {
      SummaryRewrite.register(MaterializedSummary(
        "/tmp/never-used-base", "/tmp/never-used-summary", Seq("g"),
        Map(("count", "*") -> "n", ("max", "d") -> "mx")))
    }
    assert(e.getMessage.contains("not self-maintainable"))
    // count/sum-only summaries register fine without the declaration
    SummaryRewrite.register(MaterializedSummary(
      "/tmp/never-used-base2", "/tmp/never-used-summary2", Seq("g"),
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")))
    SummaryRewrite.deregister("/tmp/never-used-base2")
  }

  /** Fine + coarse summaries over ONE base, for the selection tests. */
  private lazy val (base4Path, fine4Path, coarse4Path)
      : (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("sumsel").toString
    val base = s"$dir/base4.parquet"
    val fine = s"$dir/fine4.parquet"
    val coarse = s"$dir/coarse4.parquet"
    Seq((1L, 10L, 100L), (1L, 10L, 200L), (1L, 20L, 300L),
        (2L, 10L, 400L), (2L, 20L, 500L))
      .toDF("g", "g2", "v").write.parquet(base)
    spark.read.parquet(base).groupBy(col("g"), col("g2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(fine)
    spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .write.parquet(coarse)
    SummaryRewrite.enable(spark)
    val aggs: Map[(String, String), String] =
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")
    SummaryRewrite.register(MaterializedSummary(
      base, fine, Seq("g", "g2"), aggs))
    SummaryRewrite.register(MaterializedSummary(
      base, coarse, Seq("g"), aggs))
    (base, fine, coarse)
  }

  test("multi-summary: the coarse query reads the COARSE summary") {
    // both candidates qualify (coarse directly, fine via roll-up);
    // coarsest-first selection must pick the direct route — a plain
    // projection of the smaller table, no re-aggregation at all
    val df = spark.read.parquet(base4Path).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(df) == Seq(coarse4Path))
    assert(!hasAggregate(df))
    assert(df.orderBy("g").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 600L), (2L, 2L, 900L)))
  }

  test("multi-summary: the fine query falls through to the FINE summary") {
    val df = spark.read.parquet(base4Path).groupBy(col("g"), col("g2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(df) == Seq(fine4Path))
    assert(!hasAggregate(df))
    assert(df.orderBy("g", "g2").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 10L, 2L, 300L), (1L, 20L, 1L, 300L),
        (2L, 10L, 1L, 400L), (2L, 20L, 1L, 500L)))
  }

  test("registrations are session-scoped: another session never routes") {
    val p = base4Path // force fixture registration on `spark` first
    val s2 = spark.newSession()
    SummaryRewrite.enable(s2)
    val df = s2.read.parquet(p).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(df) == Seq(p),
      "a summary registered in one session must not route another's query")
    assert(hasAggregate(df))
  }

  test("summary plans resolve once per registration, not per query") {
    val df0 = spark.read.parquet(base4Path).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(df0) == Seq(coarse4Path)) // cache warmed
    val n0 = SummaryRewrite.cachedSummaryPlanCount
    (1 to 3).foreach { _ =>
      val df = spark.read.parquet(base4Path).groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(scanPaths(df) == Seq(coarse4Path))
    }
    assert(SummaryRewrite.cachedSummaryPlanCount == n0,
      "repeated routed queries must reuse the cached analyzed plan")
  }

  test("re-registering the same shape swaps the served version") {
    val dir = java.nio.file.Files.createTempDirectory("sumswap").toString
    val base = s"$dir/base5.parquet"
    Seq((1L, 5L), (2L, 7L)).toDF("g", "v").write.parquet(base)
    def mkSummary(path: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("g", "n", "sv").write.parquet(path)
    val v1 = s"$dir/s_v1.parquet"
    val v2 = s"$dir/s_v2.parquet"
    mkSummary(v1, Seq((1L, 1L, 5L), (2L, 1L, 7L)))
    mkSummary(v2, Seq((1L, 1L, 5L), (2L, 1L, 7L), (3L, 1L, 9L)))
    SummaryRewrite.enable(spark)
    val aggs: Map[(String, String), String] =
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")
    SummaryRewrite.register(MaterializedSummary(base, v1, Seq("g"), aggs))
    def q = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(q) == Seq(v1))
    // the maintenance job serves version 2: same shape, new path —
    // REPLACES the candidate (no stale sibling) and drops v1's cached
    // plan with it
    SummaryRewrite.register(MaterializedSummary(base, v2, Seq("g"), aggs))
    assert(scanPaths(q) == Seq(v2))
    assert(q.count() == 3) // proves the v2 data actually serves
    SummaryRewrite.deregister(base)
  }

  test("subset grouping rolls up: summary scan + re-aggregation") {
    val df = spark.read.parquet(base2Path).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("d")).as("mn"), max(col("d")).as("mx"))
    assert(scanPaths(df) == Seq(summary2Path))
    assert(hasAggregate(df)) // re-aggregation, not a plain projection
    assert(df.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq ==
      Seq((1L, 3L, 600L, 1.0, 3.0), (2L, 2L, 900L, 4.0, 5.0)))
  }

  test("roll-up filter on a dropped summary key goes below the re-agg") {
    val df = spark.read.parquet(base2Path).filter(col("g2") === 10L)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("d")).as("mx"))
    assert(scanPaths(df) == Seq(summary2Path))
    assert(df.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((1L, 2L, 300L, 2.0), (2L, 1L, 400L, 4.0)))
  }

  test("global aggregate (empty grouping) is NOT rewritten") {
    val df = spark.read.parquet(base2Path)
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(df) == Seq(base2Path))
  }

  test("non-reaggregable output disqualifies the roll-up") {
    val df = spark.read.parquet(base2Path).groupBy(col("g"))
      .agg(avg(col("v")).as("a"))
    assert(scanPaths(df) == Seq(base2Path))
    // ...and a filter on a NON-key column disqualifies it too
    val df2 = spark.read.parquet(base2Path).filter(col("v") > 150)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    assert(scanPaths(df2) == Seq(base2Path))
  }

  /** Register a summary for a THROWAWAY session in its own stack
    * frame — and ROUTE a query through it, so the session's analyzed-
    * plan cache is WARM when the session is abandoned. This is the r16
    * advisor's scenario: cached analyzed plans strongly reference
    * their session (HadoopFsRelation/InMemoryFileIndex), so a STATIC
    * plan cache pinned every abandoned session that ever routed and
    * reaping could never fire — the cache must die WITH the session.
    * No strong reference survives the return (register takes the
    * session explicitly — the thread's active session is never
    * switched). */
  private def registerFromAbandonedSession(
      base: String, sumP: String): Unit = {
    val s = spark.newSession()
    SummaryRewrite.enable(s)
    SummaryRewrite.register(MaterializedSummary(base, sumP, Seq("g"),
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")), s)
    val df = s.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(df) == Seq(sumP),
      "the throwaway session must actually route — a cold plan cache " +
        "would prove nothing about reaping")
    assert(df.collect().nonEmpty) // and execute, like a real dashboard
  }

  test("abandoned sessions are reaped; no registry entries survive") {
    val p = basePath // fixture registered on the long-lived session
    val dir = java.nio.file.Files.createTempDirectory("sumreap").toString
    val base = s"$dir/base6.parquet"
    val sumP = s"$dir/s6.parquet"
    Seq((1L, 5L)).toDF("g", "v").write.parquet(base)
    Seq((1L, 1L, 5L)).toDF("g", "n", "sv").write.parquet(sumP)
    val before = SummaryRewrite.registrySize
    (1 to 3).foreach(_ => registerFromAbandonedSession(base, sumP))
    // NOT == before + 3: a GC between registrations can collect an
    // earlier throwaway session, and register() itself reaps — under
    // heap pressure the count legitimately lands short (reaping
    // working EARLY, which is the property under test). Each helper
    // call already proved its registration landed by routing through
    // it; the convergence loop below is the reap property itself.
    assert(SummaryRewrite.registrySize <= before + 3)
    // the throwaway sessions are unreachable; once the JVM collects
    // them the next reap (register/deregister/lookup all run it) must
    // sweep their entries. GC is advisory, so nudge it in a loop.
    var tries = 0
    while (SummaryRewrite.registrySize > before && tries < 50) {
      System.gc()
      Thread.sleep(100)
      SummaryRewrite.reapNow()
      tries += 1
    }
    assert(SummaryRewrite.registrySize == before,
      s"abandoned sessions must be reaped (still " +
        s"${SummaryRewrite.registrySize - before} extra after $tries gcs)")
    // the long-lived session's own registrations survive the sweep
    val df = spark.read.parquet(p).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    assert(scanPaths(df) == Seq(summaryPath))
  }

  test("deregister in one session never evicts a co-registered plan") {
    val dir = java.nio.file.Files.createTempDirectory("sumshare").toString
    val base = s"$dir/base7.parquet"
    val sumP = s"$dir/s7.parquet"
    Seq((1L, 5L), (2L, 7L)).toDF("g", "v").write.parquet(base)
    Seq((1L, 1L, 5L), (2L, 1L, 7L)).toDF("g", "n", "sv")
      .write.parquet(sumP)
    val aggs: Map[(String, String), String] =
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")
    val s2 = spark.newSession()
    SummaryRewrite.enable(spark)
    SummaryRewrite.enable(s2)
    SummaryRewrite.register(
      MaterializedSummary(base, sumP, Seq("g"), aggs), spark)
    SummaryRewrite.register(
      MaterializedSummary(base, sumP, Seq("g"), aggs), s2)
    def q(s: SparkSession) = s.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scanPaths(q(spark)) == Seq(sumP)) // warms spark's cache entry
    assert(scanPaths(q(s2)) == Seq(sumP))    // warms s2's own entry
    val n0 = SummaryRewrite.cachedSummaryPlanCount
    SummaryRewrite.deregister(base, s2) // drops ONLY s2's entry
    assert(SummaryRewrite.cachedSummaryPlanCount == n0 - 1)
    assert(scanPaths(q(spark)) == Seq(sumP),
      "the surviving registration must still route")
    assert(SummaryRewrite.cachedSummaryPlanCount == n0 - 1,
      "…from its own cached plan, without re-resolving")
    assert(scanPaths(q(s2)) == Seq(base),
      "the deregistered session must stop routing")
    SummaryRewrite.deregister(base, spark)
  }
}
