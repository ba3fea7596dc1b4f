package graft

import graft.sinks.IncrementalView
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytic truth for CDC-driven view maintenance: every change-type
  * path (insert, delete, update pre/post pairs, cross-group moves,
  * group birth and death) pinned on hand states where
  * maintain(agg(v0), changes) must equal agg(v1) exactly. */
class IncrementalViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // v0 rows: (orderkey, group, value)
  private val v0 = Seq(
    (1L, 10L, 100L), (2L, 10L, 200L), // group 10: 2 rows
    (3L, 20L, 300L),                  // group 20: 1 row (will vanish)
    (4L, 30L, 400L), (5L, 30L, 50L))  // group 30: 2 rows

  // v1: delete 3 (group 20 dies), insert 6 into NEW group 40,
  // update 2's value (+25, same group), update 5 MOVING group 30 -> 10
  private val v1 = Seq(
    (1L, 10L, 100L), (2L, 10L, 225L),
    (4L, 30L, 400L), (5L, 10L, 50L),
    (6L, 40L, 600L))

  private def agg(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "g", "v").groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  /** The v0->v1 change feed in VersionedTable.changes shape. */
  private def feed = Seq(
    (3L, 20L, 300L, "delete"),
    (2L, 10L, 200L, "update_preimage"),
    (2L, 10L, 225L, "update_postimage"),
    (5L, 30L, 50L, "update_preimage"),  // cross-group move: -30, +10
    (5L, 10L, 50L, "update_postimage"),
    (6L, 40L, 600L, "insert"))
    .toDF("k", "g", "v", "change_type")

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("maintain(agg(v0), changes) == agg(v1) across all change paths") {
    val maintained = IncrementalView.maintain(
      agg(v0), feed, Seq("g"), "n", Seq("v" -> "sv"))
    assert(resultMap(maintained) == resultMap(agg(v1)))
  }

  test("group death: count reaches zero and the row leaves the view") {
    val maintained = IncrementalView.maintain(
      agg(v0), feed, Seq("g"), "n", Seq("v" -> "sv"))
    assert(!resultMap(maintained).contains(20L))
  }

  test("group birth arrives from the delta side alone") {
    val m = resultMap(IncrementalView.maintain(
      agg(v0), feed, Seq("g"), "n", Seq("v" -> "sv")))
    assert(m(40L) == ((1L, 600L)))
  }

  test("cross-group update maintains both sides") {
    val m = resultMap(IncrementalView.maintain(
      agg(v0), feed, Seq("g"), "n", Seq("v" -> "sv")))
    assert(m(30L) == ((1L, 400L))) // lost the moved row
    assert(m(10L) == ((3L, 375L))) // gained it, plus the value update
  }

  test("empty feed is the identity") {
    val m = IncrementalView.maintain(
      agg(v0), feed.limit(0), Seq("g"), "n", Seq("v" -> "sv"))
    assert(resultMap(m) == resultMap(agg(v0)))
  }

  test("NULL group key maintains through the null-safe join") {
    // a NULL group is a legal GROUP BY group; a plain equi-join would
    // never match its view row to its delta row and the view would
    // keep a stale NULL row PLUS a delta-only NULL row
    def aggN(rows: Seq[(Long, Option[Long], Long)]) =
      rows.toDF("k", "g", "v").groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val v0n = Seq((1L, Option(10L), 100L), (2L, Option.empty[Long], 200L),
      (3L, Option.empty[Long], 300L))
    val feedN = Seq(
      (3L, Option.empty[Long], 300L, "delete"),
      (2L, Option.empty[Long], 200L, "update_preimage"),
      (2L, Option.empty[Long], 250L, "update_postimage"))
      .toDF("k", "g", "v", "change_type")
    val m = IncrementalView.maintain(
      aggN(v0n), feedN, Seq("g"), "n", Seq("v" -> "sv"))
    val rows = m.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((Some(10L), 1L, 100L), (None, 1L, 250L)))
    // ...and a NULL group dies like any other when its count hits zero
    val killAll = Seq((2L, Option.empty[Long], 250L, "delete"))
      .toDF("k", "g", "v", "change_type")
    val m2 = IncrementalView.maintain(
      m.select(col("g"), col("n"), col("sv")), killAll,
      Seq("g"), "n", Seq("v" -> "sv"))
    assert(m2.collect().map(_.isNullAt(0)).forall(_ == false) &&
      m2.count() == 1)
  }

  test("per-column non-null counts maintain (the avg-summary pair)") {
    // w is nullable; count(w) must move only on non-null rows — the
    // (sum, count) pair SummaryRewrite's avg decomposition consumes
    def aggW(rows: Seq[(Long, Long, Option[Long])]) =
      rows.toDF("k", "g", "w").groupBy(col("g"))
        .agg(count(lit(1)).as("n"), count(col("w")).as("cnt_w"))
    val v0w = Seq((1L, 10L, Option(5L)), (2L, 10L, Option.empty[Long]),
      (3L, 20L, Option(7L)))
    // delete the null-w row (count(*) moves, count(w) does not),
    // insert a null-w row into 20 (same asymmetry, other direction),
    // update 3's w from non-null to NULL (count(w) decrements in place)
    val feedW = Seq(
      (2L, 10L, Option.empty[Long], "delete"),
      (4L, 20L, Option.empty[Long], "insert"),
      (3L, 20L, Option(7L), "update_preimage"),
      (3L, 20L, Option.empty[Long], "update_postimage"))
      .toDF("k", "g", "w", "change_type")
    val v1w = Seq((1L, 10L, Option(5L)), (3L, 20L, Option.empty[Long]),
      (4L, 20L, Option.empty[Long]))
    val m = IncrementalView.maintain(
      aggW(v0w), feedW, Seq("g"), "n", Nil, Seq("w" -> "cnt_w"))
    assert(resultMap(m) == resultMap(aggW(v1w)))
    assert(resultMap(m) == Map(10L -> ((1L, 1L)), 20L -> ((2L, 0L))))
  }

  test("maintainWithExtrema == agg(v1): dirty groups recompute, " +
      "insert-only groups fold") {
    val mv0 = v0.toDF("k", "g", "v").groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val m = IncrementalView.maintainWithExtrema(
      mv0, feed, v1.toDF("k", "g", "v"), Seq("g"), "n",
      Seq("v" -> "sv"), Seq("v" -> "mn"), Seq("v" -> "mx"))
    val got = m.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // g10 and g30 are DIRTY (update preimages) -> recomputed from base;
    // g40 is insert-only -> folded; g20 dies with its count
    assert(got == Map(
      10L -> ((3L, 375L, 50L, 225L)),
      30L -> ((1L, 400L, 400L, 400L)),
      40L -> ((1L, 600L, 600L, 600L))))
  }

  test("extrema honor NULLs: skip in folds, survive all-NULL groups, " +
      "pass through untouched groups") {
    // g1 loses its max to a delete (dirty recompute), g2 is untouched,
    // g3 takes a NULL-valued insert (fold must skip it), g4 is born,
    // g5's only non-NULL value is deleted (extrema go NULL, group lives)
    def aggN(rows: Seq[(Long, Long, Option[Long])]) =
      rows.toDF("k", "g", "v").groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
    val n0 = Seq((1L, 1L, Option(10L)), (2L, 1L, Option(30L)),
      (3L, 2L, Option(5L)), (4L, 2L, Option(7L)),
      (5L, 3L, Option.empty[Long]), (6L, 3L, Option(50L)),
      (9L, 5L, Option(1L)), (10L, 5L, Option.empty[Long]))
    val n1 = Seq((1L, 1L, Option(10L)),
      (3L, 2L, Option(5L)), (4L, 2L, Option(7L)),
      (5L, 3L, Option.empty[Long]), (6L, 3L, Option(50L)),
      (7L, 3L, Option.empty[Long]), (8L, 4L, Option(20L)),
      (10L, 5L, Option.empty[Long]))
    val feedN = Seq(
      (2L, 1L, Option(30L), "delete"),
      (7L, 3L, Option.empty[Long], "insert"),
      (8L, 4L, Option(20L), "insert"),
      (9L, 5L, Option(1L), "delete"))
      .toDF("k", "g", "v", "change_type")
    val m = IncrementalView.maintainWithExtrema(
      aggN(n0), feedN, n1.toDF("k", "g", "v"), Seq("g"), "n",
      Nil, Seq("v" -> "mn"), Seq("v" -> "mx"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(asMap(m) == asMap(aggN(n1)))
    assert(asMap(m) == Map(
      1L -> ((1L, Some(10L), Some(10L))),
      2L -> ((2L, Some(5L), Some(7L))),
      3L -> ((3L, Some(50L), Some(50L))),
      4L -> ((1L, Some(20L), Some(20L))),
      5L -> ((1L, None, None))))
  }

  test("count-distinct maintains through the auxiliary view") {
    // two rows share value 5 in g1; deleting one must NOT drop the
    // value; an update collapsing 6 onto 5 must
    def aux(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("k", "g", "v").groupBy(col("g"), col("v"))
        .agg(count(lit(1)).as("n_rows"))
    val d0 = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 6L), (4L, 2L, 9L))
    val feedD = Seq(
      (2L, 1L, 5L, "delete"),
      (3L, 1L, 6L, "update_preimage"), (3L, 1L, 5L, "update_postimage"),
      (4L, 2L, 9L, "delete"))
      .toDF("k", "g", "v", "change_type")
    val a1 = IncrementalView.maintainDistinctAux(
      aux(d0), feedD, Seq("g"), "v")
    val dc = IncrementalView.distinctCounts(a1, Seq("g"), "v", "nd")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // g1: values {5}, g2 died with its last row
    assert(dc == Map(1L -> 1L))
    // the aux view itself carries the surviving multiplicity
    val rows = a1.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map((1L, 5L) -> 2L))
  }

  test("an unknown change_type fails loudly, never silently drops") {
    val bad = Seq((9L, 10L, 1L, "upsert")).toDF("k", "g", "v", "change_type")
    val ex = intercept[Exception] {
      IncrementalView.maintain(agg(v0), bad, Seq("g"), "n", Seq("v" -> "sv"))
        .collect()
    }
    assert(ex.getMessage.contains("unknown change_type") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown change_type")))
  }

  test("maintain refuses non-integral sum sources (floating drift)") {
    // a double-typed sum source would accumulate rounding residue
    // across +x/-x delta round-trips — refused at the API, not
    // documented away
    val mv = Seq((10L, 1L, 100L)).toDF("g", "n", "sv")
    val chD = Seq((1L, 10L, 1.5, "insert"))
      .toDF("k", "g", "v", "change_type")
    val ex = intercept[IllegalArgumentException] {
      IncrementalView.maintain(mv, chD, Seq("g"), "n", Seq("v" -> "sv"))
    }
    assert(ex.getMessage.contains("floating drift"))

    // ...and a non-integral maintained VIEW column is refused too —
    // the exactness contract holds end to end, not just on the delta
    val mvD = Seq((10L, 1L, 100.0)).toDF("g", "n", "sv")
    val chL = Seq((1L, 10L, 5L, "insert"))
      .toDF("k", "g", "v", "change_type")
    val ex2 = intercept[IllegalArgumentException] {
      IncrementalView.maintain(mvD, chL, Seq("g"), "n", Seq("v" -> "sv"))
    }
    assert(ex2.getMessage.contains("must stay integral"))
  }
}
