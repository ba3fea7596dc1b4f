package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Edge semantics of the as-of join that the oracle data (microsecond-
  * random timestamps) never exercises: equal-timestamp inclusivity and
  * the no-prior-row null. */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("equal timestamps match inclusively; no prior row yields null") {
    val left = Seq(
      (1L, ts("10:00:00"), "L-equal"),   // same ts as a right row -> match
      (1L, ts("09:00:00"), "L-before"),  // before any right row -> null
      (2L, ts("11:00:00"), "L-later"))   // strictly after -> match
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("10:00:00"), "R1"),
      (2L, ts("10:30:00"), "R2"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("L-equal").contains("R1"), "equal ts must match (inclusive >=)")
    assert(out("L-before").isEmpty, "no prior right row -> null")
    assert(out("L-later").contains("R2"))
  }

  test("latest prior row wins among several") {
    val left = Seq((1L, ts("12:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("10:00:00"), "old"),
      (1L, ts("11:00:00"), "newer"),
      (1L, ts("13:00:00"), "future"))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
      .collect()(0).getString(3)
    assert(got == "newer")
  }

  test("duplicate (key, ts) right rows resolve deterministically to the greatest payload") {
    val left = Seq((1L, ts("12:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("11:00:00"), "alpha"),
      (1L, ts("11:00:00"), "zeta"),
      (1L, ts("11:00:00"), "mid"))
      .toDF("k", "ts", "v")
    // repeat: partition/shuffle nondeterminism must never change the winner
    (1 to 3).foreach { _ =>
      val got = AsOfJoin.backward(left, right.repartition(3), "k", "ts", Seq("v"))
        .collect()(0).getString(3)
      assert(got == "zeta", "greatest payload struct must win the ts tie")
    }
  }

  test("forward as-of picks the earliest right row at-or-after") {
    val left = Seq(
      (1L, ts("10:00:00"), "L-equal"),   // same ts as a right row -> match
      (1L, ts("11:30:00"), "L-after"),   // after the last right row -> null
      (2L, ts("09:00:00"), "L-early"))   // strictly before -> nearest next
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("10:00:00"), "R1"),
      (1L, ts("11:00:00"), "R2"),
      (2L, ts("10:30:00"), "R3"),
      (2L, ts("12:00:00"), "R4"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.forward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("L-equal").contains("R1"), "equal ts must match (inclusive)")
    assert(out("L-after").isEmpty, "no later right row -> null")
    assert(out("L-early").contains("R3"), "nearest NEXT row wins, not any later one")
  }

  test("NULL timestamps never match, in either direction") {
    val left = Seq(
      (1L, Some(ts("12:00:00")), "L-real"),
      (1L, None, "L-null"))
      .map { case (k, t, tag) => (k, t.orNull, tag) }
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, Some(ts("10:00:00")), "R-real"),
      (1L, None, "R-null"))
      .map { case (k, t, v) => (k, t.orNull, v) }
      .toDF("k", "ts", "v")
    val back = AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    // a null-ts right row must never forward-fill; a null-ts left row
    // must come out unmatched (ASOF inequalities are false on NULL)
    assert(back("L-real").contains("R-real"))
    assert(back("L-null").isEmpty, "null-ts left row must not match")
    val fwd = AsOfJoin.forward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(fwd("L-real").isEmpty, "only null-ts right rows lie ahead")
    assert(fwd("L-null").isEmpty, "null-ts left row must not match")
  }

  test("NULL keys never match (SQL equality semantics)") {
    val left = Seq(
      (Some(1L), Some(ts("12:00:00")), "L-real"),
      (None, Some(ts("12:00:00")), "L-nullkey"))
      .map { case (k, t, tag) => (k.map(Long.box).orNull, t.orNull, tag) }
      .toDF("k", "ts", "tag")
    val right = Seq(
      (Some(1L), Some(ts("10:00:00")), "R-real"),
      (None, Some(ts("11:00:00")), "R-nullkey"))
      .map { case (k, t, v) => (k.map(Long.box).orNull, t.orNull, v) }
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("L-real").contains("R-real"))
    assert(out("L-nullkey").isEmpty,
      "null keys must not pair, even with each other")
  }

  test("reserved helper column names are rejected") {
    val left = Seq((1L, ts("12:00:00"), "x")).toDF("k", "ts", "__side")
    val right = Seq((1L, ts("11:00:00"), "v")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("__side"))
  }
}
