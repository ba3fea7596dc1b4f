package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The fluent import surface a library user sees: one import, the whole
  * operator library as DataFrame methods. */
class SyntaxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import graft.syntax._
  import spark.implicits._

  test("operator surface composes through the syntax package") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "totally different text about query engines and planners"))
      .toDF("doc_id", "text")

    assert(docs.exactDupGroups("doc_id", "text").count() == 1)
    val pairs = docs.nearDupPairsExact("doc_id", "text")
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    val comps = pairs.connectedComponents("da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L))
    assert(docs.withTextQuality("text").columns
      .takeRight(3).toSeq == Seq("n_tokens", "quality", "lang_pred"))

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val left = Seq((1L, ts(30), "L")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(10), "early"), (1L, ts(45), "late"))
      .toDF("k", "ts", "v")
    assert(left.asOfBackward(right, "k", "ts", Seq("v"))
      .collect()(0).getString(3) == "early")
    assert(left.asOfForward(right, "k", "ts", Seq("v"))
      .collect()(0).getString(3) == "late")
  }
}
