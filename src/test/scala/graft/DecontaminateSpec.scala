package graft

import graft.analysis.Decontaminate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Analytic truth for benchmark decontamination: a hand-built corpus
  * where every 4-gram overlap count is computable by inspection. */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // eval doc: grams {a|b|c|d, b|c|d|e, c|d|e|f}
  private lazy val ev = Seq((100L, "a b c d e f")).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // full clone — all 3 of its grams overlap (3 own grams, 1e6 ppm)
    (1L, "a b c d e f"),
    // shares exactly one gram a|b|c|d; owns 5 grams
    (2L, "a b c d x y z w"),
    // same words, different order — zero 4-gram overlap
    (3L, "f e d c b a"),
    // repeated eval gram counts ONCE (distinct sets both sides)
    (4L, "a b c d a b c d"),
    // under 4 words: no grams, never reported
    (5L, "a b c"))
    .toDF("doc_id", "text")

  test("overlap counts, distinct-set semantics, integer ppm") {
    val got = Decontaminate.report(corpus, ev)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((3L, 3L, 1000000L)),
      // doc 4: grams {a|b|c|d, b|c|d|a, c|d|a|b, d|a|b|c} distinct=4,
      // only a|b|c|d is in the eval set
      4L -> ((1L, 4L, 250000L)),
      2L -> ((1L, 5L, 200000L))))
  }

  test("ppm floors exactly (no double rounding): 1/3 -> 333333") {
    val got = Decontaminate.report(
        Seq((20L, "a b c d x y")).toDF("doc_id", "text"), ev)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 3L, 333333L)))
  }

  test("span merge semantics: consecutive, touch-at-k, gap split, clean doc") {
    // eval grams: {a|b|c|d, b|c|d|e, c|d|e|f}; GramSize k = 4
    val c2 = Seq(
      (10L, "a b c d e f"),       // hits at pos 1,2,3 -> one span [1,6]
      (11L, "a b c d b c d e"),   // hits 1 and 5 (gap == k) -> merged [1,8]
      (12L, "a b c d q b c d e"), // hits 1 and 6 (gap > k) -> [1,4],[6,9]
      (13L, "x y z w v u"))       // no hits -> absent
      .toDF("doc_id", "text")
    val got = Decontaminate.reportSpans(c2, ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (10L, 1L, 6L, 6L, 3L),
      (11L, 1L, 8L, 8L, 2L),
      (12L, 1L, 4L, 4L, 1L),
      (12L, 6L, 9L, 4L, 1L)))
  }

  test("span eval side is broadcast too") {
    val plan = Decontaminate.reportSpans(corpus, ev)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("eval side is broadcast — no corpus-wide shuffle join") {
    val plan = Decontaminate.report(corpus, ev)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
