package graft

import graft.analysis.{CorpusMix, DomainQuality}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fifth-wave operator laws the DuckDB oracle can't express naturally:
  * isqrt exactness at the double-rounding boundary, the temperature
  * curve's FLATTENING property, and the domain gate's
  * guilt-by-association semantics (a clean page in a dirty domain
  * drops). The cross-engine hash gates are `corpus_mix_temperature` /
  * `domain_quality_filter` / `q_zorder_layout`. */
class WaveFiveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("isqrt is exact floor-sqrt, including around perfect squares") {
    // the hazard cases: k^2 - 1 (double sqrt may round UP to k),
    // k^2 and k^2 + 1, for k spanning small to 1e9 (x up to 1e18)
    val ks = Seq(1L, 2L, 3L, 10L, 255L, 256L, 65535L, 65536L,
      1000003L, 67108864L, 999999937L, 1000000000L)
    val xs = (ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) ++
      Seq(0L, 1L, 2L, 5L, 99L)).distinct
    val got = xs.toDF("x")
      .select(col("x"), CorpusMix.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val expect = java.math.BigInteger.valueOf(x).sqrt().longValue()
      assert(got(x) == expect, s"isqrt($x): got ${got(x)}, want $expect")
    }
  }

  test("temperature mixing flattens: small sources keep a larger share") {
    // three sources with 1:4:16 token mass; alpha = 1/2 weights are
    // 1:2:4 — so the SMALL source's kept-fraction must exceed the
    // big source's (the whole point of temperature sampling)
    val docs = (
      (1 to 20).map(i => (i.toLong, "small", "w " * 50)) ++
      (21 to 100).map(i => (i.toLong, "mid", "w " * 50)) ++
      (101 to 420).map(i => (i.toLong, "big", "w " * 50))
    ).toDF("doc_id", "source", "text")
    val out = CorpusMix.temperatureSummary(
        docs, "doc_id", "text", "source", budgetPpm = 500000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val (wSmall, rSmall) = out("small")
    val (wMid, rMid) = out("mid")
    val (wBig, rBig) = out("big")
    // exact expected weights: 50 tokens/doc -> masses 1000/4000/16000,
    // u = isqrt(mass) = 31/63/126, w = u * 1e6 div sum(u)
    val us = Seq(1000L, 4000L, 16000L)
      .map(m => java.math.BigInteger.valueOf(m).sqrt().longValue())
    val su = us.sum
    assert(Seq(wSmall, wMid, wBig) == us.map(_ * 1000000L / su),
      s"weights ($wSmall, $wMid, $wBig) != isqrt-derived ppm of $us")
    // flattening: keep-RATE decreases with source size
    assert(rSmall > rMid && rMid > rBig,
      s"rates must flatten the distribution: $rSmall, $rMid, $rBig")
  }

  test("domain gate drops a clean page inside a dirty domain") {
    val noisy = "text with much noise !!!*** ### %%% @@@ $$$ ^^^ &&&"
    val clean = "a perfectly reasonable sentence about the weather today"
    val docs = Seq(
      (1L, "farm.example", noisy),
      (2L, "farm.example", noisy),
      (3L, "farm.example", clean), // individually clean, bad company
      (4L, "good.example", clean),
      (5L, "good.example", clean)
    ).toDF("doc_id", "domain", "text")
    val out = DomainQuality.gate(docs, "doc_id", "text", "domain", 50000L)
      .select(col("doc_id"), col("domain_pass"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(1) && !out(2), "noisy farm pages drop")
    assert(!out(3), "the clean page drops WITH its domain")
    assert(out(4) && out(5), "the clean domain survives")
  }

  test("domain stats are exact integer aggregates (order-free)") {
    val docs = (1 to 400).map { i =>
      (i.toLong, s"d${i % 7}", ("word " * (i % 13 + 1)) + ("!" * (i % 5)))
    }.toDF("doc_id", "domain", "text")
    val a = DomainQuality.gate(docs.repartition(2), "doc_id", "text",
      "domain", 50000L).orderBy("doc_id").collect()
    val b = DomainQuality.gate(docs.repartition(11), "doc_id", "text",
      "domain", 50000L).orderBy("doc_id").collect()
    assert(a.sameElements(b), "verdicts must not depend on partitioning")
  }
}
