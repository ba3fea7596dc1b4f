package graft

import graft.analysis.NgramLm
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM training + scoring vs an independent in-memory reference
  * (plain maps, no shared code with the Spark path). The hash gate
  * against DuckDB is `lm_perplexity`. */
class NgramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def refScore(
      docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(t: String): Seq[String] =
      NgramLm.Start +: "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    def bigrams(t: String): Seq[(String, String)] = {
      val a = toks(t)
      a.zip(a.tail)
    }
    val train = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._2))
    val c2 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = train.map(_._2).distinct.size + 1L
    docs.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None
      else {
        val lps = bs.map { b =>
          val p = (c2.getOrElse(b, 0L) + 1.0) /
            (c1.getOrElse(b._1, 0L) + v)
          Math.round(Math.log(p) * 1e6)
        }
        val (s, n) = (-lps.sum, bs.size.toLong)
        val xent = ((2 * s + 100 * n) / (200 * n)).toDouble / 1e4
        Some(id -> (n, xent))
      }
    }.toMap
  }

  test("matches the independent reference, including OOV and empty docs") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "a cat and a dog"),
      (3L, "zephyr quixotic unseen tokens everywhere"), // all-OOV doc
      (4L, "the the the the"),
      (5L, ""), // token-less: no score row
      (6L, "cat"))
    val got = NgramLm.fitScore(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent")))
      .toMap
    assert(got == refScore(docs))
    assert(!got.contains(5L))
  }

  test("train docs score lower cross-entropy than an OOV doc") {
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta"),
      (2L, "alpha beta gamma delta"),
      (7L, "omicron sigma tau upsilon"))
    val got = NgramLm.fitScore(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent"))
      .toMap
    assert(got(0L) < got(7L) && got(2L) < got(7L))
  }
}
