package graft

import graft.analysis.Bm25
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BM25 vs an independent in-memory reference (plain loops, no shared
  * code). The hash gate against DuckDB is `bm25_search`. */
class Bm25Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def refBm25(
      docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] = {
    def tokens(t: String): Seq[String] = "\\S+".r.findAllIn(t).toSeq
    def tf(text: String, term: String): Long =
      s"(?i)\\b$term\\b".r.findAllIn(text).size.toLong
    val n = docs.size
    val avgdl = docs.map(d => tokens(d._2).size).sum.toDouble / n
    val dfs = terms.map(t => t -> docs.count(d => tf(d._2, t) > 0)).toMap
    docs.flatMap { case (id, text) =>
      val dl = tokens(text).size
      val micros = terms.flatMap { t =>
        val f = tf(text, t)
        if (f == 0) None
        else {
          val idf = Math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          val x = idf * (f * (Bm25.K1 + 1)) /
            (f + Bm25.K1 * (1 - Bm25.B + Bm25.B * dl / avgdl))
          Some(Math.round(x * 1e6))
        }
      }
      if (micros.isEmpty) None
      else Some(id -> Math.round(micros.sum / 100.0).toDouble / 1e4)
    }.toMap
  }

  private val docs = Seq(
    (0L, "spark shuffles data across the cluster"),
    (1L, "spark spark spark tuning spark jobs"),
    (2L, "a vector database stores embeddings"),
    (3L, "hash joins beat sort merge joins sometimes"),
    (4L, "nothing relevant here at all"),
    (5L, "spark hash aggregation with a vector clock"))

  test("matches the independent reference") {
    val got = Bm25.search(docs.toDF("doc_id", "text"),
        Seq("spark", "vector", "hash"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
      .toMap
    assert(got == refBm25(docs, Seq("spark", "vector", "hash")))
    assert(!got.contains(4L), "zero-match docs emit no row")
  }

  test("term saturation: repeating a term gains sublinearly") {
    val got = Bm25.search(docs.toDF("doc_id", "text"), Seq("spark"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
      .toMap
    // doc 1 has 4x the tf of doc 0 but scores well under 4x (k1 caps it)
    assert(got(1L) > got(0L) && got(1L) < got(0L) * 4)
  }

  test("multi-term docs outrank single-term docs of similar length") {
    val got = Bm25.search(docs.toDF("doc_id", "text"),
        Seq("spark", "vector", "hash"))
      .collect().map(r => r.getAs[Long]("doc_id")).toSeq
    assert(got.head == 5L, s"doc 5 matches all three terms: $got")
  }
}
