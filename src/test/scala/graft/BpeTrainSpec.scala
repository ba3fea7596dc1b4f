package graft

import graft.analysis.BpeTrain
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning vs an INDEPENDENT in-memory reference
  * implementation (direct maps over symbol vectors — no shared code
  * with the Spark path), plus the Sennrich et al. paper corpus whose
  * first merges are known. The hash gate against DuckDB is
  * `corpus_bpe`. */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Reference BPE trainer: greedy left-to-right merge application,
    * tie-break count DESC then (s1, s2) ASC. */
  private def refBpe(
      words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var forms: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ BpeTrain.EndOfWord) -> c
    }
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      forms.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      forms = forms.groupMapReduce { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
      (a, b, n)
    }
  }

  private def fitPairs(words: Map[String, Long], rounds: Int) =
    BpeTrain.fit(
        words.toSeq.toDF("word", "cnt"), rounds)
      .orderBy("round")
      .collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("merged"),
        r.getAs[Long]("n")))
      .toSeq

  test("paper corpus: known first merges (es, est, est</w>)") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val got = fitPairs(words, 3)
    assert(got == Seq(
      ("e s", "es", 9L), ("es t", "est", 9L),
      (s"est ${BpeTrain.EndOfWord}", s"est${BpeTrain.EndOfWord}", 9L)))
  }

  test("matches the independent reference on varied corpora") {
    val corpora = Seq(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      // consecutive-run regime: greedy leftmost merge order matters
      Map("aaaa" -> 3L, "aaab" -> 2L, "abab" -> 4L, "banana" -> 7L),
      Map("a" -> 10L, "ab" -> 5L, "abc" -> 2L, "cabbage" -> 1L))
    corpora.foreach { words =>
      val exp = refBpe(words, 6).map { case (a, b, n) => (s"$a $b", a + b, n) }
      assert(fitPairs(words, 6) == exp, s"corpus: $words")
    }
  }

  /** Reference ENCODE: apply [[refBpe]]'s merges greedily in round
    * order, then count tokens over the final forms. */
  private def refEncode(
      words: Map[String, Long], rounds: Int): Map[String, Long] = {
    val merges = refBpe(words, rounds)
    var forms: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ BpeTrain.EndOfWord) -> c
    }
    merges.foreach { case (a, b, _) =>
      forms = forms.groupMapReduce { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
    }
    forms.toSeq
      .flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
  }

  test("tokenizeDocs segments each doc with the corpus-trained merges") {
    val docs = Seq(
      (0L, Seq("low", "low", "newest")),
      (1L, Seq("lower", "widest", "low")),
      (2L, Seq("newest", "newest")))
    val vocab = docs.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merges = refBpe(vocab, 4).map { case (a, b, _) => (a, b) }
    def segment(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector :+ BpeTrain.EndOfWord
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val expected = docs.flatMap { case (id, ws) =>
      ws.flatMap(segment).groupBy(identity)
        .map { case (t, os) => (id, t) -> os.size.toLong }
    }.toMap
    val docWords = docs
      .flatMap { case (id, ws) => ws.groupBy(identity)
        .map { case (w, os) => (id, w, os.size.toLong) } }
      .toDF("doc_id", "word", "dn")
    val words = vocab.toSeq.toDF("word", "cnt")
    val got = BpeTrain.tokenizeDocs(docWords, words, 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) ->
        r.getAs[Long]("n"))
      .toMap
    assert(got == expected)
  }

  test("tokenizeDocs segments UNSEEN words by merge replay (no OOV drop)") {
    // train on a lowest/newest vocab; tokenize docs containing words the
    // training never saw — they must segment by replaying the learned
    // merges over the char split, not vanish (the pre-r9 inner join
    // dropped them silently)
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val rounds = 4
    val merges = refBpe(vocab, rounds).map { case (a, b, _) => (a, b) }
    def segment(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector :+ BpeTrain.EndOfWord
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    // "lowest" composes trained merges on an unseen word; "zq" shares
    // no trained symbol pair and must fall back to pure chars
    val docWords = Seq((7L, "lowest", 2L), (7L, "zq", 1L), (8L, "low", 3L))
      .toDF("doc_id", "word", "dn")
    val words = vocab.toSeq.toDF("word", "cnt")
    val got = BpeTrain.tokenizeDocs(docWords, words, rounds)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token")) ->
        r.getAs[Long]("n"))
      .toMap
    val expected = Seq(
      7L -> (segment("lowest").map(_ -> 2L) ++ segment("zq").map(_ -> 1L)),
      8L -> segment("low").map(_ -> 3L))
      .flatMap { case (id, ts) =>
        ts.groupBy(_._1).map { case (t, os) => (id, t) -> os.map(_._2).sum }
      }.toMap
    assert(got == expected)
    assert(got.keys.exists(_._2 == "z"), "unseen chars must surface")
  }

  test("encodeTokens matches the reference token frequencies") {
    val corpora = Seq(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      Map("aaaa" -> 3L, "aaab" -> 2L, "abab" -> 4L, "banana" -> 7L))
    corpora.foreach { words =>
      val got = BpeTrain
        .encodeTokens(words.toSeq.toDF("word", "cnt"), 6)
        .collect()
        .map(r => r.getAs[String]("token") -> r.getAs[Long]("n"))
        .toMap
      assert(got == refEncode(words, 6), s"corpus: $words")
    }
  }
}
