package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.WordPiece

/** WordPiece trainer vs an independent in-memory reference (the
  * BpeTrainSpec discipline), plus the defining property: the
  * likelihood score picks co-occurrence strength over raw frequency. */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Reference trainer: same representation, same integer score, in
    * plain Scala collections. */
  private def refTrain(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var forms: Seq[(Vector[String], Long)] = words.map { case (w, c) =>
      (w.head.toString +: w.tail.map("##" + _).toVector, c)
    }
    (1 to rounds).map { r =>
      val sym = forms.flatMap { case (ss, c) => ss.map(_ -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val pair = forms.flatMap { case (ss, c) =>
        ss.sliding(2).collect { case Vector(a, b) => (a, b) -> c }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val best = pair.toSeq.map { case ((a, b), n) =>
        (a, b, n, n * WordPiece.Scale / (sym(a) * sym(b)))
      }.minBy { case (a, b, n, q) => (-q, -n, a + " " + b) }
      val (a, b, n, q) = best
      forms = forms.map { case (ss, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
            out += a + b.drop(2); i += 2
          } else { out += ss(i); i += 1 }
        }
        (out.result(), c)
      }
      (r, s"$a $b", a + b.drop(2), n, q)
    }
  }

  private def sparkTrain(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] =
    WordPiece.fit(words.toDF("word", "cnt"), rounds)
      .orderBy("round")
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))

  test("likelihood beats frequency: rare-but-exclusive pair merges first") {
    // "a ##b" is the most FREQUENT pair (n=9) but its symbols are
    // popular; "a ##a" co-occurs exclusively — WordPiece merges it
    val words = Seq(("aa", 2L), ("ab", 9L), ("cb", 8L))
    val got = sparkTrain(words, 1)
    assert(got.head._2 === "a ##a")
    assert(got.head._3 === "aa")
    assert(got.head._4 === 2L)
  }

  test("merged symbols keep the left's continuation mark") {
    // 'xyz' x 5: first merge decides between (x,##y) and (##y,##z);
    // whichever wins, a ## right side always drops its mark
    val got = sparkTrain(Seq(("xyz", 5L)), 2)
    got.foreach { case (_, pair, merged, _, _) =>
      val Array(l, rgt) = pair.split(" ")
      assert(merged === l + rgt.drop(2))
    }
    // after two merges the word is one token: 'x' + '##yz' or
    // '##y'+'##z' first — final vocab form either way is "xyz"
    val toks = WordPiece.encodeTokens(
        Seq(("xyz", 5L)).toDF("word", "cnt"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(toks === Seq(("xyz", 5L)))
  }

  test("trainer matches the in-memory reference on a mixed corpus") {
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("lowest", 6L),
      ("new", 3L), ("newer", 6L), ("wider", 3L), ("widest", 2L))
    assert(sparkTrain(words, 6) === refTrain(words, 6))
  }

  test("greedy segmentation is maximum munch with ## continuations") {
    val vocab = Set("un", "##aff", "##able", "##affable", "a", "##f")
    // longest-first at every position: un + ##affable (not ##aff...)
    assert(WordPiece.greedySegment("unaffable", vocab) ===
      Some(Seq("un", "##affable")))
    // a position with no match makes the WHOLE word [UNK]
    assert(WordPiece.greedySegment("unz", vocab) === None)
    // word-initial position only matches BARE pieces ("##aff" can't
    // start a word): "affable" falls back to a + ##f + ##f + ##able
    assert(WordPiece.greedySegment("affable", vocab) ===
      Some(Seq("a", "##f", "##f", "##able")))
  }

  test("held-out segmentation matches a reference greedy walk") {
    val train = Seq(("low", 5L), ("lowest", 6L), ("newer", 3L),
      ("wider", 3L)).toDF("word", "cnt")
    val held = Seq("lower", "low", "newest", "zzz")
      .toDF("word")
    val got = WordPiece.segmentHeldOut(held, train, 4)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got.contains("low") && got.contains("zzz"))
    // a word with a character never seen word-initially is [UNK]
    assert(got("zzz") === (("[UNK]", 1L)))
    // every non-UNK segmentation reassembles the word (## stripped)
    got.foreach { case (w, (seg, _)) =>
      if (seg != "[UNK]")
        assert(seg.split(" ").map(_.stripPrefix("##")).mkString === w)
    }
  }

  test("encode totals conserve word occurrences") {
    val words = Seq(("low", 5L), ("lower", 2L), ("new", 3L))
    val toks = WordPiece.encodeTokens(words.toDF("word", "cnt"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // every non-first symbol carries ##; token count per word shrinks
    // by exactly one per applied merge, and weights are preserved:
    // sum over tokens of n*len(chars) == total input chars weighted
    val gotChars = toks.map { case (t, n) => n * t.replace("#", "").length }
      .sum
    val wantChars = words.map { case (w, c) => c * w.length }.sum
    assert(gotChars === wantChars)
  }
}
