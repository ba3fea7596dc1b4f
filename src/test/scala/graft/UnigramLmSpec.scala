package graft

import graft.analysis.UnigramLm
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** UnigramLm.fit must agree with an INDEPENDENT in-memory hard-EM
  * unigram trainer (plain maps and loops, no Spark, its own DP) on a
  * fixture vocabulary — the BpeTrainSpec discipline: the distributed
  * implementation and a from-scratch reference derive the same model,
  * so an error in either shows up as a mismatch. */
class UnigramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** From-scratch reference: same published algorithm (seed = top-K
    * substrings + single chars; hard-EM with longest-piece-tiebreak
    * Viterbi; micro-nat costs), written independently with plain
    * collections. */
  private def referenceFit(
      words: Seq[(String, Long)], rounds: Int): Map[String, (Long, Long)] = {
    val w = words.filter { case (s, _) =>
      s.nonEmpty && s.length <= UnigramLm.MaxWordLen }
    // seed counts: every substring of length 1..MaxPieceLen
    val subCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((word, cnt) <- w; i <- 0 until word.length;
         l <- 1 to math.min(UnigramLm.MaxPieceLen, word.length - i)) {
      val p = word.substring(i, i + l)
      subCnt(p) = subCnt.getOrElse(p, 0L) + cnt
    }
    val topK = subCnt.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(UnigramLm.SeedTopK).map(_._1).toSet
    val seed = subCnt.filter { case (p, _) =>
      topK.contains(p) || p.length == 1 }
    def costs(cnt: Map[String, Long]): Map[String, Long] = {
      val total = cnt.values.sum
      cnt.map { case (p, c) =>
        p -> math.round(math.log(total * 1.0 / c) * 1e6) }
    }
    // own Viterbi: forward min-cost, backward longest-piece choice
    def segment(word: String, cost: Map[String, Long]): Seq[String] = {
      val inf = Long.MaxValue / 4
      val best = Array.fill(word.length + 1)(inf)
      best(0) = 0
      for (j <- 1 to word.length;
           l <- 1 to math.min(UnigramLm.MaxPieceLen, j)) {
        val c = cost.get(word.substring(j - l, j))
        if (c.isDefined && best(j - l) < inf)
          best(j) = math.min(best(j), best(j - l) + c.get)
      }
      var pos = word.length
      var acc = List.empty[String]
      while (pos > 0) {
        val l = (math.min(UnigramLm.MaxPieceLen, pos) to 1 by -1)
          .find { l =>
            val p = word.substring(pos - l, pos)
            cost.contains(p) && best(pos - l) < inf &&
              best(pos - l) + cost(p) == best(pos)
          }.get
        acc = word.substring(pos - l, pos) :: acc
        pos -= l
      }
      acc
    }
    var cost = costs(seed.toMap)
    var cnt = Map.empty[String, Long]
    for (_ <- 1 to rounds) {
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((word, c) <- w; piece <- segment(word, cost))
        used(piece) = used.getOrElse(piece, 0L) + c
      cnt = used.toMap
      cost = costs(cnt)
    }
    cnt.map { case (p, c) => p -> (c, cost(p)) }
  }

  private val fixture = Seq(
    ("internationalization", 3L), // dropped: > MaxWordLen
    ("train", 40L), ("training", 25L), ("trainer", 10L),
    ("rain", 30L), ("raining", 12L), ("gain", 8L),
    ("spark", 20L), ("sparks", 6L), ("ing", 15L),
    ("a", 50L), ("an", 22L), ("ana", 4L))

  test("fit matches the independent in-memory trainer") {
    val got = UnigramLm.fit(fixture.toDF("word", "cnt"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = referenceFit(fixture, UnigramLm.Rounds)
    assert(got.keySet == want.keySet,
      s"piece sets differ: only-got=${got.keySet -- want.keySet} " +
        s"only-want=${want.keySet -- got.keySet}")
    for ((p, (c, s)) <- want)
      assert(got(p) == ((c, s)), s"piece '$p': got ${got(p)}, want ($c, $s)")
  }

  test("fit is deterministic across runs and partitionings") {
    val a = UnigramLm.fit(fixture.toDF("word", "cnt")).collect().toSeq
    val b = UnigramLm.fit(fixture.toDF("word", "cnt").repartition(7))
      .collect().toSeq
    assert(a == b)
  }

  test("frequent multi-char pieces win over char-by-char splits") {
    val got = UnigramLm.fit(fixture.toDF("word", "cnt"))
      .collect().map(r => r.getString(0)).toSet
    // 'train'/'rain'/'ing' dominate the fixture — the trained vocab
    // must keep multi-char pieces for them rather than dissolving
    // everything into letters
    assert(got.exists(p => p.length >= 3),
      s"no multi-char piece survived: $got")
  }
}
