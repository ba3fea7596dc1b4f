package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The df-capped inverted-index join: exact scores, one-sided candidate
  * approximation, identical to the uncapped operator when the cap is
  * loose. */
class DedupCappedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val hot = "the common header phrase appears everywhere here"
  private lazy val docs = Seq(
    (1L, s"$hot unique alpha body one two three four five six"),
    (2L, s"$hot unique alpha body one two three four five seven"),
    (3L, s"$hot totally different tail about columnar engines"),
    (4L, s"$hot another unrelated ending with vectorized readers"))
    .toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("loose cap reproduces the uncapped operator exactly") {
    val uncapped = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    val capped = pairs(
      Dedup.ngramJaccardPairsCapped(docs, "doc_id", "text", maxDf = 100, 0.5))
    assert(uncapped == capped && uncapped.contains((1L, 2L)))
  }

  test("tight cap drops hot shingles from candidate generation only") {
    // cap 2: the shared-header shingles (df=4) stop generating
    // candidates; docs 1-2 still meet through their unique-body shingles
    // and their RESCORED jaccard is unchanged (full sets)
    val capped = Dedup.ngramJaccardPairsCapped(
      docs, "doc_id", "text", maxDf = 2, 0.5)
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
    val c = capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val u = uncapped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(c.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(c.toSet.subsetOf(u.toSet), "scores must be exact, not capped")
  }

  test("simhash group cap: first-maxGroup members only, exact hammings, loose cap = uncapped") {
    // 8 exact clones (one signature group) + one distinct near doc
    val clones = (1L to 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val corpus = (clones :+ (9L -> "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Dedup.simhashPairs(corpus, "doc_id", "text", maxGroup = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == uncapped, "loose cap must reproduce the uncapped output")
    val capped = Dedup.simhashPairs(corpus, "doc_id", "text", maxGroup = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // intra pairs only among the first 3 clone ids
    val intra = capped.filter(_._3 == 0).map(t => (t._1, t._2)).toSet
    assert(intra == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"group cap must keep the first 3 members: $intra")
    // cross pairs to doc 9 expand only from the kept members
    val cross = capped.filter(t => t._2 == 9L || t._1 == 9L)
    assert(cross.map(t => math.min(t._1, t._2)).toSet.subsetOf(Set(1L, 2L, 3L)),
      s"cross expansion must use kept members only: ${cross.toSeq}")
    assert(capped.map(t => (t._1, t._2)).toSet.subsetOf(uncapped),
      "one-sided contract: capped pairs are a subset with exact hammings")
  }

  test("the cap bounds candidate volume quadratically on a hot corpus") {
    // 120 docs all sharing one stopword phrase, each with a unique tail:
    // the uncapped inverted index meets every pair through the hot
    // shingles — C(120,2) = 7140 candidates — while the capped operator
    // admits only pairs sharing a RARE shingle. threshold=0 surfaces the
    // raw candidate sets through the public API.
    val phrase = "super sale this week only in every store"
    val corpus = (1L to 120L).map(i =>
      (i, s"$phrase item number $i costs exactly $i crowns today"))
      .toDF("doc_id", "text")
    val uncapped =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.0).count()
    val capped = Dedup.ngramJaccardPairsCapped(
      corpus, "doc_id", "text", maxDf = 10, 0.0).count()
    assert(uncapped == 120L * 119 / 2, "hot shingles meet every pair")
    // the unique per-doc tails share nothing below the cap, so the
    // entire quadratic candidate set came from the hot phrase — capped
    // candidate volume collapses to zero
    assert(capped == 0,
      s"capped candidates must collapse: $capped vs $uncapped")
    // the DEFAULT cap (floor 64) BINDS on this corpus (phrase df = 120):
    // the at-scale entry prunes the same quadratic blowup unaided
    val atScale =
      Dedup.ngramJaccardPairsAtScale(corpus, "doc_id", "text", 0.0).count()
    assert(atScale == 0, s"default cap must engage: $atScale")
    // ...and stays SLACK (output identical to uncapped) once the hot
    // phrase's df (40) sits under the floor
    val small = corpus.filter(col("doc_id") <= 40)
    val smallUncapped =
      Dedup.ngramJaccardPairs(small, "doc_id", "text", 0.0).count()
    val smallAtScale =
      Dedup.ngramJaccardPairsAtScale(small, "doc_id", "text", 0.0).count()
    assert(smallUncapped == 40L * 39 / 2 && smallAtScale == smallUncapped)
  }

  test("LSH band-bucket cap prunes a giant homogeneous cluster") {
    // 50 near-identical docs (one shared template, unique last word)
    // collapse into the same band buckets, plus one genuinely distinct
    // pair elsewhere. With the bucket cap forced under the cluster
    // size, the O(cluster^2) fan-out is pruned while the distinct
    // pair's bucket stays admitted.
    val template = "identical template body repeated across the corpus"
    val cluster = (1L to 50L).map(i => (i, s"$template tail"))
    val others = Seq(
      (900L, "a wholly different document about vectorized execution z"),
      (901L, "a wholly different document about vectorized execution y"))
    val corpus = (cluster ++ others).toDF("doc_id", "text")
    val unlimited =
      Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5).count()
    val capped =
      Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5, maxBucket = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unlimited >= 50L * 49 / 2, "cluster pairs dominate uncapped")
    assert(capped == Set((900L, 901L)),
      "hot buckets pruned; small buckets unaffected")
  }

  // --- substring dup spans (Lee et al. semantics, df-capped index) ---

  /** 6 docs with a distinct lead word, a shared 7-token body run (too
    * short to form an L=8 gram alone) and a shared 10-token hot tail —
    * every duplicated gram of these docs has df = 6. Plus one exact-dup
    * pair whose 3 grams have df = 2. */
  private lazy val spanDocs = {
    val tail = "visit our shop for the best offers in town today"
    val leads = Seq("alpha", "bravo", "china", "delta", "echos", "fanta")
    val hotDocs = leads.zipWithIndex.map { case (w, i) =>
      ((i + 1).toLong, s"$w body words go here quite long enough $tail")
    }
    val dupText =
      "masked parrot sings under yellow lanterns beside quiet rivers nightly"
    (hotDocs ++ Seq((100L, dupText), (101L, dupText)))
      .toDF("doc_id", "text")
  }

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "start_tok", "end_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def coverage(spans: Set[(Long, Long, Long)]): Set[(Long, Long)] =
    spans.flatMap { case (d, s, e) => (s to e).map(p => d -> p) }

  test("substring spans: loose cap reproduces the windowed form exactly") {
    val joined = spanSet(Dedup.substringDupSpans(
      spanDocs, "doc_id", "text", l = 8, maxDf = Long.MaxValue))
    val windowed = spanSet(Dedup.substringDupSpansWindowed(
      spanDocs, "doc_id", "text", l = 8))
    assert(joined == windowed && joined.nonEmpty)
  }

  test("substring spans: tight cap drops hot-gram coverage one-sidedly") {
    val uncapped = spanSet(Dedup.substringDupSpansWindowed(
      spanDocs, "doc_id", "text", l = 8))
    val capped = spanSet(Dedup.substringDupSpans(
      spanDocs, "doc_id", "text", l = 8, maxDf = 4))
    // precondition: the hot tail flags the 6 hot docs uncapped
    assert(uncapped.exists(_._1 == 1L), "hot docs must be flagged uncapped")
    // the exact-dup pair's grams (df=2) survive the cap: full-doc spans
    assert(capped == Set((100L, 1L, 10L), (101L, 1L, 10L)),
      s"only the rare-gram dup pair survives: $capped")
    // one-sided: capped coverage is a subset of uncapped coverage —
    // a dropped gram is still duplicated, so no false spans appear
    assert(coverage(capped).subsetOf(coverage(uncapped)))
  }

  test("a pair sharing ONLY hot shingles is the documented one-sided miss") {
    // at a low threshold docs 3-4 qualify through the shared header
    // alone; with the header capped out they never become candidates
    val uncapped = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.15))
    val capped = pairs(
      Dedup.ngramJaccardPairsCapped(docs, "doc_id", "text", maxDf = 2, 0.15))
    assert(uncapped.contains((3L, 4L)), "precondition: header alone qualifies")
    assert(!capped.contains((3L, 4L)), "hot-only pair must be the miss")
    assert(capped.contains((1L, 2L)), "rare-shingle pairs survive")
  }
}
