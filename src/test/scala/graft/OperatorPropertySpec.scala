package graft

import graft.operators.{AsOfJoin, ConnectedComponents}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.util.Random

/** Randomized model checks for the composed operators: each Spark
  * implementation is compared against a direct single-machine reference
  * model on seeded random inputs (deterministic across runs). */
class OperatorPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("native SimhashSig equals the lambda formulation, unicode included") {
    val rnd = new Random(7)
    val alphabet = Vector("mleko", "čerstvé", "sýr", "the", "a1-b", "x",
      "žluťoučký", "item", "price", "29,90", "Kč", "®", "data")
    val docs = (0L until 60L).map { id =>
      val n = rnd.nextInt(30)
      val words = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      (id, words.mkString(" "))
    } :+ (999L, "") :+ (1000L, "   ") // empty and blank docs
    val df = docs.toDF("doc_id", "text")
    val native = graft.dedup.Dedup.simhash(df, "doc_id", "text")
    val lambda = graft.dedup.Dedup.simhashLambda(df, "doc_id", "text")
    assert(native.except(lambda).isEmpty && lambda.except(native).isEmpty,
      "codegen'd SimhashSig must be bit-identical to the built-ins fold")
  }

  test("native MinhashSig equals the lambda formulation, unicode included") {
    val rnd = new Random(11)
    val alphabet = Vector("mleko", "čerstvé", "sýr", "the", "a1-b", "x",
      "žluťoučký", "item", "price", "29,90", "Kč", "®", "data", "one", "two")
    val docs = (0L until 60L).map { id =>
      val n = 3 + rnd.nextInt(40) // >= ShingleSize words -> non-empty sets
      val words = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
      (id, words.mkString(" "))
    }
    val sets = graft.dedup.Dedup.docShingleSets(
      docs.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    val native = graft.dedup.Dedup.minhashSignaturesFromSets(sets)
    val lambda = graft.dedup.Dedup.minhashSignaturesFromSetsLambda(sets)
    assert(native.except(lambda).isEmpty && lambda.except(native).isEmpty,
      "codegen'd MinhashSig must be value-identical to the built-ins fold")
    assert(native.count() == 60)
  }

  test("native WinnowSig equals the lambda formulation, unicode included") {
    val rnd = new Random(13)
    val chars = "abc čž .,-XY®"
    val docs = (0L until 50L).map { id =>
      val n = rnd.nextInt(60) // includes docs below the one-window minimum
      (id, Seq.fill(n)(chars(rnd.nextInt(chars.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val native = graft.analysis.TextAnalysis.winnowSummary(df, "doc_id", "text")
    val lambda = graft.analysis.TextAnalysis
      .winnowSummaryLambda(df, "doc_id", "text")
    assert(native.except(lambda).isEmpty && lambda.except(native).isEmpty,
      "codegen'd WinnowSig must be value-identical to the built-ins fold")
  }

  test("connected components match union-find on random graphs") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(50)
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }

      // reference model: union-find with min-root normalization
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (a, b) => union(a, b) }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap

      val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (${edges.length} edges)")
    }
  }

  test("as-of joins match a per-row reference scan on random series") {
    val rnd = new Random(7)
    val left = Seq.fill(60)(
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
    val right = Seq.fill(60)(
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(1000).toString))
      // de-dup (key, ts) so the reference pick is unambiguous
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq

    val lDf = left.toDF("k", "ts")
    val rDf = right.toDF("k", "ts", "v")

    def reference(forward: Boolean): Map[(Long, Timestamp), Option[String]] =
      left.map { case (k, ts) =>
        val cands = right.filter(r => r._1 == k &&
          (if (forward) !r._2.before(ts) else !r._2.after(ts)))
        val pick =
          if (cands.isEmpty) None
          else Some(
            (if (forward) cands.minBy(_._2.getTime) else cands.maxBy(_._2.getTime))._3)
        (k, ts) -> pick
      }.toMap

    def spark2map(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)) -> Option(r.getString(2)))
        .toMap

    val back = spark2map(AsOfJoin.backward(lDf.distinct(), rDf, "k", "ts", Seq("v")))
    val fwd = spark2map(AsOfJoin.forward(lDf.distinct(), rDf, "k", "ts", Seq("v")))
    val refB = reference(forward = false)
    val refF = reference(forward = true)
    left.distinct.foreach { key =>
      assert(back(key) == refB(key), s"backward mismatch at $key")
      assert(fwd(key) == refF(key), s"forward mismatch at $key")
    }
  }

  test("contamination matches a direct shingle-overlap reference") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(29)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val all = (0L until 50L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = all.toDF("doc_id", "text")
    val corpus = df.filter(col("doc_id") % 5 =!= 0)
    val evalSet = df.filter(col("doc_id") % 5 === 0)
    val got = graft.dedup.Dedup
      .contamination(corpus, evalSet, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: distinct word-3-shingles, set intersection sizes
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString("|")).toSet
    val evalSh = all.filter(_._1 % 5 == 0).flatMap(t => sh(t._2)).toSet
    val exp = all.filter(_._1 % 5 != 0)
      .map { case (id, t) => id -> sh(t).count(evalSh.contains).toLong }
      .filter(_._2 >= 2).toMap
    assert(got == exp)
  }

  test("corpus mix: weights drive rates, zero-weight sources vanish") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(31)
    val docs = (0L until 300L).map { id =>
      (id, Seq.fill(5 + rnd.nextInt(20))("w" + rnd.nextInt(50)).mkString(" "),
        "s" + (id % 3))
    }.toDF("doc_id", "text", "source")
    val out = graft.analysis.CorpusMix.summary(docs, "doc_id", "text",
        "source", Map("s0" -> 900000L, "s1" -> 100000L, "s2" -> 0L),
        defaultPpm = 0L, budgetPpm = 500000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains("s2"), "zero-weight source must be dropped")
    // s0 gets 90% of half the corpus ~ 1.35x its own tokens -> clamped
    assert(out("s0")._2 == 1000000L, s"s0 rate: ${out("s0")}")
    // s1 gets 10% of half ~ 15% of its tokens -> a real partial rate
    assert(out("s1")._2 > 0 && out("s1")._2 < 1000000L,
      s"s1 rate: ${out("s1")}")
    // determinism: a second run returns the identical summary
    val again = graft.analysis.CorpusMix.summary(docs, "doc_id", "text",
        "source", Map("s0" -> 900000L, "s1" -> 100000L, "s2" -> 0L),
        defaultPpm = 0L, budgetPpm = 500000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == out)
  }

  test("native BloomMightContainLong equals direct mightContain probes") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(17)
    val members = Seq.fill(500)(rnd.nextLong() % 100000L).distinct
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    members.foreach(bf.putLong)
    // probe members (must all pass — no false negatives) and a disjoint
    // range (false positives allowed; must MATCH the driver-side filter
    // bit for bit, since the expression is the same filter shipped as
    // bytes)
    val probes = (members ++ (200000L until 201000L)).toDF("k")
    val got = probes
      .withColumn("m",
        graft.functions.BloomMightContain.bloom_might_contain_long(col("k"), bf))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.collect().map(_.getLong(0)).foreach { k =>
      assert(got(k) == bf.mightContainLong(k), s"mismatch at $k")
    }
    members.foreach(k => assert(got(k), s"false negative at member $k"))
  }
}
