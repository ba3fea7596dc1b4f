package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.TextAnalysis
import graft.dedup.SemanticDedup
import graft.sim.{KMeans, Similarity}

/** Properties of the round-6 wave: banded-LSH embedding near-dup,
  * SemDeDup-style semantic dedup, winnow span dedup, and sliding-window
  * chunking. */
class SemanticOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vectors + two planted
    * identical pairs (ids 100/101 and 102/103). */
  private lazy val emb: DataFrame = {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Seq.tabulate(Similarity.Dim) { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toDouble / (1L << 24).toDouble - 0.5).toFloat
      }
    }
    val base = (0L until 40L).map(i => (i, vec(i)))
    val twins = Seq(100L -> vec(7L), 101L -> vec(7L),
      102L -> vec(13L), 103L -> vec(13L))
    (base ++ twins).toDF("vec_id", "embedding")
  }

  // ---- banded-LSH near-dup pairs ------------------------------------

  test("lshNearDupPairs emits a subset of the exact pair set, same sims") {
    val exact = Similarity.similarPairs(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshNearDupPairs(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"LSH invented pair $pair")
      assert(exact(pair) == sim, s"sim mismatch for $pair")
    }
  }

  test("lshNearDupPairs always finds identical vectors (recall floor)") {
    val got = Similarity.lshNearDupPairs(emb, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors share every band bucket — missing them is a bug
    assert(got.contains((100L, 101L)))
    assert(got.contains((102L, 103L)))
  }

  test("lshNearDupPairs emits each pair once despite multi-band hits") {
    val rows = Similarity.lshNearDupPairs(emb, 0.99)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
  }

  test("lshNearDupPairs bucket cap is opt-in and one-sided") {
    // 12 identical vectors (ids 200-211) land whole in one bucket per
    // band; with maxBucket = 8 every intra-cluster pair is the
    // documented one-sided miss, while the planted twins (size-2
    // buckets) stay admitted
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Seq.tabulate(Similarity.Dim) { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toDouble / (1L << 24).toDouble - 0.5).toFloat
      }
    }
    val cluster = (200L until 212L).map(i => (i, vec(55L)))
    val df = emb.unionAll(cluster.toDF("vec_id", "embedding"))
    val loose = Similarity.lshNearDupPairs(df, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Similarity.lshNearDupPairs(df, 0.99, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(loose), "cap invented pairs")
    assert(loose.contains((200L, 201L)), "uncapped must see the cluster")
    assert(!capped.exists { case (a, b) => a >= 200L && b >= 200L },
      "over-full bucket must be excluded when the cap binds")
    assert(capped.contains((100L, 101L)) && capped.contains((102L, 103L)),
      "small buckets stay admitted under the cap")
  }

  // ---- semantic dedup -----------------------------------------------

  test("semanticDedup drop rule matches a brute-force within-cluster check") {
    val k = 3; val iters = 2; val thr = 0.99
    val out = SemanticDedup.semanticDedup(emb, k, iters, thr)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out.size == emb.count())

    // recompute: assignment under the trained model, then quadratic scan
    val model = KMeans.fit(emb, k, iters)
    val assigned = KMeans.assign(emb, KMeans.centroidsOf(model))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { case (id, (cid, kept)) =>
      assert(cid == assigned(id), s"cluster mismatch for $id")
      val hasLowerNeighbor = assigned.exists { case (other, ocid) =>
        other < id && ocid == cid && cos(vecs(other), vecs(id)) >= thr
      }
      assert(kept == !hasLowerNeighbor, s"keep rule wrong for $id")
    }
    // the planted twins must actually exercise the drop path: 100/101
    // duplicate vec 7 and 102/103 duplicate vec 13, so all four lose to
    // the lower-id original, which itself stays
    assert(Seq(100L, 101L, 102L, 103L).forall(id => !out(id)._2))
    assert(out(7L)._2 && out(13L)._2)
  }

  test("semanticDedup cluster cap is opt-in and one-sided") {
    val k = 3; val iters = 2; val thr = 0.99
    // a cap no cluster exceeds must be a no-op (the opt-in contract)
    val uncapped = SemanticDedup.semanticDedup(emb, k, iters, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    val slack = SemanticDedup
      .semanticDedup(emb, k, iters, thr, maxCluster = emb.count())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(uncapped == slack)

    // a binding cap between the smallest and largest cluster: clusters
    // over it emit NO losers (their members all kept — one-sided miss),
    // admitted clusters keep their exact drops
    val sizes = uncapped.groupBy(_._2).map { case (c, m) => c -> m.size }
    assert(sizes.values.min < sizes.values.max, "fixture needs skew")
    val cap = sizes.values.min.toLong
    val capped = SemanticDedup
      .semanticDedup(emb, k, iters, thr, maxCluster = cap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    capped.foreach { case (id, (cid, kept)) =>
      if (sizes(cid) > cap)
        assert(kept, s"false drop in over-cap cluster: $id")
      else {
        val u = uncapped.find(_._1 == id).get
        assert(kept == u._3, s"admitted cluster changed keep for $id")
      }
    }

    intercept[IllegalArgumentException](
      SemanticDedup.semanticDedup(emb, k, iters, thr, maxCluster = 0))
  }

  // ---- winnow span dedup --------------------------------------------

  private lazy val spanDocs = {
    val tail = (1 to 30).map(i => s"word$i").mkString(" ")
    Seq(
      (1L, s"a distinctive copied passage of substantial length $tail"),
      // doc 2 embeds doc 1's passage inside fresh surroundings
      (2L, s"fresh opening text a distinctive copied passage of substantial length $tail and a fresh ending"),
      (3L, "completely unrelated content about parquet row groups"),
      (4L, "another unrelated document concerning shuffle partitions"))
      .toDF("doc_id", "text")
  }

  test("winnowSharedSpans detects the planted copied span") {
    val got = TextAnalysis.winnowSharedSpans(spanDocs, "doc_id", "text",
        minShared = 5, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), s"planted pair missing: $got")
    assert(got((1L, 2L)) >= 5)
    assert(!got.keySet.exists { case (a, b) => a >= 3L || b >= 3L },
      s"unrelated docs paired: $got")
  }

  test("winnowSharedSpans df cap is one-sided") {
    val loose = TextAnalysis.winnowSharedSpans(spanDocs, "doc_id", "text",
        minShared = 1, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val capped = TextAnalysis.winnowSharedSpans(spanDocs, "doc_id", "text",
        minShared = 1, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    capped.foreach { case (pair, shared) =>
      assert(loose.contains(pair))
      assert(shared <= loose(pair), s"cap RAISED shared for $pair")
    }
  }

  // ---- product quantization -----------------------------------------

  test("PQ: ADC scores re-derive from codebooks + codes, ranks respect ties") {
    import graft.sim.{KMeans, ProductQuantizer => PQ}
    val out = PQ.adcTopK(emb, nQueries = 5, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 5 * 3)

    // independent re-derivation: quantize, train, encode in scala space
    val books = PQ.train(emb)
    val codes = PQ.encode(emb, books).collect()
      .map(r => r.getLong(0) -> (0 until PQ.Segments).map(s =>
        r.getLong(1 + s))).toMap
    val qvecs = KMeans.quantized(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def adc(qid: Long, cid: Long): Long =
      (0 until PQ.Segments).map { s =>
        val qseg = qvecs(qid).slice(s * PQ.SegDim, (s + 1) * PQ.SegDim)
        val cent = books(s).find(_._1 == codes(cid)(s)).get._2
        qseg.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    out.foreach { case (qid, _, cid, got) =>
      assert(got == adc(qid, cid), s"ADC mismatch for ($qid, $cid)")
    }
    // ranks sort by (adc, cid) within each query
    out.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 < b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
    // every vector encodes to a codebook member per segment
    codes.values.foreach(cs => cs.zipWithIndex.foreach { case (c, s) =>
      assert(books(s).exists(_._1 == c), s"code $c not in book $s")
    })
  }

  // ---- sliding-window chunking --------------------------------------

  test("corpus_chunk covers every token with the declared stride") {
    import graft.relational.TrainingDataQueries.{ChunkW, ChunkS}
    val q = SparkEntry.queries("corpus_chunk")
    val rows = q(spark, "/root/testdata/sf0.001")
      .select("doc_id", "chunk_no", "start_tok", "n_tok")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val multi = rows.groupBy(_._1).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture never fans out — window too large")
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L) // first chunk starts at token 0
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == ChunkS) // fixed stride
          // overlap: previous chunk reaches past the next chunk's start
          assert(a._3 + a._4 > b._3)
        case _ =>
      }
      // chunks cover the whole doc: every chunk except the last is full
      sorted.init.foreach(c => assert(c._4 == ChunkW))
    }
  }
}
