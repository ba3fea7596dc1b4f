package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{HybridSearch, RankEval}

/** Search-fusion layer vs independent in-memory references: the MMR
  * greedy loop and the nDCG arithmetic are re-implemented here in
  * plain Scala (same integer grids, no Spark) and must agree exactly;
  * RRF is checked on its defining invariants (score = sum of rank
  * reciprocals, fusion ordering).
  */
class HybridSearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // 8 vectors, 4 dims — two tight clusters plus two stragglers, so
  // MMR's redundancy penalty visibly reorders the similarity ranking
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1.00f, 0.05f, 0.00f, 0.00f),
    1L -> Seq(0.98f, 0.10f, 0.02f, 0.00f),
    2L -> Seq(0.97f, 0.08f, 0.01f, 0.01f),
    3L -> Seq(0.96f, 0.12f, 0.00f, 0.02f),
    4L -> Seq(0.10f, 0.99f, 0.05f, 0.00f),
    5L -> Seq(0.08f, 0.97f, 0.08f, 0.01f),
    6L -> Seq(0.30f, 0.30f, 0.90f, 0.10f),
    7L -> Seq(0.20f, 0.10f, 0.05f, 0.95f))

  private def embDf: DataFrame = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  private def cos10k(a: Seq[Float], b: Seq[Float]): Long = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    val na = math.sqrt(ad.map(x => x * x).sum)
    val nb = math.sqrt(bd.map(x => x * x).sum)
    math.round(dot / (na * nb) * 1e4)
  }

  /** Plain-Scala greedy MMR on the 1e4 integer grid — the independent
    * reference the distributed loop must match row for row. */
  private def mmrRef(qid: Long, nCand: Int,
      k: Int): Seq[(Long, Int, Long, Long)] = {
    val byId = vecs.toMap
    val cands = vecs.map(_._1).filter(_ != qid)
      .map(c => c -> cos10k(byId(qid), byId(c)))
      .sortBy { case (c, s) => (-s, c) }
      .take(nCand)
    var rem = cands
    var sel = List.empty[(Long, Long)] // (cid, mmr)
    for (_ <- 1 to k) {
      val best = rem.map { case (c, sq) =>
        val pen =
          if (sel.isEmpty) 0L
          else sel.map(s => cos10k(byId(c), byId(s._1))).max
        (c, sq * HybridSearch.LambdaNum - pen * HybridSearch.LambdaCompl)
      }.minBy { case (c, m) => (-m, c) }
      sel = sel :+ best
      rem = rem.filterNot(_._1 == best._1)
    }
    sel.zipWithIndex.map { case ((c, m), i) => (qid, i + 1, c, m) }
  }

  test("mmr matches the in-memory greedy reference, both queries") {
    val got = HybridSearch.mmr(embDf, nQueries = 2, nCand = 5, k = 3)
      .orderBy(col("qid"), col("mrank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = mmrRef(0L, 5, 3) ++ mmrRef(1L, 5, 3)
    assert(got === want)
  }

  test("mmr first pick is the top-similarity candidate; picks distinct") {
    val rows = HybridSearch.mmr(embDf, nQueries = 1, nCand = 6, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    val byId = vecs.toMap
    val top = vecs.map(_._1).filter(_ != 0L)
      .maxBy(c => (cos10k(byId(0L), byId(c)), -c))
    assert(rows.find(_._1 == 1).map(_._2).contains(top))
    assert(rows.map(_._2).distinct.size === rows.size)
  }

  /** Plain-Scala nDCG reference mirroring both rankings. */
  private def ndcgRef(nQueries: Int,
      k: Int): Seq[(Long, Long, Long, Long)] = {
    val byId = vecs.toMap
    def int8(v: Seq[Float]): Seq[Long] = v.map { x =>
      Math.floorDiv((math.round(x.toDouble * 1000000) + 2000000) * 127,
        1000000L) - 254
    }
    (0 until nQueries).map { q =>
      val qid = q.toLong
      val others = vecs.map(_._1).filter(_ != qid)
      // truth: cosine rounded to 4 decimals, desc, tie -> smaller cid
      val truth = others
        .map(c => c -> math.rint(cos10k(byId(qid), byId(c))) / 1e4)
        .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1)
      val rel = truth.zipWithIndex
        .map { case (c, i) => c -> (k - i).toLong }.toMap
      // system: int8 dot desc, tie -> smaller cid
      val sys = others.map { c =>
        c -> int8(byId(qid)).zip(int8(byId(c)))
          .map { case (a, b) => a * b }.sum
      }.sortBy { case (c, s) => (-s, c) }.take(k).map(_._1)
      def gain(rank: Int, r: Long): Long =
        math.round(r * 1e6 / (math.log(rank + 1.0) / math.log(2.0)))
      val dcg = sys.zipWithIndex.map { case (c, i) =>
        gain(i + 1, rel.getOrElse(c, 0L)) }.sum
      val idcg = (1 to k).map(i => gain(i, (k + 1 - i).toLong)).sum
      (qid, dcg, idcg, Math.floorDiv(dcg * 1000000L, idcg))
    }
  }

  test("ndcgInt8 matches the in-memory reference") {
    val got = RankEval.ndcgInt8(embDf, nQueries = 3, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === ndcgRef(3, 4))
  }

  test("rrf scores are the sum of rank reciprocals and sorted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark vector hash spark"),
      (1L, "spark hash"),
      (2L, "vector vector"),
      (3L, "nothing relevant here"),
      (4L, "spark"),
      (5L, "hash vector spark hash"),
      (6L, "plain text"),
      (7L, "spark spark spark")).toDF("doc_id", "text")
    val out = HybridSearch.rrf(docs, embDf,
        Seq("spark", "vector", "hash"))
      .collect()
    assert(out.nonEmpty)
    var last = Long.MaxValue
    out.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rrf = r.getLong(3)
      val want = rl.map(x => 1000000L / (HybridSearch.RrfK + x))
        .getOrElse(0L) +
        rd.map(x => 1000000L / (HybridSearch.RrfK + x)).getOrElse(0L)
      assert(rrf === want, s"row $r")
      assert(rl.nonEmpty || rd.nonEmpty)
      assert(rrf <= last); last = rrf
    }
    // doc 3/6 match no term: absent from the lexical list
    val lexDocs = out.filter(!_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(!lexDocs.contains(3L) && !lexDocs.contains(6L))
  }
}
