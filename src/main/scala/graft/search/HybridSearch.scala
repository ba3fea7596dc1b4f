package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Bm25
import graft.relational.Scale
import graft.sim.Similarity

/** Retrieval fusion + diversification — the layer a production search
  * stack runs ON TOP of the lexical (`bm25_search`) and dense
  * (`ann_topk_*`) rankers built in earlier waves:
  *
  *  - [[rrf]]: reciprocal-rank fusion (Cormack, Clarke & Buettcher,
  *    SIGIR 2009) of the BM25 list and a dense list seeded by
  *    pseudo-relevance feedback (the dense query is the top-1 lexical
  *    hit's embedding — "more like the best keyword match").
  *  - [[mmr]]: maximal marginal relevance re-ranking (Carbonell &
  *    Goldstein, SIGIR 1998) — greedy relevance-vs-redundancy
  *    selection over each query's ANN candidate list.
  *
  * Both stay on exact integer grids after the one rounded-cosine step
  * (RRF scores are pure rank arithmetic; MMR runs on 1e4-scaled
  * integer similarities), so the fused rankings hash-check
  * cross-engine.
  */
object HybridSearch {

  /** RRF smoothing constant (k=60 per the SIGIR 2009 evaluation). */
  val RrfK = 60
  /** Depth of each input list fed to the fusion. */
  val RrfList = 50
  /** Fused result depth. */
  val RrfOut = 20

  private def cosine4(a: Column, b: Column): Column =
    round(Similarity.cosine(a, b), 4)

  /** Cosine on the 1e4 integer grid. Explicit `round(·)` before the
    * long cast: Spark's double→long cast TRUNCATES while DuckDB's
    * rounds, so `round(x,4)*1e4` (which can render 1233.9999…) must be
    * re-rounded on BOTH sides or the grids diverge. */
  private def cosine10k(a: Column, b: Column): Column =
    round(Similarity.cosine(a, b) * 1e4).cast("long")

  /** Hybrid lexical+dense retrieval fused by reciprocal rank:
    * `rrf(d) = Σ_lists 1e6 div (RrfK + rank_list(d))` (integer — pure
    * rank arithmetic, absent-from-list contributes 0). The dense query
    * vector is chosen by pseudo-relevance feedback: the embedding of
    * the BM25 top-1 document.
    *
    * Scale shape: the BM25 side is `Bm25.search`'s one corpus scan;
    * the dense side is ONE linear pass of the embeddings table against
    * a broadcast 1-row query vector; both lists rank via the
    * range-partitioned global row number (no partitionless window) and
    * truncate to `RrfList` BEFORE the fusion join, so the full-outer
    * fusion joins two list-sized (not corpus-sized) relations. Output:
    * (doc_id, rank_lex, rank_dense, rrf) top `RrfOut`. */
  def rrf(docs: DataFrame, emb: DataFrame,
      terms: Seq[String]): DataFrame =
    rrfFromScores(Bm25.search(docs, terms),
      emb.select(col("vec_id").cast("long").as("doc_id"),
        col("embedding").cast("array<double>").as("v")))

  /** [[rrf]] from precomputed parts — `bmScores(doc_id, bm25)` (any
    * BM25 source: the batch corpus scan or a persisted incremental
    * index) and `e(doc_id, v)` dense vectors. The incremental twin
    * ([[graft.streaming.StandingSearchJob]]) fuses through this exact
    * code path, so stream and batch rankings converge by construction. */
  def rrfFromScores(bmScores: DataFrame, e: DataFrame): DataFrame = {
    val lex = Scale.globalRowNumber(bmScores,
        Seq(col("bm25").desc, col("doc_id")))
      .filter(col("rn") <= RrfList)
      .select(col("doc_id"), col("rn").as("rank_lex"))
      .localCheckpoint() // two consumers: seed lookup + fusion join
    val seed = lex.filter(col("rank_lex") === 1).select(col("doc_id"))
    val qv = e.join(broadcast(seed), Seq("doc_id"))
      .select(col("v").as("qv"))
    val dsc = e.crossJoin(broadcast(qv))
      .select(col("doc_id"), cosine4(col("v"), col("qv")).as("sim"))
    val den = Scale.globalRowNumber(dsc,
        Seq(col("sim").desc, col("doc_id")))
      .filter(col("rn") <= RrfList)
      .select(col("doc_id"), col("rn").as("rank_dense"))
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_dense"),
        expr(s"coalesce(1000000L div ($RrfK + rank_lex), 0L) + " +
          s"coalesce(1000000L div ($RrfK + rank_dense), 0L)").as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(RrfOut)
  }

  /** DuckDB twin of [[rrf]] over `docsRel(doc_id, text)` and
    * `embRel(vec_id, embedding)`. */
  def rrfOracle(docsRel: String, embRel: String,
      terms: Seq[String]): String =
    s"""WITH ${Bm25.oracleCtes(docsRel, terms)},
       |lex AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY bm25 DESC, doc_id) AS rank_lex
       |  FROM bmscore QUALIFY rank_lex <= $RrfList),
       |e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v
       |  FROM $embRel),
       |qv AS (
       |  SELECT e.v AS qv FROM e
       |  JOIN lex l ON l.doc_id = e.doc_id AND l.rank_lex = 1),
       |dsc AS (
       |  SELECT e.doc_id,
       |    round(list_cosine_similarity(e.v, q.qv), 4) AS sim
       |  FROM e CROSS JOIN qv q),
       |den AS (
       |  SELECT doc_id, row_number() OVER (
       |    ORDER BY sim DESC, doc_id) AS rank_dense
       |  FROM dsc QUALIFY rank_dense <= $RrfList)
       |SELECT doc_id, rank_lex, rank_dense,
       |  CAST(coalesce(1000000 // ($RrfK + rank_lex), 0) +
       |    coalesce(1000000 // ($RrfK + rank_dense), 0) AS BIGINT)
       |    AS rrf
       |FROM lex FULL JOIN den USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT $RrfOut""".stripMargin

  /** Candidate-list depth each query diversifies over. */
  val MmrCand = 20
  /** Diversified selections per query. */
  val MmrK = 8
  /** Relevance weight λ = LambdaNum / (LambdaNum + LambdaCompl) = 0.7;
    * kept as integers so the MMR objective stays in integer domain:
    * `mmr = 7·s(q,d) − 3·max_{s∈S} s(d,s)` on the 1e4 similarity
    * grid (a fixed ×10 rescale of the λ=0.7 objective — argmax
    * invariant). */
  val LambdaNum = 7
  val LambdaCompl = 3

  /** Exact mirror of `round(x * 1e4)` on a Column: Spark's Round is
    * BigDecimal HALF_UP (away from zero), which `math.round` (floor of
    * x+0.5) gets wrong at negative half-boundaries. */
  private def half10k(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Scalar twin of [[cosine10k]] — sequential accumulation in index
    * order, the same summation the codegen'd ArrayDot performs, so the
    * grid values are bit-identical to the Column path. */
  private def cos10kLocal(a: Array[Double], b: Array[Double]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    half10k(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4)
  }

  /** MMR diversification for every query `vec_id < nQueries`: greedy
    * `k`-step selection over that query's top-`nCand` cosine
    * candidates, maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    * (ties to the smallest cid).
    *
    * Scale shape: the greedy is sequential in k but INDEPENDENT across
    * queries, and each query's candidate list is `nCand`-bounded by
    * construction — exactly the shape for one shuffle +
    * `KeyValueGroupedDataset.flatMapGroups`: the corpus-sized scoring
    * scan runs once, the window keeps k·|queries| rows, and the
    * per-group selection (including the nCand² redundancy sims) is
    * row-local integer arithmetic. The first cut ran the greedy as k
    * rounds of qid-keyed joins — ~3 jobs per round put it at 5.99s in
    * the sf0.1 bench vs this one-exchange form (a million queries
    * would pay the same 24-job overhead; group-local, they just widen
    * the one exchange).
    *
    * Output: (qid, mrank, cid, mmr) — mrank 1..k selection order, mmr
    * the integer objective at selection time. */
  def mmr(emb: DataFrame, nQueries: Int, nCand: Int = MmrCand,
      k: Int = MmrK): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    val e = Scale.spreadIfNarrow(emb)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("cid") < nQueries)
      .select(col("cid").as("qid"), col("v").as("qv"))
    // one corpus-sized pass: integer 1e4-grid query-candidate sims
    val scored = e.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        cosine10k(col("v"), col("qv")).as("sq"), col("v"))
    val cand = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("sq").desc, col("cid"))))
      .filter(col("rn") <= nCand)
      .select(col("qid"), col("cid"), col("sq"), col("v"))
      .as[(Long, Long, Long, Array[Double])]
    cand.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // candidate order = the window's (sq desc, cid) rank order
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val sims = Array.tabulate(cs.length, cs.length) { (i, j) =>
          if (i == j) 0L else cos10kLocal(cs(i)._4, cs(j)._4)
        }
        val selected = Array.newBuilder[(Long, Int, Long, Long)]
        val picked = Array.fill(cs.length)(false)
        var r = 1
        while (r <= math.min(k, cs.length)) {
          var bi = -1; var bm = Long.MinValue
          var i = 0
          while (i < cs.length) {
            if (!picked(i)) {
              // true max over selected — pair sims can be NEGATIVE and
              // the oracle's max(sp) keeps the sign; only the empty
              // first round contributes 0
              var pen = if (r == 1) 0L else Long.MinValue
              var j = 0
              while (j < cs.length) {
                if (picked(j) && sims(i)(j) > pen) pen = sims(i)(j)
                j += 1
              }
              // ties on the objective break to the SMALLEST cid (the
              // oracle's row_number order) — scan order alone would
              // prefer the higher-sq candidate
              val m = cs(i)._3 * LambdaNum - pen * LambdaCompl
              if (m > bm || (m == bm && cs(i)._2 < cs(bi)._2)) {
                bm = m; bi = i
              }
            }
            i += 1
          }
          picked(bi) = true
          selected += ((qid, r, cs(bi)._2, bm))
          r += 1
        }
        selected.result().toSeq
      }
      .toDF("qid", "mrank", "cid", "mmr")
  }

  /** DuckDB twin of [[mmr]]: the greedy loop unrolls to `k` CTE
    * rounds (select → anti-join shrink), the LPA/Hits discipline.
    * EVERY per-round CTE is MATERIALIZED: inlined, each round's
    * rem/selall re-expands the previous round's whole subtree and the
    * plan grows 2^k copies of the corpus-sized scoring cross join —
    * DuckDB OOMed exactly this way at sf0.1 (the linkGraphCtes
    * inlining lesson, squared). */
  def mmrOracle(embRel: String, nQueries: Int, nCand: Int = MmrCand,
      k: Int = MmrK): String = {
    val rounds = (2 to k).map { i =>
      s"""pen$i AS MATERIALIZED (
         |  SELECT r.qid, r.cid, r.sq, max(p.sp) AS p
         |  FROM rem${i - 1} r
         |  JOIN mpairs p ON p.qid = r.qid AND p.ca = r.cid
         |  JOIN selall${i - 1} s ON s.qid = p.qid AND s.cid = p.cb
         |  GROUP BY 1, 2, 3),
         |sel$i AS MATERIALIZED (
         |  SELECT qid, cid, m AS mmr, $i AS mrank FROM (
         |    SELECT qid, cid, sq * $LambdaNum - p * $LambdaCompl AS m,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY sq * $LambdaNum - p * $LambdaCompl DESC,
         |          cid) AS rn
         |    FROM pen$i) __s$i WHERE rn = 1),
         |selall$i AS MATERIALIZED (
         |  SELECT * FROM selall${i - 1} UNION ALL SELECT * FROM sel$i),
         |rem$i AS MATERIALIZED (
         |  SELECT r.* FROM rem${i - 1} r
         |  ANTI JOIN sel$i s ON s.qid = r.qid AND s.cid = r.cid)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id AS cid, embedding::DOUBLE[] AS v FROM $embRel),
       |mq AS (SELECT cid AS qid, v AS qv FROM e WHERE cid < $nQueries),
       |msc AS (
       |  SELECT q.qid, e.cid,
       |    CAST(round(list_cosine_similarity(e.v, q.qv) * 1e4)
       |      AS BIGINT) AS sq
       |  FROM e CROSS JOIN mq q WHERE e.cid != q.qid),
       |mcand AS MATERIALIZED (
       |  SELECT qid, cid, sq FROM (
       |    SELECT qid, cid, sq, row_number() OVER (PARTITION BY qid
       |      ORDER BY sq DESC, cid) AS rn
       |    FROM msc) __c WHERE rn <= $nCand),
       |mpairs AS MATERIALIZED (
       |  SELECT a.qid, a.cid AS ca, b.cid AS cb,
       |    CAST(round(list_cosine_similarity(ea.v, eb.v) * 1e4)
       |      AS BIGINT) AS sp
       |  FROM mcand a
       |  JOIN mcand b ON b.qid = a.qid AND b.cid != a.cid
       |  JOIN e ea ON ea.cid = a.cid
       |  JOIN e eb ON eb.cid = b.cid),
       |sel1 AS MATERIALIZED (
       |  SELECT qid, cid, m AS mmr, 1 AS mrank FROM (
       |    SELECT qid, cid, sq * $LambdaNum AS m,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY sq * $LambdaNum DESC, cid) AS rn
       |    FROM mcand) __s1 WHERE rn = 1),
       |selall1 AS MATERIALIZED (SELECT * FROM sel1),
       |rem1 AS MATERIALIZED (
       |  SELECT r.* FROM mcand r
       |  ANTI JOIN sel1 s ON s.qid = r.qid AND s.cid = r.cid),
       |$rounds
       |SELECT qid, mrank, cid, mmr FROM selall$k
       |ORDER BY qid, mrank""".stripMargin
  }
}
