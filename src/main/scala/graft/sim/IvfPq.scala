package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011, §IV) — the production composition of the
  * engine's two ANN halves: a TRAINED coarse quantizer partitions the
  * corpus into inverted lists (`ann_topk_ivf_trained`'s discipline),
  * and product-quantization codes over the RESIDUAL r = x − q1(x)
  * answer queries with asymmetric distance computation over ONLY the
  * probed lists' codes (`ann_topk_pq` scans all codes; IVF-exact reads
  * full vectors). Residual encoding is the paper's preferred variant:
  * residuals concentrate near zero, so a fixed-size codebook spends
  * its codes where the mass is.
  *
  * Exactness discipline (everything int64, both engines agree):
  *  - vectors quantize once to shifted micro-units ([[KMeans.Shift]]);
  *  - residual = q − c re-shifted by [[RShift]] = 2·Shift so every
  *    coordinate stays NON-NEGATIVE (q, c ∈ [0, 2e6] ⇒ q − c + 2e6 ∈
  *    [0, 4e6]) — the precondition for Spark `div` / DuckDB `//`
  *    agreement inside the per-segment codebook training ([[KMeans
  *    .fitQ]]);
  *  - all distances are integer sums of squares (≤ (4e6)² · 64
  *    ≈ 10^15 ≪ 2^63);
  *  - every argmin / top-k tiebreaks lexicographically on id.
  *
  * Scale shape: codes are Segments × log2(Codes) bits per vector — the
  * corpus never moves after ONE encode projection; the query side
  * (probe assignments + per-probe distance tables, nQueries × NProbe ×
  * Segments × Codes longs) broadcasts; scoring joins codes to tables
  * on list_id (broadcast hash join, no corpus shuffle) and pays one
  * per-query top-k window over the probed fraction only. At a billion
  * vectors the probed fraction IS the speedup: NProbe/Coarse of the
  * codes table per query instead of all of it.
  */
object IvfPq {

  /** Coarse quantizer size (inverted-list count). */
  val Coarse = 8

  /** Lloyd iterations for the coarse quantizer. */
  val CoarseIters = 1

  /** Inverted lists probed per query. */
  val NProbe = 2

  val Segments = 4
  val SegDim = 16 // Segments * SegDim = Similarity.Dim
  val Codes = 4
  val PqIters = 1

  /** Residual re-shift keeping residual coordinates non-negative. */
  val RShift = 2 * KMeans.Shift

  /** One-shot search geometry — every structural constant of the
    * IVFADC pipeline lifted to a value, so the ad-hoc/benchmark path
    * can express the same dim-768 x 48-segment shapes the maintained
    * store's per-store `_pq_*` geometry already can (the defaults
    * reproduce the object constants bit for bit; the oracle generators
    * take the same value, so Spark and DuckDB always agree on the
    * shape). `dim` is the vector dimension the segment slicing divides
    * — a geometry the dimension cannot host refuses at construction. */
  final case class Geom(
      coarse: Int = Coarse,
      coarseIters: Int = CoarseIters,
      nProbe: Int = NProbe,
      segments: Int = Segments,
      codes: Int = Codes,
      pqIters: Int = PqIters,
      dim: Int = Similarity.Dim) {
    require(coarse >= 1 && coarseIters >= 1 && nProbe >= 1 &&
      segments >= 1 && codes >= 2 && pqIters >= 1,
      s"bad IVFADC geometry: $this")
    require(dim % segments == 0,
      s"vector dim $dim must divide into $segments PQ segments")
    val segDim: Int = dim / segments
  }

  private def segSlice(c: Column, s: Int, segDim: Int): Column =
    slice(c, s * segDim + 1, segDim)

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** IVFADC top-k: queries are vec_id < nQueries; k nearest by summed
    * per-segment residual ADC over the NProbe probed lists (self
    * excluded; (adc, cid) tiebreak). Output (qid, rank, cid, adc). */
  def topK(emb: DataFrame, nQueries: Int, k: Int,
      geom: Geom = Geom()): DataFrame =
    topKImpl(emb, nQueries, k, identity, geom)

  private def topKImpl(emb: DataFrame, nQueries: Int, k: Int,
      restrict: DataFrame => DataFrame, g: Geom): DataFrame = {
    require(nQueries >= 1 && k >= 1,
      s"nQueries and k must be positive, got ($nQueries, $k)")
    require(nQueries <= 1000000,
      s"nQueries = $nQueries would broadcast a corpus-scale query side")
    val spark = emb.sparkSession
    import spark.implicits._

    val q = KMeans.quantized(emb).localCheckpoint()

    // the declared dim must MATCH the data's: a Geom whose dim is
    // smaller would silently slice away the trailing dimensions from
    // ADC scoring on the Spark side AND the oracle (both slice by the
    // same declared dim), so the twin comparison could never catch
    // the truncation — assert against one observed row instead
    q.select(size(col("q"))).limit(1).collect().foreach { r =>
      require(r.getInt(0) == g.dim,
        s"Geom.dim ${g.dim} does not match the data's vector " +
          s"dimension ${r.getInt(0)} — a mismatched dim would " +
          "silently truncate (or fail to slice) every segment")
    }

    // 1. coarse quantizer: trained Lloyd's loop, model-sized collect
    //    (q is already checkpointed above — skip fitQ's re-pass)
    val cents = KMeans.centroidsOf(
      KMeans.fitQ(q, g.coarse, g.coarseIters, checkpointInput = false))
    val cdf = broadcast(cents.map { case (cid, arr) => (cid, arr) }
      .toDF("list_id", "cv"))

    // 2. inverted-list assignment + re-shifted residuals (row-local
    //    argmin; the broadcast join is against a Coarse-row relation)
    val resid = q
      .select(col("vec_id"), col("q"),
        KMeans.assignExpr(cents, col("q")).as("list_id"))
      .join(cdf, Seq("list_id"))
      .select(col("vec_id"), col("list_id"),
        zip_with(col("q"), col("cv"),
          (a, b) => a - b + lit(RShift)).as("rq"))
      .localCheckpoint()

    // 3. per-segment codebooks TRAINED ON RESIDUALS (residuals never
    //    had a float form) — ONE fused job per iteration for all
    //    segments (KMeans.fitSegmentsQ: bit-identical to per-segment
    //    fits; resid is already checkpointed, so no extra pass)
    val books = KMeans.booksFromRows(
      KMeans.fitSegmentsQ(
        resid.select(col("vec_id"), col("rq").as("q")),
        g.segments, g.segDim, g.codes, g.pqIters,
        checkpointInput = false),
      g.segments)

    // 4. codes: one row-local projection — Segments small ids per vector
    val codes = resid.select(
      col("vec_id") +: col("list_id") +: (0 until g.segments).map { s =>
        KMeans.assignExpr(books(s),
          segSlice(col("rq"), s, g.segDim)).as(s"c$s")
      }: _*)

    // 5. probes: each query's NProbe nearest coarse centroids by exact
    //    integer L2 (Coarse-row broadcast; window over nQueries rows)
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cdist"), col("list_id"))
    val probes = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
      .crossJoin(cdf)
      .withColumn("cdist", sqDist(col("qq"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= g.nProbe)

    // 6. per-(query, probed list) ADC tables: the query's residual
    //    AGAINST THAT LIST's centroid, per segment an array of exact
    //    distances to each codebook entry in books(s) order
    val tabs = probes
      .select(col("qid"), col("list_id"),
        zip_with(col("qq"), col("cv"),
          (a, b) => a - b + lit(RShift)).as("qr"))
      .select(col("qid") +: col("list_id") +:
        (0 until g.segments).map { s =>
        val qseg = segSlice(col("qr"), s, g.segDim)
        // codebook as ONE nested literal, the distance lambda once
        // (r19 plan-cost discipline; entries stay in books(s) order)
        transform(typedLit(books(s).map(_._2)),
          arr => sqDist(qseg, arr)).as(s"dt$s")
      }: _*)

    // code -> table position (books(s) order); cids can be sparse when
    // a training cluster emptied, so map explicitly instead of
    // indexing (try_element_at: an absent code yields null like the
    // old when-chain fallthrough, not an ANSI missing-key error)
    def lookup(s: Int): Column =
      element_at(col(s"dt$s"), try_element_at(
        typedLit(books(s).zipWithIndex
          .map { case ((cid, _), i) => (cid, i + 1) }.toMap),
        col(s"c$s")))

    // 7. ADC over the probed lists ONLY: codes join the broadcast
    //    query tables on list_id — the probed fraction is the join
    //    selectivity, the corpus side never shuffles. `restrict`
    //    (the filtered-search forms) semi-joins the coded candidates
    //    BEFORE ranking, so ranks are dense within the permitted set.
    val scored = restrict(codes)
      .join(broadcast(tabs), Seq("list_id"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("adc", (0 until g.segments).map(lookup).reduce(_ + _))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("vec_id"))
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("adc"))
  }

  /** IVFADC + exact re-ranking (Jégou, Tavenard, Douze, Amsaleg,
    * "Searching in one billion vectors: re-rank with source coding",
    * ICASSP 2011): ADC builds a SHORTLIST of `shortlist` candidates
    * per query, then exact integer L2 over the shortlist's FULL
    * vectors re-ranks down to k. The corpus pays full-vector reads
    * for shortlist·nQueries rows only — the re-rank join is against a
    * broadcast (qid, cid) relation, never a corpus shuffle — while
    * recall recovers most of the quantization loss. Output
    * (qid, rank, cid, dist) with dist the EXACT distance. */
  def topKRerank(emb: DataFrame, nQueries: Int, k: Int,
      shortlist: Int, geom: Geom = Geom()): DataFrame = {
    require(shortlist >= k,
      s"shortlist $shortlist must be >= k = $k")
    rerank(emb, nQueries, k,
      topKImpl(emb, nQueries, shortlist, identity, geom))
  }

  /** [[topKRerank]] within an allowlist of ids — the filtered-search
    * form over the ONE-SHOT IVFADC path
    * ([[IncrementalAnnIndex.topKPqAmong]] is the maintained-store
    * twin): the allowlist semi-joins the coded CANDIDATES before ADC
    * ranking, so the shortlist, and therefore the final ranks, are
    * dense within the permitted set; the rerank inherits the
    * restriction through the shortlist itself. */
  def topKRerankAmong(emb: DataFrame, nQueries: Int, k: Int,
      shortlist: Int, allowed: DataFrame,
      geom: Geom = Geom()): DataFrame = {
    require(shortlist >= k,
      s"shortlist $shortlist must be >= k = $k")
    rerank(emb, nQueries, k,
      topKImpl(emb, nQueries, shortlist,
        c => c.join(allowed.select("vec_id"), Seq("vec_id"), "left_semi"),
        geom))
  }

  /** Exact integer L2 re-rank of a (qid, cid) shortlist down to k —
    * full-vector reads for shortlist·nQueries rows only, both joins
    * against broadcast relations, never a corpus shuffle. */
  private def rerank(emb: DataFrame, nQueries: Int, k: Int,
      shortRanked: DataFrame): DataFrame = {
    val short = shortRanked.select(col("qid"), col("cid"))
    val q = KMeans.quantized(emb)
    val qvecs = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qv"))
    val rescored = q
      .select(col("vec_id").as("cid"), col("q").as("cv"))
      .join(broadcast(short), Seq("cid"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("dist", sqDist(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist"), col("cid"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("dist"))
  }

  /** Recall@k of the pure-ADC ranking against the EXACT integer-L2
    * ground truth over the same quantized vectors — the evaluation an
    * ANN deployment runs before trusting an index (the measured gap
    * IS the quantization + probe-miss loss). Exact side: brute-force
    * over the corpus for nQueries broadcast queries (the ground truth
    * is necessarily a scan; it runs once per index build, not per
    * query). Output (qid, hits, recall_ppm), ppm exact because
    * 1e6 % k == 0 is required. */
  def recallEval(emb: DataFrame, nQueries: Int, k: Int,
      geom: Geom = Geom()): DataFrame = {
    require(1000000L % k == 0,
      s"k = $k must divide 1e6 for an exact ppm grid")
    val approx = topK(emb, nQueries, k, geom)
      .select(col("qid"), col("cid"))
    val q = KMeans.quantized(emb)
    val qvecs = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qv"))
    val exact = q.select(col("vec_id").as("cid"), col("q").as("cv"))
      .crossJoin(broadcast(qvecs))
      .filter(col("qid") =!= col("cid"))
      .withColumn("dist", sqDist(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist"), col("cid"))
    val exactK = exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), lit(1L).as("hit"))
    approx.join(exactK, Seq("qid", "cid"), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("qid"), col("hits"),
        (col("hits") * lit(1000000L / k)).as("recall_ppm"))
  }

  /** DuckDB twin: coarse k-means chain + residual relation + Segments
    * unrolled residual-codebook chains + probe ranking + per-probe
    * distance tables + ADC join, all exact integer. */
  def topKOracle(embRel: String, nQueries: Int, k: Int,
      geom: Geom = Geom()): String =
    s"""${searchCtes(embRel, nQueries, None, geom)}
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, adc
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of [[topKRerank]]: the full [[searchCtes]] chain,
    * then exact re-scoring of the shortlist against g_el. */
  def topKRerankOracle(embRel: String, nQueries: Int, k: Int,
      shortlist: Int, geom: Geom = Geom()): String =
    s"""${searchCtes(embRel, nQueries, None, geom)},
       |${rerankTail(k, shortlist)}""".stripMargin

  /** DuckDB twin of [[topKRerankAmong]]: the same chain with the
    * allowlist joined into the ADC stage (candidates restricted
    * BEFORE ranking, exactly like the Spark side). */
  def topKRerankAmongOracle(embRel: String, nQueries: Int, k: Int,
      shortlist: Int, allowedSql: String, geom: Geom = Geom()): String =
    s"""${searchCtes(embRel, nQueries, Some(allowedSql), geom)},
       |${rerankTail(k, shortlist)}""".stripMargin

  private def rerankTail(k: Int, shortlist: Int): String =
    s"""short AS (SELECT qid, cid FROM ranked WHERE rank <= $shortlist),
       |ex AS (
       |  SELECT s.qid, s.cid,
       |    CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist
       |  FROM short s JOIN g_el a ON a.vec_id = s.qid
       |  JOIN g_el b ON b.vec_id = s.cid AND b.dim = a.dim
       |  GROUP BY 1, 2),
       |rer AS (
       |  SELECT qid, cid, dist, row_number() OVER (PARTITION BY qid
       |    ORDER BY dist, cid) AS rank
       |  FROM ex)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, dist
       |FROM rer WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of [[recallEval]]: ADC top-k vs the brute-force
    * exact ranking over the quantized element relation. */
  def recallEvalOracle(embRel: String, nQueries: Int, k: Int,
      geom: Geom = Geom()): String =
    s"""${searchCtes(embRel, nQueries, None, geom)},
       |approx AS (SELECT qid, cid FROM ranked WHERE rank <= $k),
       |ex0 AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    sum((a.v - b.v) * (a.v - b.v)) AS dist
       |  FROM g_el a JOIN g_el b
       |    ON b.dim = a.dim AND b.vec_id != a.vec_id
       |  WHERE a.vec_id < $nQueries
       |  GROUP BY 1, 2),
       |exk AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |      ORDER BY dist, cid) AS rn
       |    FROM ex0) __e WHERE rn <= $k),
       |h AS (
       |  SELECT a.qid, count(e.cid) AS hits
       |  FROM approx a LEFT JOIN exk e
       |    ON e.qid = a.qid AND e.cid = a.cid
       |  GROUP BY 1)
       |SELECT qid, hits, hits * ${1000000L / k} AS recall_ppm
       |FROM h ORDER BY qid""".stripMargin

  /** The shared WITH-chain through `ranked` (the full IVFADC search);
    * callers append their final SELECT (and optional extra CTEs).
    * `allowed` (a SELECT yielding vec_id) joins the ADC stage so
    * candidates restrict before ranking — [[topKRerankAmong]]'s
    * contract. */
  private def searchCtes(embRel: String, nQueries: Int,
      allowed: Option[String], g: Geom): String = {
    val segDim = g.segDim
    val allowedCte = allowed
      .map(a => s"allowed AS ($a),\n").getOrElse("")
    // a SEMI-join restriction (IN), never an inner join: a
    // non-distinct allowlist must not duplicate ADC rows and corrupt
    // the row_number ranks — the Spark side's left_semi exactly
    val allowedJoin = allowed
      .map(_ => " AND r.vec_id IN (SELECT vec_id FROM allowed)")
      .getOrElse("")
    val segChains = (0 until g.segments).map { s =>
      val src =
        s"""(SELECT vec_id, dim - ${s * segDim} AS dim, v FROM r_el
           | WHERE dim >= ${s * segDim} AND dim < ${(s + 1) * segDim})"""
          .stripMargin.replace("\n", "")
      s"""${KMeans.oracleCtesFromEl(src, g.codes, g.pqIters, s"s${s}_")},
         |${KMeans.assignCtes(g.pqIters, s"s${s}_")}""".stripMargin
    }.mkString(",\n")
    val qdCtes = (0 until g.segments).map { s =>
      s"""qd$s AS (
         |  SELECT q.qid, q.list_id, cb.cid AS code,
         |    CAST(sum((q.v - cb.c) * (q.v - cb.c)) AS BIGINT) AS d
         |  FROM qr q JOIN s${s}_c${g.pqIters} cb
         |    ON cb.dim = q.dim - ${s * segDim}
         |  WHERE q.dim >= ${s * segDim} AND q.dim < ${(s + 1) * segDim}
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (0 until g.segments)
      .map(s => s"JOIN s${s}_af a$s ON a$s.vec_id = r.vec_id")
      .mkString(" ")
    val qdJoins = (0 until g.segments).map { s =>
      val sameQid = if (s == 0) "" else s" AND q$s.qid = q0.qid"
      s"JOIN qd$s q$s ON q$s.list_id = r.cid AND q$s.code = a$s.cid$sameQid"
    }.mkString(" ")
    val adcSum = (0 until g.segments).map(s => s"q$s.d").mkString(" + ")
    s"""WITH ${allowedCte}${
         KMeans.oracleCtes(embRel, g.coarse, g.coarseIters, "g_")},
       |${KMeans.assignCtes(g.coarseIters, "g_")},
       |r_el AS (
       |  SELECT el.vec_id, el.dim, el.v - c.c + $RShift AS v
       |  FROM g_el el JOIN g_af a USING (vec_id)
       |  JOIN g_c${g.coarseIters} c ON c.cid = a.cid AND c.dim = el.dim),
       |$segChains,
       |p0 AS (
       |  SELECT el.vec_id AS qid, c.cid AS list_id,
       |    sum((el.v - c.c) * (el.v - c.c)) AS cdist
       |  FROM g_el el JOIN g_c${g.coarseIters} c ON el.dim = c.dim
       |  WHERE el.vec_id < $nQueries GROUP BY 1, 2),
       |p AS (
       |  SELECT qid, list_id FROM (
       |    SELECT qid, list_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY cdist, list_id) AS rn
       |    FROM p0) __p WHERE rn <= ${g.nProbe}),
       |qr AS (
       |  SELECT el.vec_id AS qid, p.list_id, el.dim,
       |    el.v - c.c + $RShift AS v
       |  FROM g_el el JOIN p ON p.qid = el.vec_id
       |  JOIN g_c${g.coarseIters} c ON c.cid = p.list_id AND c.dim = el.dim),
       |$qdCtes,
       |adc AS (
       |  SELECT q0.qid, r.vec_id AS cid, CAST($adcSum AS BIGINT) AS adc
       |  FROM g_af r $codeJoins $qdJoins
       |  WHERE q0.qid != r.vec_id$allowedJoin),
       |ranked AS (
       |  SELECT qid, cid, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
       |  FROM adc)""".stripMargin
  }
}
