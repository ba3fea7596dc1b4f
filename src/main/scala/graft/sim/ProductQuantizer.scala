package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the third classic ANN
  * compression next to IVF inverted lists and int8 scalar quantization:
  * split each vector into [[Segments]] subvectors, train an independent
  * k-means codebook per subspace ([[KMeans.fit]] — the same
  * exact-integer Lloyd's loop the IVF quantizer uses), encode every
  * vector as one small code per segment, and answer queries with
  * asymmetric distance computation (ADC): per-segment lookup tables of
  * exact integer squared distances query-subvector -> codebook entry,
  * summed across segments.
  *
  * Every stage is integer-exact and deterministic, so training,
  * encoding AND search hash-check against a DuckDB oracle — same
  * discipline as `embedding_kmeans` / `ann_topk_ivf_trained`.
  *
  * Scale shape: training collects model-sized state only (Segments x
  * Codes x SegDim int64); encoding is ONE narrow projection (codebooks
  * ride as plan literals — no join, no shuffle; 100 TB of vectors never
  * move); search broadcasts the query-side distance tables (nQueries x
  * Segments x Codes longs) against the codes relation and pays one
  * per-query top-k window. The compressed representation is
  * Segments x ceil(log2 Codes) bits per vector — at a billion vectors
  * the codes table is GBs where float32 vectors are TBs.
  */
object ProductQuantizer {

  val Segments = 4
  val SegDim = 16 // Segments * SegDim = Similarity.Dim
  val Codes = 4
  val Iters = 1

  /** Plain-PQ geometry — [[IvfPq.Geom]]'s discipline applied to the
    * un-nested path: every structural constant lifted to a per-call
    * value (defaults reproduce the object constants bit for bit; the
    * oracle generator takes the same value), so the ad-hoc PQ form can
    * express dim-768 x 48-segment shapes too. A geometry the dimension
    * cannot host refuses at construction. */
  final case class Geom(
      segments: Int = Segments,
      codes: Int = Codes,
      iters: Int = Iters,
      dim: Int = Similarity.Dim) {
    require(segments >= 1 && codes >= 2 && iters >= 1,
      s"bad PQ geometry: $this")
    require(dim % segments == 0,
      s"vector dim $dim must divide into $segments PQ segments")
    val segDim: Int = dim / segments
  }

  /** One segment's (vec_id, embedding) view. */
  private def segEmb(emb: DataFrame, s: Int, g: Geom): DataFrame =
    emb.select(col("vec_id"),
      slice(col("embedding"), s * g.segDim + 1, g.segDim).as("embedding"))

  /** Per-segment codebooks: Segments independent exact-integer k-means
    * fits — trained FUSED in one job per iteration over ONE
    * quantization pass ([[KMeans.fitSegmentsQ]]; quantize-then-slice
    * equals slice-then-quantize because the quantization is
    * elementwise, so the models are bit-identical to the per-segment
    * [[KMeans.fit]] runs). */
  def train(emb: DataFrame,
      geom: Geom = Geom()): Seq[Seq[(Long, Seq[Long])]] =
    KMeans.booksFromRows(
      KMeans.fitSegmentsQ(KMeans.quantized(emb),
        geom.segments, geom.segDim, geom.codes, geom.iters),
      geom.segments)

  /** PQ codes: vec_id + one codebook id per segment, via a single
    * row-local projection over the quantized full vector. */
  def encode(emb: DataFrame, books: Seq[Seq[(Long, Seq[Long])]],
      geom: Geom = Geom()): DataFrame = {
    val q = KMeans.quantized(emb)
    q.select(col("vec_id") +: (0 until geom.segments).map { s =>
      KMeans.assignExpr(books(s),
        slice(col("q"), s * geom.segDim + 1, geom.segDim)).as(s"c$s")
    }: _*)
  }

  /** ADC top-k: for each query (vec_id < nQueries), the k corpus
    * vectors with the smallest summed per-segment exact integer squared
    * distance to the query's subvectors via their codebook entries
    * (self excluded; (adc, cid) tiebreak). */
  def adcTopK(emb: DataFrame, nQueries: Int, k: Int,
      geom: Geom = Geom()): DataFrame = {
    require(nQueries >= 1 && k >= 1,
      s"nQueries and k must be positive, got ($nQueries, $k)")
    // the query side broadcasts: nQueries x Segments x Codes longs —
    // fine for query SETS; for corpus x corpus use the LSH/IVF pair
    // paths instead of an all-queries broadcast
    require(nQueries <= 1000000,
      s"nQueries = $nQueries would broadcast a corpus-scale query side")
    // ONE quantization pass shared by training, the query tables and
    // the encode below (the pre-r19 form quantized emb once per
    // segment fit plus twice more) — values unchanged, passes fewer
    val q = KMeans.quantized(emb).localCheckpoint()
    val books = KMeans.booksFromRows(
      KMeans.fitSegmentsQ(q, geom.segments, geom.segDim, geom.codes,
        geom.iters, checkpointInput = false),
      geom.segments)
    // declared-vs-observed dim (the IvfPq.topKImpl assertion): a
    // smaller declared dim would silently truncate every segment on
    // both twins, so the oracle could never catch it
    q.select(size(col("q"))).limit(1).collect().foreach { r =>
      require(r.getInt(0) == geom.dim,
        s"Geom.dim ${geom.dim} does not match the data's vector " +
          s"dimension ${r.getInt(0)}")
    }

    // query-side distance tables: per segment an array of exact
    // distances to each codebook entry, in books(s) order
    val queries = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid") +: (0 until geom.segments).map { s =>
        val qseg = slice(col("q"), s * geom.segDim + 1, geom.segDim)
        // codebook as ONE nested literal, the distance lambda once
        // (r19 plan-cost discipline; entries stay in books(s) order)
        transform(typedLit(books(s).map(_._2)), arr =>
          aggregate(zip_with(qseg, arr, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x)).as(s"dt$s")
      }: _*)

    // encode off the SAME checkpointed q ([[encode]]'s body inlined —
    // it would otherwise re-quantize emb in a fresh scan)
    val codes = q.select(
      col("vec_id") +: (0 until geom.segments).map { s =>
        KMeans.assignExpr(books(s),
          slice(col("q"), s * geom.segDim + 1, geom.segDim)).as(s"c$s")
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

    val scored = codes.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .withColumn("adc", (0 until geom.segments).map(lookup).reduce(_ + _))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("adc"))
  }

  /** DuckDB twin: Segments unrolled k-means chains (prefixed CTEs) +
    * per-segment final assignments (= the codes) + per-segment query
    * distance relations, summed and ranked. */
  def adcTopKOracle(embRel: String, nQueries: Int, k: Int,
      geom: Geom = Geom()): String = {
    def segRel(s: Int) =
      s"(SELECT vec_id, embedding[${s * geom.segDim + 1}:" +
        s"${(s + 1) * geom.segDim}] AS embedding FROM $embRel)"
    val chains = (0 until geom.segments).map { s =>
      s"""${KMeans.oracleCtes(segRel(s), geom.codes, geom.iters,
             s"s${s}_")},
         |${KMeans.assignCtes(geom.iters, s"s${s}_")},
         |s${s}_qd AS (
         |  SELECT el.vec_id AS qid, c.cid,
         |    CAST(sum((el.v - c.c) * (el.v - c.c)) AS BIGINT) AS d
         |  FROM s${s}_el el JOIN s${s}_c${geom.iters} c ON el.dim = c.dim
         |  WHERE el.vec_id < $nQueries GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (1 until geom.segments)
      .map(s => s"JOIN s${s}_af a$s USING (vec_id)").mkString(" ")
    val qdJoins = (0 until geom.segments).map { s =>
      val sameQid = if (s == 0) "" else " AND q%d.qid = q0.qid".format(s)
      s"JOIN s${s}_qd q$s ON q$s.cid = a$s.cid$sameQid"
    }.mkString(" ")
    val adcSum = (0 until geom.segments).map(s => s"q$s.d").mkString(" + ")
    s"""WITH $chains,
       |adc AS (
       |  SELECT q0.qid, a0.vec_id AS cid, $adcSum AS adc
       |  FROM s0_af a0 $codeJoins $qdJoins
       |  WHERE q0.qid != a0.vec_id),
       |ranked AS (
       |  SELECT qid, cid, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
       |  FROM adc)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, adc
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }
}
