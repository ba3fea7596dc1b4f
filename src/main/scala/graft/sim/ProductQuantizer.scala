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

  /** One segment's (vec_id, embedding) view. */
  private def segEmb(emb: DataFrame, s: Int): DataFrame =
    emb.select(col("vec_id"),
      slice(col("embedding"), s * SegDim + 1, SegDim).as("embedding"))

  /** Per-segment codebooks: Segments independent exact-integer k-means
    * fits, collected model-sized (cid -> shifted micro-unit coords). */
  def train(emb: DataFrame): Seq[Seq[(Long, Seq[Long])]] =
    (0 until Segments).map(s =>
      KMeans.centroidsOf(KMeans.fit(segEmb(emb, s), Codes, Iters)))

  /** PQ codes: vec_id + one codebook id per segment, via a single
    * row-local projection over the quantized full vector. */
  def encode(emb: DataFrame, books: Seq[Seq[(Long, Seq[Long])]]): DataFrame = {
    val q = KMeans.quantized(emb)
    q.select(col("vec_id") +: (0 until Segments).map { s =>
      KMeans.assignExpr(books(s),
        slice(col("q"), s * SegDim + 1, SegDim)).as(s"c$s")
    }: _*)
  }

  /** ADC top-k: for each query (vec_id < nQueries), the k corpus
    * vectors with the smallest summed per-segment exact integer squared
    * distance to the query's subvectors via their codebook entries
    * (self excluded; (adc, cid) tiebreak). */
  def adcTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    require(nQueries >= 1 && k >= 1,
      s"nQueries and k must be positive, got ($nQueries, $k)")
    // the query side broadcasts: nQueries x Segments x Codes longs —
    // fine for query SETS; for corpus x corpus use the LSH/IVF pair
    // paths instead of an all-queries broadcast
    require(nQueries <= 1000000,
      s"nQueries = $nQueries would broadcast a corpus-scale query side")
    val books = train(emb)
    val q = KMeans.quantized(emb)

    // query-side distance tables: per segment an array of exact
    // distances to each codebook entry, in books(s) order
    val queries = q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid") +: (0 until Segments).map { s =>
        val qseg = slice(col("q"), s * SegDim + 1, SegDim)
        array(books(s).map { case (_, arr) =>
          val carr = array(arr.map(lit): _*)
          aggregate(zip_with(qseg, carr, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x)
        }: _*).as(s"dt$s")
      }: _*)

    val codes = encode(emb, books)

    // code -> table position (books(s) order); cids can be sparse when
    // a training cluster emptied, so map explicitly instead of indexing
    def lookup(s: Int): Column =
      books(s).zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, ((cid, _), i)) =>
          when(col(s"c$s") === cid, element_at(col(s"dt$s"), i + 1))
            .otherwise(acc)
      }

    val scored = codes.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .withColumn("adc", (0 until Segments).map(lookup).reduce(_ + _))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("adc"))
  }

  /** DuckDB twin: Segments unrolled k-means chains (prefixed CTEs) +
    * per-segment final assignments (= the codes) + per-segment query
    * distance relations, summed and ranked. */
  def adcTopKOracle(embRel: String, nQueries: Int, k: Int): String = {
    def segRel(s: Int) =
      s"(SELECT vec_id, embedding[${s * SegDim + 1}:${(s + 1) * SegDim}]" +
        s" AS embedding FROM $embRel)"
    val chains = (0 until Segments).map { s =>
      s"""${KMeans.oracleCtes(segRel(s), Codes, Iters, s"s${s}_")},
         |${KMeans.assignCtes(Iters, s"s${s}_")},
         |s${s}_qd AS (
         |  SELECT el.vec_id AS qid, c.cid,
         |    CAST(sum((el.v - c.c) * (el.v - c.c)) AS BIGINT) AS d
         |  FROM s${s}_el el JOIN s${s}_c$Iters c ON el.dim = c.dim
         |  WHERE el.vec_id < $nQueries GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (1 until Segments)
      .map(s => s"JOIN s${s}_af a$s USING (vec_id)").mkString(" ")
    val qdJoins = (0 until Segments).map { s =>
      val sameQid = if (s == 0) "" else " AND q%d.qid = q0.qid".format(s)
      s"JOIN s${s}_qd q$s ON q$s.cid = a$s.cid$sameQid"
    }.mkString(" ")
    val adcSum = (0 until Segments).map(s => s"q$s.d").mkString(" + ")
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
