package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, in EXACT
  * integer arithmetic — every assignment and every centroid update is
  * bit-reproducible across engines, so the whole training loop is
  * hash-checkable against a DuckDB oracle (`embedding_kmeans`), not just
  * "rows > 0". This is the quantizer-training step an IVF ANN index
  * needs (graft.sim.Similarity.ivfTopK samples its coarse quantizer;
  * this trains one).
  *
  * Exactness discipline (the float trap, and how each step avoids it):
  *  - vectors quantize ONCE to integer micro-units
  *    (round(e * 10^6), the embedding_centroids convention) and are
  *    SHIFTED positive — all later math is int64-exact;
  *  - distances are integer sums of squares (64 dims x (2*10^6)^2
  *    << 2^63, no overflow);
  *  - argmin ties break on lowest centroid id via lexicographic
  *    (dist, cid) struct ordering — deterministic on both engines;
  *  - centroid update is integer division sum/count, and because
  *    values are strictly positive, truncating division (Spark `div`)
  *    and floor division (DuckDB `//`) agree. The +shift commutes with
  *    the update exactly: (sum + n*shift) div n = shift + sum div n.
  *
  * Scale shape: assignment is ROW-LOCAL and regime-split on model size
  * (k x dims <= [[LiteralBudget]]: centroids as plan literals, zero
  * join; above: the model as ONE broadcast row — plan O(1) in k; the
  * split covers [[fit]]'s per-iteration assignment too, so TRAINING at
  * corpus-scale k never builds an over-budget plan); the update is
  * one map-side-combined groupBy onto k x dims keys. The per-iteration
  * driver collect is k x dims rows — bounded by the model size, the
  * same class as Scale's partition offsets, NOT corpus-sized. Empty
  * clusters are DROPPED (documented; both engines agree because both
  * derive membership from the same exact assignment).
  */
object KMeans {

  val Micro = 1000000L

  /** Shift making every quantized coordinate strictly positive for
    * |e| < 1 embeddings — the precondition for div/floor-div agreement
    * (checked at quantization time via ANSI overflow on the cast). */
  val Shift = 1000000L

  /** (vec_id, q: array<long>) in shifted micro-units. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        e => round(e * Micro).cast("long") + Shift).as("q"))

  /** Collect a (cid, dim, c) model DataFrame into the literal-centroid
    * form [[assign]] consumes — model-sized (k x dims), never
    * corpus-sized. */
  def centroidsOf(model: DataFrame): Seq[(Long, Seq[Long])] =
    model.select(col("cid"), col("dim"), col("c")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (cid, rows) => cid -> rows.sortBy(_._2).map(_._3).toSeq }
      .sortBy(_._1)

  /** Literal budget for the plan-literal assignment regime: a model of
    * k x dims int64 literals is FOLDED INTO THE PLAN TREE by
    * [[assignExpr]], which is the fastest form at small k (zero join,
    * zero broadcast, constant-folded codegen) but has a plan-size
    * ceiling — Catalyst analysis/codegen cost grows with the literal
    * count, and at the k a 100 TB corpus wants (k ~ 1e5, millions of
    * literals) planning dies long before the data does. Measured on
    * this machine (64 dims): analysis+planning of the literal
    * assignment costs 0.7s at 16384 literals (k=256), 2.0s at 65536
    * (k=1024), 7.8s at 262144 (k=4096) — superlinear growth that
    * extrapolates to minutes at k ~ 1e5 — while the broadcast form
    * plans in 0.3s INDEPENDENT of k. Above this budget [[assign]]
    * switches to
    * [[assignBroadcast]], where the model rides as DATA in a one-row
    * broadcast relation — plan size O(1) in k, same row-local argmin,
    * bit-equal results (KMeansSpec pins equality; the
    * `embedding_kmeans_bcast` query hash-pins the broadcast form
    * against the same DuckDB oracle as the literal form). */
  val LiteralBudget = 65536L

  /** Row-local cluster assignment of every vector under a trained
    * model — regime-split on model size: k x dims <= [[LiteralBudget]]
    * rides plan literals (one narrow projection, no join, no shuffle);
    * larger models ride a one-row broadcast relation
    * ([[assignBroadcast]]) with identical exact-integer semantics. */
  def assign(emb: DataFrame, centroids: Seq[(Long, Seq[Long])]): DataFrame =
    withCid(quantized(emb), centroids).select(col("vec_id"), col("cid"))

  private def literalCount(centroids: Seq[(Long, Seq[Long])]): Long =
    centroids.size.toLong *
      centroids.headOption.map(_._2.size.toLong).getOrElse(0L)

  /** (vec_id, q, cid) under the regime split — the shared routing for
    * [[assign]] AND [[fit]]'s per-iteration assignment (training at
    * large k would otherwise rebuild the over-budget literal plan every
    * iteration). Keeps `q` so the update step can explode it without a
    * second scan or join. */
  private def withCid(
      q: DataFrame, centroids: Seq[(Long, Seq[Long])]): DataFrame =
    if (literalCount(centroids) <= LiteralBudget)
      q.select(col("vec_id"), col("q"), assignCol(centroids).as("cid"))
    else broadcastCid(q, centroids)

  /** The broadcast-argmin body: the model as ONE broadcast row of
    * array<struct<cid, c>>, the same exact-integer (dist, cid)
    * lexicographic min evaluated over that array. Row-local
    * (BroadcastNestedLoopJoin against a single row, never a shuffle)
    * with a plan O(1) in k. */
  private def broadcastCid(
      q: DataFrame, centroids: Seq[(Long, Seq[Long])]): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val cdf = Seq(Tuple1(centroids.map { case (cid, arr) => (cid, arr) }))
      .toDF("cents")
    q.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("q"),
        array_min(transform(col("cents"), c =>
          struct(
            aggregate(
              zip_with(col("q"), c.getField("_2"),
                (a, b) => (a - b) * (a - b)),
              lit(0L), (acc, x) => acc + x).as("dist"),
            c.getField("_1").as("cid"))))
          .getField("cid").as("cid"))
  }

  /** The scale-regime twin of the literal assignment (see
    * [[LiteralBudget]]): semantics bit-equal to [[assignExpr]] by
    * construction — same quantization, same integer squared-L2, same
    * tiebreak — with the model riding as broadcast DATA. */
  def assignBroadcast(
      emb: DataFrame, centroids: Seq[(Long, Seq[Long])]): DataFrame =
    broadcastCid(quantized(emb), centroids)
      .select(col("vec_id"), col("cid"))

  /** Row-local argmin centroid id for an arbitrary quantized-vector
    * column: squared L2 against each centroid, lexicographic
    * (dist, cid) min — no join, no shuffle. Public so composite
    * quantizers (PQ's per-subspace encode) reuse the exact assignment
    * semantics.
    *
    * The model rides as ONE nested literal (array<struct<cid, coords>>)
    * with the distance lambda expressed ONCE — the r19 plan-cost fix:
    * the pre-r19 form built k separate zip_with/aggregate trees (k x
    * dims literal leaves), and Catalyst analysis+codegen of those
    * trees, re-run for every action whose plan embeds an assignment,
    * dominated the gate-scale maintenance calls (measured: ~9s of a
    * 14s store-lifecycle query was driver-side planning between jobs).
    * Same exact-integer arithmetic evaluated per element, and
    * (dist, cid) struct min is order-independent (total order), so the
    * result is bit-identical; this is [[broadcastCid]]'s expression
    * with the model as a literal instead of a broadcast row. */
  def assignExpr(centroids: Seq[(Long, Seq[Long])], qCol: Column): Column =
    array_min(transform(
      typedLit(centroids.map { case (cid, arr) => (cid, arr) }),
      c => struct(
        aggregate(
          zip_with(qCol, c.getField("_2"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"),
        c.getField("_1").as("cid")))).getField("cid")

  private def assignCol(centroids: Seq[(Long, Seq[Long])]): Column =
    assignExpr(centroids, col("q"))

  /** Run `iters` Lloyd iterations with k centroids initialized from the
    * k lowest vec_ids. Returns the final model as one row per
    * (cid, dim): member count `n` and centroid coordinate `c` in
    * shifted micro-units (exact integers; divide by 10^6 and subtract 1
    * for the float view). */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame =
    fitQ(quantized(emb), k, iters)

  /** [[fit]] over an ALREADY-quantized `(vec_id, q: array<long>)`
    * relation — the composition point for quantizers that train on
    * derived integer vectors (IVFADC's per-segment codebooks fit on
    * re-shifted residuals, which never had a float form). All values
    * must be non-negative so truncating and floor division agree.
    *
    * `checkpointInput = false` skips the input materialization when
    * the caller ALREADY holds a checkpointed `(vec_id, q)` relation
    * (IvfPq.topKImpl checkpoints once and trains coarse + segments
    * off the same blocks) — values are unchanged either way, this is
    * purely the number of materialization passes. */
  def fitQ(qIn: DataFrame, k: Int, iters: Int,
      checkpointInput: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // every iteration reads q twice (assign + update): checkpoint so
    // the quantization scan never re-runs per consumer
    val q0 = qIn.select(col("vec_id"), col("q"))
    val q = if (checkpointInput) q0.localCheckpoint() else q0

    def collectCentroids(df: DataFrame): Seq[(Long, Seq[Long])] =
      df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).toSeq
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_._2).map(_._3).toSeq
        }
        .sortBy(_._1)

    val init = collectCentroids(
      q.filter(col("vec_id") < k)
        .select(col("vec_id"), posexplode(col("q")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim"), col("v")))
    require(init.size == k,
      s"need vec_ids 0..${k - 1} present for init, found ${init.size}")

    var centroids = init
    var model: DataFrame = null
    for (_ <- 0 until iters) {
      // checkpoint each iteration's model: the collect below AND any
      // downstream consumer (the trained-IVF search, the caller's own
      // reads) hit the cached k x dims blocks instead of re-running the
      // assignment pass per consumer
      model = withCid(q, centroids)
        .select(col("cid"), posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .withColumn("c", expr("s div n"))
        .select(col("cid"), col("dim"), col("n"), col("c"))
        .localCheckpoint()
      centroids = collectCentroids(
        model.select(col("cid"), col("dim"), col("c")))
    }
    model.orderBy(col("cid"), col("dim"))
  }

  /** Product-quantizer codebook training FUSED across segments: train
    * `segments` independent k-means models — one per contiguous
    * `segDim`-wide slice of `q` — in ONE Spark job per iteration
    * instead of `segments` separate [[fitQ]] runs (each of which pays
    * its own slice materialization, per-iteration job, and
    * model collect). Bit-identical to the per-segment fits by
    * construction: the same seed rule (vec_ids 0..k−1, observed once
    * in one driver-sized collect and sliced locally), the same
    * exact-integer argmin with (dist, cid) tiebreak per segment via
    * [[assignExpr]] over the slice, and the same
    * count/sum/truncating-div update — the fused groupBy keys on
    * (seg, cid, dim) so each segment's aggregation sees exactly the
    * multiset its independent fit would. Segment models whose
    * combined literal count would blow the plan budget fall back to
    * the sequential per-segment fits (same results, the pre-fusion
    * shape).
    *
    * `seeds` (full-width vectors; seed i becomes centroid cid i in
    * every segment) replaces the vec_id<k seed-collect — the caller
    * form for corpora whose ids are arbitrary (the store's init
    * previously REMAPPED ids just to satisfy the vec_id<k rule; the
    * remap's only consumer was seeding, so passing the seed vectors
    * directly is value-identical and drops a pass).
    *
    * Returns the FINAL models as (seg, cid, dim, n, c) rows —
    * dims segment-local — sorted by (seg, cid, dim): exactly the
    * union of the per-segment [[fitQ]] outputs. */
  def fitSegmentsQ(qIn: DataFrame, segments: Int, segDim: Int, k: Int,
      iters: Int, checkpointInput: Boolean = true,
      seeds: Option[Seq[Seq[Long]]] = None)
      : Seq[(Int, Long, Int, Long, Long)] = {
    require(segments >= 1, s"segments must be >= 1, got $segments")
    require(segDim >= 1, s"segDim must be >= 1, got $segDim")
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val q0 = qIn.select(col("vec_id"), col("q"))
    val q = if (checkpointInput) q0.localCheckpoint() else q0

    // seeds: explicit full-width vectors, or the k lowest vec_ids'
    // vectors collected once and sliced locally (fitQ's c0 rule)
    val seedVecs: IndexedSeq[(Long, Seq[Long])] = seeds match {
      case Some(s) =>
        require(s.length == k,
          s"PQ training needs exactly $k seed vectors, got ${s.length}")
        s.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toIndexedSeq
      case None =>
        val initRows = q.filter(col("vec_id") < k)
          .select(col("vec_id"), col("q")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1)))
        require(initRows.map(_._1).distinct.length == k,
          s"need vec_ids 0..${k - 1} present for init, found " +
            s"${initRows.map(_._1).distinct.length}")
        initRows.sortBy(_._1).toIndexedSeq
    }

    // contiguous segment chunks sized to the literal budget: default
    // geometries train every segment in one job per iteration; a
    // model too big to inline splits into per-chunk jobs (identical
    // per-segment math either way — segments are independent)
    val perSegLits = math.max(1L, k.toLong * segDim)
    val chunk = math.max(1, math.min(segments.toLong,
      LiteralBudget / perSegLits).toInt)
    (0 until segments).grouped(chunk).flatMap { segs =>
      val s0 = segs.head
      var cents: Map[Int, Seq[(Long, Seq[Long])]] = segs.map(s => s ->
        seedVecs.map { case (cid, arr) =>
          cid -> arr.slice(s * segDim, (s + 1) * segDim)
        }.sortBy(_._1).toSeq).toMap
      var rows: Array[(Int, Long, Int, Long, Long)] = Array.empty
      for (_ <- 0 until iters) {
        // one projection assigns every segment in the chunk (each
        // slice against its own centroids — identical per-segment
        // argmin), one posexplode over the chunk's slice re-derives
        // (seg, local dim), one map-side-combined groupBy updates
        // every model. (The argmin runs in its own select BELOW the
        // generator one: a generator projection strips non-top-level
        // aliases, which would rename the argmin's struct fields.)
        val assigned = q.select(
          slice(col("q"), s0 * segDim + 1, segs.length * segDim)
            .as("qc") +:
          segs.map(s => assignExpr(cents(s),
            slice(col("q"), s * segDim + 1, segDim)).as(s"__c$s")): _*)
        val cidArr = array(segs.map(s => col(s"__c$s")): _*)
        rows = assigned.select(cidArr.as("cids"),
            posexplode(col("qc")).as(Seq("gd", "v")))
          .select(
            (lit(s0) + (col("gd") / segDim).cast("int")).as("seg"),
            element_at(col("cids"),
              (col("gd") / segDim).cast("int") + 1).as("cid"),
            (col("gd") % segDim).as("dim"),
            col("v"))
          .groupBy(col("seg"), col("cid"), col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
          .withColumn("c", expr("s div n"))
          .select(col("seg"), col("cid"), col("dim"), col("n"), col("c"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
            r.getLong(3), r.getLong(4)))
        cents = segs.map(s => s ->
          rows.filter(_._1 == s).groupBy(_._2).toSeq
            .map { case (cid, rs) =>
              cid -> rs.sortBy(_._3).map(_._5).toSeq
            }
            .sortBy(_._1)).toMap
      }
      rows
    }.toSeq.sorted
  }

  /** [[fitSegmentsQ]] rows regrouped into the per-segment codebook
    * shape [[centroidsOf]] yields: books(s) = (cid → dims-sorted
    * centroid coords), cid-sorted. */
  def booksFromRows(rows: Seq[(Int, Long, Int, Long, Long)],
      segments: Int): Seq[Seq[(Long, Seq[Long])]] =
    (0 until segments).map { s =>
      rows.filter(_._1 == s).groupBy(_._2).toSeq
        .map { case (cid, rs) => cid -> rs.sortBy(_._3).map(_._5).toSeq }
        .sortBy(_._1)
    }

  /** DuckDB oracle: the SAME unrolled loop in SQL (k lowest-vec_id
    * init, per-iteration argmin with (dist, cid) tiebreak, floor-div
    * centroid update — equal to Spark's truncating `div` because all
    * values are shifted positive). */
  def oracleSql(embRel: String, k: Int, iters: Int): String =
    s"""WITH ${oracleCtes(embRel, k, iters)}
       |SELECT cid, dim, n, c FROM c$iters
       |ORDER BY cid, dim""".stripMargin

  /** The CTE chain alone (ending in `{p}c$iters(cid, dim, n, c)`), so
    * composing oracles (trained-quantizer IVF, PQ's per-subspace
    * codebooks) can reuse the whole training loop inside their own
    * WITH. `prefix` namespaces every CTE so several chains coexist. */
  def oracleCtes(
      embRel: String, k: Int, iters: Int, prefix: String = ""): String = {
    val p = prefix
    val base =
      s"""${p}el0 AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         |    unnest(embedding::DOUBLE[]) AS e
         |  FROM $embRel),
         |${p}el AS (
         |  SELECT vec_id, CAST(dim AS INTEGER) AS dim,
         |    CAST(round(e * $Micro) AS BIGINT) + $Shift AS v
         |  FROM ${p}el0),
         |${p}c0 AS (SELECT vec_id AS cid, dim, v AS c FROM ${p}el
         |       WHERE vec_id < $k)""".stripMargin
    s"""$base,
       |${stepCtes(p, iters).mkString(",\n")}""".stripMargin
  }

  /** [[oracleCtes]] starting from an EXISTING exploded long relation
    * `(vec_id, dim, v)` instead of a float embedding column — the twin
    * of [[fitQ]] for oracle chains over derived integer vectors
    * (IVFADC's residuals). Ends in `{p}c$iters` like [[oracleCtes]],
    * and defines `{p}el`, so [[assignCtes]] composes unchanged. */
  def oracleCtesFromEl(
      elRel: String, k: Int, iters: Int, prefix: String = ""): String = {
    val p = prefix
    val base =
      s"""${p}el AS (SELECT vec_id, dim, v FROM $elRel),
         |${p}c0 AS (SELECT vec_id AS cid, dim, v AS c FROM ${p}el
         |       WHERE vec_id < $k)""".stripMargin
    s"""$base,
       |${stepCtes(p, iters).mkString(",\n")}""".stripMargin
  }

  private def stepCtes(p: String, iters: Int): Seq[String] =
    (1 to iters).map { i =>
      val prev = s"${p}c${i - 1}"
      s"""${p}d$i AS (
         |  SELECT el.vec_id, c.cid,
         |    sum((el.v - c.c) * (el.v - c.c)) AS dist
         |  FROM ${p}el el JOIN $prev c ON el.dim = c.dim GROUP BY 1, 2),
         |${p}a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist, cid) AS rn
         |    FROM ${p}d$i) __r$p$i WHERE rn = 1),
         |${p}c$i AS (
         |  SELECT a.cid, el.dim, count(*) AS n,
         |    CAST(sum(el.v) // count(*) AS BIGINT) AS c
         |  FROM ${p}el el JOIN ${p}a$i a USING (vec_id) GROUP BY 1, 2)"""
        .stripMargin
    }

  /** CTEs extending [[oracleCtes]] with the FINAL-model assignment of
    * every vector: ends in `{p}af(vec_id, cid)` — the same
    * argmin/tiebreak as a training step, against `{p}c\$iters`. */
  def assignCtes(iters: Int, prefix: String = ""): String = {
    val p = prefix
    s"""${p}dfin AS (
       |  SELECT el.vec_id, c.cid,
       |    sum((el.v - c.c) * (el.v - c.c)) AS dist
       |  FROM ${p}el el JOIN ${p}c$iters c ON el.dim = c.dim GROUP BY 1, 2),
       |${p}af AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY dist, cid) AS rn
       |    FROM ${p}dfin) __rf$p WHERE rn = 1)""".stripMargin
  }
}
