package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps.array_dot

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`, dim 64 in the testdata).
  *
  *  - Brute force: query-set x corpus cosine with a per-query top-k
  *    window — the correctness baseline. Cost is |Q| x |C|; fine for
  *    small query sets, never for corpus x corpus at scale.
  *  - LSH (random hyperplanes): each vector lands in a bucket keyed by
  *    the sign pattern of `NPlanes` fixed hyperplane projections;
  *    candidates are bucket-mates only, so the join is an equi-join on
  *    the bucket key (linear candidate generation, the 100 TB path).
  *    Hyperplane coefficients are derived deterministically from md5, so
  *    the oracle reproduces them bit-for-bit.
  *
  * All similarities are rounded to 4 decimals BEFORE ranking, with vec_id
  * tiebreaks, so rankings are engine-independent despite floating-point
  * summation-order differences.
  */
object Similarity {

  val NPlanes = 4
  val Dim = 64

  /** Deterministic hyperplane coefficients in [-1, 1): md5-derived,
    * reproducible in any engine with md5. */
  lazy val planes: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NPlanes) { p =>
      Array.tabulate(Dim) { d =>
        val hex = md.digest(s"$p:$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) / 2147483648.0 - 1.0
      }
    }
  }

  /** Cosine similarity of two array<double> columns via the codegen'd
    * [[graft.functions.ArrayDot]] expression (sequential summation order —
    * bit-equal to a scalar loop). */
  def cosine(a: Column, b: Column): Column =
    array_dot(a, b) / (sqrt(array_dot(a, a)) * sqrt(array_dot(b, b)))

  /** Cosine from a precomputed dot and per-vector norms (saves the two
    * self-dots on every pair of a quadratic join). */
  private def cosinePre(dot: Column, na: Column, nb: Column): Column =
    dot / (na * nb)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Quadratic/scoring joins parallelize over the STREAM side's input
    * splits; a small single-file embeddings table would otherwise run
    * every dot product on one core (BroadcastNestedLoopJoin inherits the
    * probe side's partitioning). No-op on well-split inputs. */
  private def spread(df: DataFrame): DataFrame =
    graft.relational.Scale.spreadIfNarrow(df)

  /** Query-x-corpus cosine scores (self excluded), rounded pre-ranking —
    * the shared head of the brute-force exact forms. */
  private def bruteScored(emb: DataFrame, nQueries: Int): DataFrame = {
    val emb0 = spread(emb)
    val q = emb0.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(array_dot(col("qv"), col("qv"))))
    val c = emb0.select(col("vec_id").as("cid"),
        asDouble(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(array_dot(col("cv"), col("cv"))))
    q.join(c, col("qid") =!= col("cid"))
      .withColumn("sim",
        round(cosinePre(array_dot(col("qv"), col("cv")), col("qn"), col("cn")), 4))
  }

  /** Brute-force top-k: for each query vector (vec_id < nQueries), the k
    * nearest corpus vectors by cosine (self excluded). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    bruteScored(emb, nQueries).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Hard-negative mining for contrastive/embedding training: per query
    * vector, the k MOST similar corpus vectors whose similarity still
    * falls BELOW `posThreshold` — the near-misses a trainer feeds as
    * negatives. Vectors at/above the threshold are the positive set
    * (near-duplicates by embedding) and are excluded along with self;
    * the filter runs BEFORE the ranking window, so positives never
    * occupy negative slots. Exact form for the gate; at corpus scale
    * the candidate generator swaps to the IVF probe exactly like
    * [[ivfTopK]] (threshold filter and window unchanged — negatives are
    * by definition the NEAREST non-positives, which is what the probe
    * surfaces first). */
  def hardNegativesTopK(
      emb: DataFrame, nQueries: Int, k: Int,
      posThreshold: Double): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    bruteScored(emb, nQueries)
      .filter(col("sim") < posThreshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** All corpus pairs with cosine >= threshold (rounded) — the
    * embedding-space near-duplicate detector. Quadratic: reserved for
    * small corpora / within-bucket rescoring at scale. */
  def similarPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val emb0 = spread(emb)
    val a = emb0.select(col("vec_id").as("va"),
        asDouble(col("embedding")).as("ea"))
      .withColumn("na", sqrt(array_dot(col("ea"), col("ea"))))
    val b = emb0.select(col("vec_id").as("vb"),
        asDouble(col("embedding")).as("eb"))
      .withColumn("nb", sqrt(array_dot(col("eb"), col("eb"))))
    // the threshold lives IN the join condition, explicitly AFTER the
    // cheap va < vb predicate: written as a post-join filter, Catalyst
    // pushes it into the nested-loop condition ahead of the id compare,
    // and the dot product then runs for every ORDERED pair (2x the work;
    // measured 2.1x slower). Conjunct order short-circuits per pair.
    val sim =
      round(cosinePre(array_dot(col("ea"), col("eb")), col("na"), col("nb")), 4)
    a.join(b, col("va") < col("vb") && sim >= threshold)
      .select(col("va"), col("vb"), sim.as("sim"))
  }

  /** Top-k via the bounded heap [[graft.functions.TopKAggregator]]
    * instead of a window sort: map-side reduces each partition to k rows
    * per query before the shuffle — the scale path for global/grouped
    * top-k. Output contract identical to [[bruteForceTopK]]. */
  def bruteForceTopKAgg(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val emb0 = spread(emb)
    import emb.sparkSession.implicits._
    val q = emb0.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", sqrt(array_dot(col("qv"), col("qv"))))
    val c = emb0.select(col("vec_id").as("cid"),
        asDouble(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(array_dot(col("cv"), col("cv"))))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .select(col("qid"),
        round(cosinePre(array_dot(col("qv"), col("cv")), col("qn"), col("cn")), 4)
          .as("sim"),
        col("cid"))
      .as[(Long, Double, Long)]
    scored.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(k).toColumn)
      .flatMap { case (qid, items) =>
        items.zipWithIndex.map { case ((sim, cid), i) => (qid, i + 1, cid, sim) }
      }
      .toDF("qid", "rank", "cid", "sim")
  }

  /** Sign-pattern LSH bucket id of an embedding column. The plane
    * family rides as ONE nested (bit, coefs) literal with the
    * dot-sign lambda expressed once (the r19 plan-cost discipline);
    * integer addition is commutative, so the aggregate sum equals the
    * old per-plane reduce bit for bit. */
  def lshBucket(v: Column): Column =
    aggregate(
      transform(
        typedLit((0 until NPlanes).map(p =>
          (1 << p, planes(p).toIndexedSeq))),
        c => when(array_dot(v, c.getField("_2")) >= 0, c.getField("_1"))
          .otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)

  /** Independent hyperplane families, one per LSH band (the md5 seed
    * carries the band index, so band 0 != the single-table [[planes]]
    * family). Banding trades precision for recall the same way minhash
    * banding does: a pair collides if it agrees on ALL planes of ANY
    * band — P(candidate) = 1 - (1 - p^planes)^bands for per-plane
    * agreement p = 1 - angle/pi. */
  val NBands = 3

  lazy val bandPlanes: Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NBands) { b =>
      Array.tabulate(NPlanes) { p =>
        Array.tabulate(Dim) { d =>
          val hex = md.digest(s"b$b:$p:$d".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex, 16) / 2147483648.0 - 1.0
        }
      }
    }
  }

  private def bandBucket(v: Column, b: Int): Column =
    aggregate(
      transform(
        typedLit((0 until NPlanes).map(p =>
          (1 << p, bandPlanes(b)(p).toIndexedSeq))),
        c => when(array_dot(v, c.getField("_2")) >= 0, c.getField("_1"))
          .otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)

  /** All corpus pairs with cosine >= threshold, generated through
    * banded hyperplane LSH — the AT-SCALE form of [[similarPairs]].
    * Candidates are bucket-mates in ANY of the [[NBands]] independent
    * sign-pattern tables, so candidate generation is `NBands` equi-joins
    * on an 8-byte fused (band, bucket) key instead of the quadratic
    * nested loop; the exact rounded cosine then re-scores candidates, so
    * every emitted pair is EXACT and misses are one-sided (a >= threshold
    * pair whose vectors disagree on some plane of every band). Pairs
    * found by several bands dedup through the final aggregation, which
    * rides the same shuffle that brings a pair's band hits together. */
  /** `maxBucket` is the band-bucket admission cap — the embedding twin
    * of minhashLshPairs' guard: a giant cluster of near-identical
    * vectors lands whole in one (band, bucket) and fans C(cluster, 2)
    * pairs through EVERY band. Opt-in (default unlimited) so default
    * recall never changes silently; when set, pairs inside an
    * over-full bucket are a one-sided miss exactly as documented for
    * the text path. The count rides a window on the bk key the
    * self-join shuffles on anyway in the at-scale regime. */
  def lshNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val emb0 = spread(emb)
    // checkpoint: BOTH self-join sides read the banded relation; without
    // it the NBands x NPlanes x Dim signature dots run twice (the
    // ngram-dedup 3x-recompute lesson, r4)
    val banded = emb0.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", sqrt(array_dot(col("v"), col("v"))))
      .withColumn("bks", array((0 until NBands).map { b =>
        // fused 8-byte key: band index in the high bits
        lit(b.toLong << 32) + bandBucket(col("v"), b).cast("long")
      }: _*))
      .select(col("vec_id"), col("v"), col("n"),
        explode(col("bks")).as("bk"))
      .localCheckpoint()
    val v =
      if (maxBucket == Long.MaxValue) banded
      else banded
        .withColumn("__bn", count(lit(1)).over(
          Window.partitionBy(col("bk"))))
        .filter(col("__bn") <= maxBucket)
        .drop("__bn")
    val a = v.select(col("bk"), col("vec_id").as("va"),
      col("v").as("ea"), col("n").as("na"))
    val b = v.select(col("bk"), col("vec_id").as("vb"),
      col("v").as("eb"), col("n").as("nb"))
    val sim =
      round(cosinePre(array_dot(col("ea"), col("eb")), col("na"), col("nb")), 4)
    a.join(b, Seq("bk"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), sim.as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("va"), col("vb"))
      // every band hit of a pair carries the same exact sim; min is the
      // deterministic way to say "any of them"
      .agg(min(col("sim")).as("sim"))
  }

  def lshNearDupPairsOracle(
      embRel: String,
      threshold: Double,
      maxBucket: Long = Long.MaxValue): String = {
    val planeRows = (0 until NBands).flatMap { b =>
      (0 until NPlanes).map { p =>
        s"($b, $p, [${bandPlanes(b)(p).mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n")
    val bucketExprs = (0 until NBands).map { b =>
      val expr = (0 until NPlanes).map { p =>
        s"(CASE WHEN list_dot_product(e.v, pl${b}_$p.coefs) >= 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"(${b.toLong << 32} + ($expr)) AS bk$b"
    }.mkString(",\n    ")
    val planeJoins = (0 until NBands).flatMap { b =>
      (0 until NPlanes).map(p =>
        s"JOIN planes pl${b}_$p ON pl${b}_$p.b = $b AND pl${b}_$p.p = $p")
    }.mkString(" ")
    val bkList = (0 until NBands).map(b => s"bk$b").mkString(", ")
    val admitted =
      if (maxBucket == Long.MaxValue) "cand"
      else s"""(SELECT vec_id, v, bk FROM (
              |    SELECT vec_id, v, bk,
              |      count(*) OVER (PARTITION BY bk) AS bn
              |    FROM cand) __adm WHERE bn <= $maxBucket)""".stripMargin
    s"""WITH planes(b, p, coefs) AS (VALUES
       |$planeRows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |wb AS (
       |  SELECT e.vec_id, e.v,
       |    $bucketExprs
       |  FROM e $planeJoins),
       |cand AS (
       |  SELECT vec_id, v, unnest([$bkList]) AS bk FROM wb),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb,
       |    round(list_cosine_similarity(a.v, b.v), 4) AS sim
       |  FROM $admitted a JOIN $admitted b
       |    ON a.bk = b.bk AND a.vec_id < b.vec_id)
       |SELECT va, vb, sim FROM pairs
       |WHERE sim >= $threshold
       |ORDER BY va, vb""".stripMargin
  }

  /** LSH top-k: same contract as [[bruteForceTopK]] but candidates are
    * restricted to the query's bucket (approximate; deterministic). */
  /** Top-k over INT8-QUANTIZED embeddings — the standard compression
    * path for billion-vector corpora (4x smaller than float32, integer
    * dot products). Quantization is a fixed-point floor map with every
    * step in positive-integer domain, so both engines produce identical
    * codes (`div` on positives == DuckDB `//`; no float division whose
    * 1-ulp error could flip a floor at a boundary):
    *   x = round(e * 1e6);  q = ((x + 2e6) * 127) div 1e6 - 254
    * (= floor(x * 127 / 1e6), codes in [-127, 127] for |e| <= 1).
    * Ranking is by the raw integer dot product (magnitude ranking, the
    * symmetric-quantization convention) with a cid tiebreak; scores are
    * exact BIGINTs, so the oracle compare is hash-exact by construction. */
  def int8Quantize(embCol: String): Column =
    expr(s"transform(cast($embCol as array<double>), x -> " +
      "((cast(round(x * 1000000) as bigint) + 2000000) * 127) " +
      "div 1000000 - 254)")

  def int8TopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val emb0 = spread(emb)
    val quant = emb0.select(col("vec_id"),
      int8Quantize("embedding").cast("array<double>").as("v"))
    val q = quant.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = quant.select(col("vec_id").as("cid"), col("v").as("cv"))
    // dot runs on doubles for the codegen'd ArrayDot kernel; values are
    // exact (|code| <= 127, 64 dims -> |dot| < 2^21 << 2^53)
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("qdot",
        array_dot(col("qv"), col("cv")).cast("bigint"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("qdot").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("qdot"))
  }

  def int8TopKOracle(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x ->
       |      ((CAST(round(x * 1000000) AS BIGINT) + 2000000) * 127)
       |        // 1000000 - 254)::DOUBLE[] AS v
       |  FROM $embRel),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    CAST(list_dot_product(q.v, c.v) AS BIGINT) AS qdot
       |  FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |ranked AS (
       |  SELECT qid, cid, qdot,
       |    row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid)
       |      AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, qdot
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  def lshTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val emb0 = spread(emb)
    // norms computed ONCE per vector (cosinePre) — recomputing both
    // self-dots per candidate pair would triple the dot products
    val withBucket = emb0.select(col("vec_id"),
        asDouble(col("embedding")).as("v"),
        lshBucket(asDouble(col("embedding"))).as("bucket"))
      .withColumn("n", sqrt(array_dot(col("v"), col("v"))))
    val q = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("n").as("qn"), col("bucket"))
    val c = withBucket.select(col("vec_id").as("cid"), col("v").as("cv"),
      col("n").as("cn"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim",
        round(cosinePre(array_dot(col("qv"), col("cv")), col("qn"), col("cn")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  val IvfCentroids = 8
  val IvfProbes = 2

  /** IVF top-k: a coarse quantizer partitions the corpus into inverted
    * lists (each vector assigned to its most-similar centroid); queries
    * probe only the `IvfProbes` nearest lists. Candidate cost is
    * |corpus|/C * probes per query — the other classic ANN scale path
    * next to LSH. Centroids are the first `IvfCentroids` corpus vectors
    * (deterministic coarse quantizer; k-means refinement iterations are
    * intentionally omitted so the oracle reproduces assignments exactly).
    * Similarities are rounded before every argmax/rank with id tiebreaks.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val emb0 = spread(emb)
    val v = emb0.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = v.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    ivfSearch(v, cents, nQueries, k)
  }

  /** IVF search against a TRAINED coarse quantizer: the centroids come
    * from [[KMeans.fit]] (exact-integer Lloyd's loop) instead of the
    * first-`IvfCentroids` sample. Micro-unit centroid coordinates
    * convert to doubles with the IDENTICAL arithmetic the oracle uses
    * ((c - shift) / 10^6), so assignment/probe rankings stay
    * engine-neutral under the round-to-4 discipline. Composition proof:
    * the index TRAINING step and the index SEARCH step are both
    * hash-checked, separately and together. */
  def ivfTrainedTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val emb0 = spread(emb)
    val v = emb0.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = KMeans.fit(emb, IvfCentroids, KMeansIters)
      .groupBy(col("cid").as("cent_id"))
      .agg(sort_array(collect_list(struct(col("dim"), col("c")))).as("dc"))
      .select(col("cent_id"),
        transform(col("dc"), x =>
          (x.getField("c").cast("double") - lit(KMeans.Shift.toDouble)) /
            lit(KMeans.Micro.toDouble)).as("cv"))
    ivfSearch(v, cents, nQueries, k)
  }

  val KMeansIters = 2

  private def ivfSearch(
      v: DataFrame,
      cents: DataFrame,
      nQueries: Int,
      k: Int,
      maxSimExclusive: Option[Double] = None): DataFrame = {
    val simToCent = v.crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("v"), col("cv")), 4))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val assigned = simToCent
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id"))
    val probes = simToCent
      .filter(col("vec_id") < nQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= IvfProbes)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cent_id"))
    val scored0 = probes.join(assigned, Seq("cent_id"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 4))
    // hard-negative regime: drop positives BEFORE the ranking window,
    // so near-dups never occupy negative slots
    val scored = maxSimExclusive
      .map(t => scored0.filter(col("sim") < t)).getOrElse(scored0)
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("cid"), col("sim"))
  }

  /** Hard-negative mining through the IVF probe — the corpus-scale
    * candidate generator for [[hardNegativesTopK]]'s contract: per
    * query, the k most similar PROBED vectors below `posThreshold`.
    * Candidates are the probed clusters' members only (linear, the
    * IVF recall contract), which is exactly where the nearest
    * non-positives live. */
  def ivfHardNegativesTopK(
      emb: DataFrame, nQueries: Int, k: Int,
      posThreshold: Double): DataFrame = {
    val emb0 = spread(emb)
    val v = emb0.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = v.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    ivfSearch(v, cents, nQueries, k, Some(posThreshold))
  }

  def ivfTopKOracle(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
       |          WHERE vec_id < $IvfCentroids),
       |${ivfSearchSql(nQueries, k)}""".stripMargin

  /** DuckDB twin of [[ivfHardNegativesTopK]]: the IVF search SQL with
    * the positive filter applied between scoring and ranking. */
  def ivfHardNegativesOracle(
      embRel: String, nQueries: Int, k: Int, posThreshold: Double): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
       |          WHERE vec_id < $IvfCentroids),
       |${ivfSearchSql(nQueries, k, Some(posThreshold))}""".stripMargin

  /** Oracle twin of [[ivfTrainedTopK]]: the unrolled k-means CTE chain
    * feeds a `cents` CTE ((c - shift) / 10^6, list-ordered by dim),
    * then the same search SQL as the sampled-quantizer oracle. */
  def ivfTrainedTopKOracle(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH ${KMeans.oracleCtes(embRel, IvfCentroids, KMeansIters)},
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |cents AS (
       |  SELECT cid AS cent_id,
       |    list((CAST(c AS DOUBLE) - ${KMeans.Shift}) / ${KMeans.Micro}.0
       |         ORDER BY dim) AS cv
       |  FROM c$KMeansIters GROUP BY cid),
       |${ivfSearchSql(nQueries, k)}""".stripMargin

  private def ivfSearchSql(
      nQueries: Int, k: Int,
      maxSimExclusive: Option[Double] = None): String = {
    val posFilter = maxSimExclusive.map(t => s" AND sim < $t").getOrElse("")
    s"""sim2c AS (
       |  SELECT e.vec_id, e.v, c.cent_id,
       |    round(list_cosine_similarity(e.v, c.cv), 4) AS csim
       |  FROM e CROSS JOIN cents c),
       |ranked2c AS (
       |  SELECT vec_id, v, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, cent_id) AS rn
       |  FROM sim2c),
       |assigned AS (
       |  SELECT vec_id, v, cent_id FROM ranked2c WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, v AS qv, cent_id FROM ranked2c
       |  WHERE rn <= $IvfProbes AND vec_id < $nQueries),
       |scored AS (
       |  SELECT * FROM (
       |    SELECT p.qid, a.vec_id AS cid,
       |      round(list_cosine_similarity(p.qv, a.v), 4) AS sim
       |    FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
       |    WHERE p.qid != a.vec_id) __sc
       |  WHERE TRUE$posFilter),
       |rk AS (
       |  SELECT qid, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM rk WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  // ---- DuckDB oracle builders ---------------------------------------

  private def planeSqlValues: String =
    (0 until NPlanes).map { p =>
      "(" + p + ", [" + planes(p).mkString(", ") + "]::DOUBLE[])"
    }.mkString(",\n")

  def bruteForceTopKOracle(embRel: String, nQueries: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
       |  FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |ranked AS (
       |  SELECT qid, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB twin of [[hardNegativesTopK]] — the brute oracle with the
    * positive-threshold filter applied before ranking (fixture-validated:
    * hand vectors straddling the threshold rank identically to a python
    * cosine mirror). */
  def hardNegativesTopKOracle(
      embRel: String, nQueries: Int, k: Int, posThreshold: Double): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
       |  FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |neg AS (SELECT * FROM scored WHERE sim < $posThreshold),
       |ranked AS (
       |  SELECT qid, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
       |  FROM neg)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  def similarPairsOracle(embRel: String, threshold: Double): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel)
       |SELECT a.vec_id AS va, b.vec_id AS vb,
       |  round(list_cosine_similarity(a.v, b.v), 4) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $threshold
       |ORDER BY va, vb""".stripMargin

  def lshTopKOracle(embRel: String, nQueries: Int, k: Int): String = {
    val bucketExpr = (0 until NPlanes).map { p =>
      s"(CASE WHEN list_dot_product(e.v, pl$p.coefs) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val planeJoins = (0 until NPlanes)
      .map(p => s"JOIN planes pl$p ON pl$p.p = $p").mkString(" ")
    s"""WITH planes(p, coefs) AS (VALUES
       |$planeSqlValues),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embRel),
       |wb AS (
       |  SELECT e.vec_id, e.v, $bucketExpr AS bucket
       |  FROM e $planeJoins),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 4) AS sim
       |  FROM wb q JOIN wb c ON q.bucket = c.bucket
       |    AND q.vec_id < $nQueries AND q.vec_id != c.vec_id),
       |ranked AS (
       |  SELECT qid, cid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, sim
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }
}
