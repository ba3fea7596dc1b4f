package graft

import graft.sim.KMeans
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, slice}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** KMeans.fit vs a direct single-machine reference of the same exact
  * integer algorithm (quantize -> argmin with (dist, cid) tiebreak ->
  * truncating-division update), on seeded random data. */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def reference(
      vecs: Seq[(Long, Seq[Double])],
      k: Int,
      iters: Int): Map[(Long, Int), (Long, Long)] = {
    val q = vecs.map { case (id, e) =>
      id -> e.map(v => math.round(v * KMeans.Micro) + KMeans.Shift)
    }.toMap
    var centroids: Map[Long, Seq[Long]] =
      (0L until k.toLong).map(c => c -> q(c)).toMap
    var model: Map[(Long, Int), (Long, Long)] = Map.empty
    (0 until iters).foreach { _ =>
      val assigned = q.toSeq.map { case (id, v) =>
        val best = centroids.toSeq.map { case (cid, c) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min // (dist, cid) lexicographic
        id -> best._2
      }
      model = assigned.groupBy(_._2).toSeq.flatMap { case (cid, members) =>
        val vs = members.map(m => q(m._1))
        val n = vs.size.toLong
        vs.transpose.zipWithIndex.map { case (dimVals, dim) =>
          (cid, dim) -> (n, dimVals.sum / n) // positive: / == div == floor
        }
      }.toMap
      centroids = model.toSeq.groupBy(_._1._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._1._2).map(_._2._2)
      }
    }
    model
  }

  test("fit matches the exact-arithmetic reference on random data") {
    val rnd = new Random(23)
    val vecs = (0L until 40L).map { id =>
      id -> Seq.fill(8)(rnd.nextDouble() - 0.5)
    }
    val emb = vecs.map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = KMeans.fit(emb, k = 3, iters = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val exp = reference(vecs, k = 3, iters = 3)
    assert(got == exp)
  }

  test("empty clusters are dropped on both paths (duplicate-init ties)") {
    // four identical vectors, k = 2: both init centroids coincide, the
    // (dist, cid) tiebreak sends every vector to cid 0, cid 1 empties
    val vecs = (0L until 4L).map(id => id -> Seq(0.25, -0.25))
    val emb = vecs.map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = KMeans.fit(emb, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet.map(_._1) == Set(0L))
    assert(got == reference(vecs, k = 2, iters = 2))
  }

  test("guards: invalid k/iters and missing init ids are refused") {
    val emb = Seq((0L, Seq(0.1f, 0.2f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](KMeans.fit(emb, k = 0, iters = 1))
    intercept[IllegalArgumentException](KMeans.fit(emb, k = 1, iters = 0))
    intercept[IllegalArgumentException](KMeans.fit(emb, k = 5, iters = 1))
  }

  test("broadcast-centroid assignment is bit-equal to the literal form") {
    val rnd = new Random(31)
    val vecs = (0L until 60L).map { id =>
      id -> Seq.fill(8)(rnd.nextDouble() - 0.5)
    }
    val emb = vecs.map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val model = KMeans.fit(emb, k = 4, iters = 2)
    val cents = KMeans.centroidsOf(model)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // force the literal path (k x dims = 32 << budget) and compare
    val lit = rows(KMeans.assign(emb, cents))
    val bc = rows(KMeans.assignBroadcast(emb, cents))
    assert(lit == bc)
    // ties must break identically: identical vectors, duplicate centroids
    val dup = (0L until 6L).map(id => (id, Seq(0.125f, -0.25f)))
      .toDF("vec_id", "embedding")
    val dupModel = KMeans.centroidsOf(KMeans.fit(dup, k = 2, iters = 1))
    assert(rows(KMeans.assign(dup, dupModel)) ==
      rows(KMeans.assignBroadcast(dup, dupModel)))
  }

  test("fit in the over-budget regime matches the reference") {
    // k x dims = 1040 x 64 = 66560 > LiteralBudget: every training
    // iteration must ride the broadcast assignment and still reproduce
    // the exact-arithmetic reference bit for bit
    val rnd = new Random(47)
    // float-exact coordinates: the embedding column is float, so the
    // reference must quantize the SAME values the engine sees (at 70k
    // coordinates a double-vs-float rounding difference is guaranteed)
    val vecs = (0L until 1100L).map { id =>
      id -> Seq.fill(64)((rnd.nextDouble() - 0.5).toFloat.toDouble)
    }
    val emb = vecs.map { case (id, e) => (id, e.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = KMeans.fit(emb, k = 1040, iters = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == reference(vecs, k = 1040, iters = 1))
  }

  test("fused segment training is bit-identical to per-segment fitQ") {
    // the r19 optimization: fitSegmentsQ trains every PQ segment in
    // one job per iteration — this pins the fused models against the
    // independent per-segment fits (same seeds, argmin, update)
    val rnd = new scala.util.Random(77)
    val vecs = (0L until 40L).map(id =>
      id -> Seq.fill(16)(rnd.nextDouble() * 1.6 - 0.8))
    val q = KMeans.quantized(vecs.toDF("vec_id", "embedding"))
      .localCheckpoint()
    for ((segments, k, iters) <- Seq((4, 4, 1), (2, 8, 2), (1, 3, 2))) {
      val segDim = 16 / segments
      val fused = KMeans.fitSegmentsQ(q, segments, segDim, k, iters,
        checkpointInput = false)
      val perSeg = (0 until segments).flatMap { s =>
        KMeans.fitQ(q.select(col("vec_id"),
            slice(col("q"), s * segDim + 1, segDim).as("q")), k, iters)
          .collect()
          .map(r => (s, r.getLong(0), r.getInt(1), r.getLong(2),
            r.getLong(3)))
      }.sorted
      assert(fused == perSeg, s"geometry ($segments, $k, $iters)")
      // and the regrouped books match centroidsOf's shape
      val books = KMeans.booksFromRows(fused, segments)
      val refBooks = (0 until segments).map { s =>
        KMeans.centroidsOf(KMeans.fitQ(q.select(col("vec_id"),
          slice(col("q"), s * segDim + 1, segDim).as("q")), k, iters))
      }
      assert(books == refBooks)
    }
  }

  test("assign regime-splits on the literal budget") {
    val emb = Seq((0L, Seq.fill(64)(0.1f))).toDF("vec_id", "embedding")
    def planOf(cents: Seq[(Long, Seq[Long])]) =
      KMeans.assign(emb, cents).queryExecution.executedPlan.toString
    // k x dims = 64 x 64 = 4096 <= budget: literals, no join of any kind
    val small = Seq.tabulate(64)(i =>
      (i.toLong, Seq.fill(64)((i + 1).toLong)))
    assert(!planOf(small).contains("Join"))
    // k x dims = 1025 x 64 > 65536: the model must ride as broadcast
    // DATA (BroadcastNestedLoopJoin against the one-row relation), never
    // as plan literals
    val big = Seq.tabulate(1025)(i =>
      (i.toLong, Seq.fill(64)((i + 1).toLong)))
    assert(planOf(big).contains("BroadcastNestedLoopJoin"))
  }
}
