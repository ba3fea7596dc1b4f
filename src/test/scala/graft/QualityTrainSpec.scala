package graft

import graft.analysis.QualityTrain
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The perceptron training loop vs a driver-side reference of the same
  * integer algebra, plus the distillation it exists for. Features and
  * labels are read off the engine's own (oracle-covered) operators; the
  * NEW thing pinned here is the iteration. */
class QualityTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private lazy val feats: Map[Long, Seq[Long]] =
    QualityTrain.featurePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, bs) => d -> bs.map(_._2).toSeq }

  private lazy val labels: Map[Long, Long] =
    docs.select(col("doc_id"), QualityTrain.label(col("text")).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def reference(iters: Int): Map[Long, Long] = {
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    (1 to iters).foreach { _ =>
      val wrong = feats.keys.filter { d =>
        labels(d) * feats(d).map(w).sum <= 0
      }
      val delta = wrong.toSeq.flatMap(d => feats(d).map(_ -> labels(d)))
        .groupBy(_._1).map { case (b, ys) => b -> ys.map(_._2).sum }
      w = (w.keySet ++ delta.keySet).map(b =>
        b -> (w(b) + delta.getOrElse(b, 0L))).toMap.withDefaultValue(0L)
    }
    w.filter(_._2 != 0L)
  }

  test("fit matches the driver-side reference loop exactly") {
    (1 to 3).foreach { iters =>
      val got = QualityTrain.fit(docs, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(iters), s"divergence at iters=$iters")
    }
  }

  test("distillation: the trained model reproduces most rule labels") {
    val w = QualityTrain.fit(docs, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val right = feats.keys.count { d =>
      val m = feats(d).map(w).sum
      m != 0 && (if (m > 0) 1L else -1L) == labels(d)
    }
    val acc = right.toDouble / feats.size
    // more hashed features than documents: the training set is close to
    // separable and three rounds must fit most of it (measured 0.84 on
    // this fixture; a perceptron oscillates, so the bound has slack —
    // a failure here means the update rule broke, not that the corpus
    // got harder)
    assert(acc >= 0.8, s"training accuracy $acc")
    // both classes must actually occur, or the check is vacuous
    assert(labels.values.toSet == Set(1L, -1L))
  }
}
