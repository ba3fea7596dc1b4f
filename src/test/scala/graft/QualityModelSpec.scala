package graft

import graft.analysis.QualityModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-local properties of the learned quality scorer; the end-to-end
  * pipeline is hash-checked by the `corpus_quality_score` oracle. */
class QualityModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def scoreOf(text: String): Long =
    Seq(text).toDF("text")
      .select(QualityModel.rawScore(col("text")).as("s"))
      .collect().head.getLong(0)

  test("contentless text scores the bias alone") {
    assert(scoreOf("") == QualityModel.Bias)
    assert(scoreOf("...!!!") == QualityModel.Bias) // normalizes to empty
    assert(scoreOf("zxqvk pltwn") == QualityModel.Bias) // all-OOV buckets
  }

  test("scores are the exact lexicon sums (unigrams + bigrams)") {
    // "of the" fires THREE features: 'of', 'the', and the bigram
    val w = QualityModel.Lexicon.toMap
    assert(scoreOf("of the") ==
      QualityModel.Bias + w("of") + w("the") + w("of the"))
    // normalization folds case and punctuation before hashing
    assert(scoreOf("OF, THE!") == scoreOf("of the"))
    // spam bigram drags a fluent sentence down by exactly its weight
    assert(scoreOf("click here") ==
      QualityModel.Bias + w("click") + w("click here"))
  }

  test("function-word mass beats spam markers in the keep rule") {
    val fluent = "the cat sat on the mat and it was the best of the day"
    val spam = "buy now click here free shipping best price win win win"
    assert(scoreOf(fluent) >= 0, s"fluent=${scoreOf(fluent)}")
    assert(scoreOf(spam) < 0, s"spam=${scoreOf(spam)}")
  }

  test("scoring plan is row-local: no shuffle, no join, no UDF") {
    val df = Seq("the quick brown fox").toDF("text")
      .select(QualityModel.rawScore(col("text")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
    val lp = df.queryExecution.optimizedPlan
    val udfs = lp.flatMap(p => p.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u }))
    assert(udfs.isEmpty)
  }
}
