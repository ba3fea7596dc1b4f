package graft

import graft.analysis.LangIdTrain
import graft.relational.TrainingDataQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cavnar-Trenkle profile training + classification: accuracy on the
  * held-out fixture, profile shape, and determinism of the integer
  * pipeline. The hash gate against DuckDB is `langid_train`. */
class LangIdTrainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val profiles =
    LangIdTrain.fit(TrainingDataQueries.LangTrainFixture.toDF("lang", "text"))
      .cache()

  test("profiles are at most K grams per language, ranks contiguous") {
    val byLang = profiles.collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("rank")).sorted.toSeq).toMap
    assert(byLang.keySet == Set("en", "cs", "de"))
    byLang.foreach { case (l, ranks) =>
      assert(ranks.size <= LangIdTrain.ProfileK, l)
      assert(ranks == (1L to ranks.size), s"$l ranks not contiguous")
    }
  }

  test("classifies every held-out sentence correctly") {
    val expected = Map(0L -> "en", 1L -> "cs", 2L -> "de",
      3L -> "en", 4L -> "cs", 5L -> "de")
    val got = LangIdTrain.classify(
        TrainingDataQueries.LangTestFixture.toDF("doc_id", "text"),
        profiles)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang"))
      .toMap
    assert(got == expected)
  }

  test("a training sentence classifies to its own language with a lower distance than any other") {
    val got = LangIdTrain.classify(
        Seq(9L -> "dekuji vam za pomoc a preji hezky den")
          .toDF("doc_id", "text"),
        profiles)
      .head()
    assert(got.getAs[String]("lang") == "cs")
  }
}
