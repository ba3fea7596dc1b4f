package graft

import graft.pipeline.PipelineFixtures
import graft.streaming.ValidityJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ValidityJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AvailableNow drains the catalog once and only new data on re-run") {
    val base = Files.createTempDirectory("vjob").toString
    val metaDir = s"$base/meta"
    val ckpt = s"$base/ckpt"
    PipelineFixtures.pdfMetadata(spark).write.parquet(metaDir)

    val expected = graft.pipeline.ValidityPipeline.validitySweep(
      PipelineFixtures.pdfMetadata(spark),
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.lit("2024-10-15"))).count()
    assert(expected > 0)
    var batches = Vector.empty[Long]
    ValidityJob.runOnce(spark, metaDir, ckpt, "2024-10-15") { changes =>
      batches :+= changes.count()
    }
    assert(batches.sum == expected)

    // re-run with no new files: checkpoint prevents reprocessing
    var batches2 = Vector.empty[Long]
    ValidityJob.runOnce(spark, metaDir, ckpt, "2024-10-15") { changes =>
      batches2 :+= changes.count()
    }
    assert(batches2.sum == 0)

    // new snapshot file arrives -> only it is processed
    PipelineFixtures.pdfMetadata(spark).limit(5)
      .write.mode("append").parquet(metaDir)
    var batches3 = Vector.empty[Long]
    ValidityJob.runOnce(spark, metaDir, ckpt, "2024-10-15") { changes =>
      batches3 :+= changes.count()
    }
    assert(batches3.sum <= 5 && batches3.nonEmpty)
  }

  test("array_dot registered for SQL via extensions hook") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("the domain function library is reachable from pure SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_normalize_czech('Mléko  Čerstvé') AS norm,
        |  graft_correct_name('m1eko') AS corrected,
        |  graft_correct_name('####') AS oov,
        |  graft_parse_price('1990') AS parsed,
        |  graft_process_price('Lidl', '24 90', 'item_price').item_price
        |    AS lidl_price""".stripMargin).collect()(0)
    assert(row.getString(0) == "mleko  cerstve")
    // raw-slice emission: the OCR variant is RECOGNIZED via the
    // canonical trie (non-empty result), not rewritten — reference
    // behavior, pinned by the m1eko golden
    assert(row.getString(1) == "m1eko")
    assert(row.getString(2) == "", "OOV input must yield the empty string")
    assert(row.getDouble(3) == 19.90)
    assert(row.getDouble(4) == 24.90)
  }

  test("text-pipeline operators are reachable from pure SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_scrub_pii('mail bob@x.example.com now') AS scrubbed,
        |  graft_lang_id('the cat and the dog is with for') AS lang,
        |  graft_token_count('  one two  three ') AS ntok,
        |  graft_quality_score('') AS q_empty""".stripMargin).collect()(0)
    assert(row.getString(0) == "mail <EMAIL> now")
    assert(row.getString(1) == "en")
    assert(row.getLong(2) == 3L)
    assert(row.getDouble(3) == 0.3) // len 0: punct penalty 0 -> 0.3
    // the SQL form expands to the same Catalyst tree as the Column form
    import spark.implicits._
    val viaColumn = Seq("mail bob@x.example.com now").toDF("t")
      .select(graft.analysis.TextAnalysis.scrubPii($"t")).collect()(0)
    assert(viaColumn.getString(0) == row.getString(0))
  }
}
