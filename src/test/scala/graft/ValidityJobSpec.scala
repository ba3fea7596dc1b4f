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

  test("the mergeable-sketch surface is reachable from pure SQL") {
    GraftExtensions.register(spark)
    import graft.functions.{FreqSketchOps, QuantileSketchOps, ThetaSketchOps}
    import spark.implicits._
    // theta: 1000 distinct keys, exact regime -> exact estimate
    ThetaSketchOps.partials(spark.range(0, 1000).as[Long]).toDF("sk")
      .createOrReplaceTempView("theta_parts")
    val est = spark.sql(
      "SELECT graft_theta_estimate(graft_theta_union(sk)) AS e" +
        " FROM theta_parts").collect()(0).getDouble(0)
    assert(est == 1000.0)
    // KLL: INCLUSIVE median of 1..1000 == percentile_disc == 500
    QuantileSketchOps.partials(spark.range(1, 1001).as[Long]).toDF("sk")
      .createOrReplaceTempView("kll_parts")
    val med = spark.sql(
      "SELECT graft_kll_quantile(graft_kll_merge(sk), 0.5d) AS m" +
        " FROM kll_parts").collect()(0).getLong(0)
    assert(med == 500L)
    // frequencies: a planted heavy key in a tail, exact regime
    val items = (Seq.fill(50)("hot") ++ (1 to 20).map(i => s"tail$i")).toDS()
    FreqSketchOps.partials(items).toDF("sk")
      .createOrReplaceTempView("freq_parts")
    val hh = spark.sql(
      "SELECT graft_freq_heavy_hitters(graft_freq_merge(sk)) AS h" +
        " FROM freq_parts").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) == "hot" && hh.head.getLong(1) == 50L)
    // count-min: 10 copies of each of 100 keys, exact regime
    graft.functions.CmsSketchOps.partials(
        spark.range(0, 1000).map(_ % 100).as[Long]).toDF("sk")
      .createOrReplaceTempView("cms_parts")
    val cnt = spark.sql(
      "SELECT graft_cms_estimate(graft_cms_merge(sk), 7L) AS c" +
        " FROM cms_parts").collect()(0).getLong(0)
    assert(cnt == 10L)
  }

  test("dedup signature expressions are reachable from pure SQL") {
    GraftExtensions.register(spark)
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions.{col, split}
    import spark.implicits._
    val df = Seq("one two three four five six seven eight nine")
      .toDF("t")
    df.createOrReplaceTempView("sigdocs")
    val viaCol = df.select(
      graft.functions.MinhashSig.minhash_sig(split(col("t"), " "),
        (0 until Dedup.MinhashK).map(Dedup.minhashA),
        (0 until Dedup.MinhashK).map(Dedup.minhashB),
        Dedup.MinhashP).as("mh"),
      graft.functions.SimhashSig.simhash_sig(split(col("t"), " ")).as("sh"),
      graft.functions.WinnowSig.winnow_fps(col("t"),
        graft.analysis.TextAnalysis.WinnowK,
        graft.analysis.TextAnalysis.WinnowW).as("wf")).collect()(0)
    val viaSql = spark.sql(
      """SELECT graft_minhash_sig(split(t, ' ')) AS mh,
        |  graft_simhash_sig(split(t, ' ')) AS sh,
        |  graft_winnow_fps(t) AS wf
        |FROM sigdocs""".stripMargin).collect()(0)
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
  }

  test("text-pipeline operators are reachable from pure SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_scrub_pii('mail bob@x.example.com now') AS scrubbed,
        |  graft_lang_id('the cat and the dog is with for') AS lang,
        |  graft_token_count('  one two  three ') AS ntok,
        |  graft_quality_score('') AS q_empty,
        |  graft_url_norm('HTTP://Ex.COM:80/a/?utm_source=x&b=2#f') AS nu,
        |  graft_url_scope('https://cdn.example.com/a.png').reason AS sr
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "mail <EMAIL> now")
    assert(row.getString(1) == "en")
    assert(row.getLong(2) == 3L)
    assert(row.getDouble(3) == 0.3) // len 0: punct penalty 0 -> 0.3
    assert(row.getString(4) == "http://ex.com/a?b=2")
    assert(row.getString(5) == "ext")
    // the SQL form expands to the same Catalyst tree as the Column form
    import spark.implicits._
    val viaColumn = Seq("mail bob@x.example.com now").toDF("t")
      .select(graft.analysis.TextAnalysis.scrubPii($"t")).collect()(0)
    assert(viaColumn.getString(0) == row.getString(0))
  }
}
