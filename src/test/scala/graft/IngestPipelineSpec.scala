package graft

import graft.pipeline.IngestPipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** End-to-end EP1 against goldens produced by executing the reference
  * implementation over the same fixtures (tools/gen_pipeline_fixture.py). */
class IngestPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val goldens: Map[String, Array[String]] = {
    val in = getClass.getResourceAsStream("/graft/detected_goldens.tsv")
    val lines = Source.fromInputStream(in, "UTF-8").getLines().toList
    val hdr = lines.head.split("\t", -1)
    lines.tail.map { l =>
      val c = l.split("\t", -1)
      c(0) -> c
    }.toMap
  }

  test("detected_data matches reference-computed goldens") {
    val rows = IngestPipeline.runFixture(spark)
      .selectExpr("image_id", "item_name", "processed_item_name",
        "shop_name", "processed_item_price.item_price",
        "processed_item_member_price.member_price", "n_detections")
      .collect()
    assert(rows.length == goldens.size)
    rows.foreach { r =>
      val g = goldens(r.getString(0))
      def exp(i: Int): Option[String] = if (g(i) == "\\N") None else Some(g(i))
      assert(Option(r.getString(1)) == exp(1), s"item_name for ${r.getString(0)}")
      assert(Option(r.getString(2)) == exp(2), s"processed_item_name for ${r.getString(0)}")
      assert(r.getString(3) == g(4), s"shop for ${r.getString(0)}")
      val ip = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(ip == exp(10).map(_.toDouble), s"ip_item_price for ${r.getString(0)}")
      val mp = if (r.isNullAt(5)) None else Some(r.getDouble(5))
      assert(mp == exp(19).map(_.toDouble), s"mp_member_price for ${r.getString(0)}")
      assert(r.getInt(6) == g(9).toInt, s"n_detections for ${r.getString(0)}")
    }
  }

  test("padded boxes clamp to image bounds") {
    val svc = new graft.enrich.FixtureInferenceService
    val det1 = IngestPipeline.detectPages(
      graft.pipeline.PipelineFixtures.pages(spark), svc, "model1")
    val bad = IngestPipeline.withPaddedBox(det1.toDF())
      .filter("px1 < 0 OR py1 < 0 OR px2 > width OR py2 > height OR px1 > x1 OR px2 < x2")
      .count()
    assert(bad == 0)
  }
}
