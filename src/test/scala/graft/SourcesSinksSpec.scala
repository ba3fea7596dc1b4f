package graft

import graft.enrich.InferenceService
import graft.model.RawDetection
import graft.pipeline.{IngestPipeline, PipelineFixtures}
import graft.sinks.KeyedUpsertSink
import graft.sources.{PdfSource, StructuralRasterizer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("pdf binaryFile source fans out pages with reference naming") {
    val dir = PdfSource.writeFixturePdfs(
      Files.createTempDirectory("pdfsrc").toString)
    val pages = PdfSource.splitToPages(PdfSource.readPdfs(spark, dir),
      _ => "Lidl", new graft.sources.ContentStreamRasterizer).collect()
    assert(pages.length == 6)
    assert(pages.map(_.image_id).toSet.contains("pages/valid/c_page_3.png"))
    // MediaBox 595x842pt at dpi 250: round(pt * 250 / 72)
    assert(pages.forall(p => p.width == 2066 && p.height == 2924))
    // the structural fallback still agrees on the fan-out itself
    val structural = PdfSource.splitToPages(PdfSource.readPdfs(spark, dir),
      _ => "Lidl", new StructuralRasterizer).collect()
    assert(structural.map(p => (p.image_id, p.page_no)).sorted.toSeq ==
      pages.map(p => (p.image_id, p.page_no)).sorted.toSeq)
  }

  test("keyed upsert: incoming wins, re-run is a no-op, untouched rows survive") {
    val path = Files.createTempDirectory("upsert").toString + "/store"
    val b1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    KeyedUpsertSink.upsert(b1, path, "k")
    val b2 = Seq((2L, "B2"), (4L, "d")).toDF("k", "v")
    KeyedUpsertSink.upsert(b2, path, "k")
    val got = KeyedUpsertSink.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    // idempotent re-run
    KeyedUpsertSink.upsert(b2, path, "k")
    val again = KeyedUpsertSink.read(spark, path).count()
    assert(again == 4)
  }

  test("keyed upsert: duplicate keys within one batch land exactly one row") {
    val path = Files.createTempDirectory("upsertdup").toString + "/store"
    val b = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    KeyedUpsertSink.upsert(b, path, "k")
    val rows = KeyedUpsertSink.read(spark, path).collect()
    assert(rows.length == 2, "put_item semantics: one row per key")
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("dynamo-shaped sink stringifies only at the boundary") {
    val shaped = graft.sinks.DynamoShapedSink.toDynamoShape(
      IngestPipeline.runFixture(spark)).collect()
    assert(shaped.nonEmpty)
    val schema = graft.sinks.DynamoShapedSink.toDynamoShape(
      IngestPipeline.runFixture(spark)).schema
    // every column at the sink is string/boolean — the DynamoDB shape
    assert(schema.fields.forall(f =>
      f.dataType.typeName == "string" || f.dataType.typeName == "boolean"))
    // nested coords are stringified inside the JSON document
    val withDets = shaped.find(_.getString(4).contains("bounding_box")).get
    assert(withDets.getString(4).contains("\"x1\":\""))
  }

  test("csv and json sources roundtrip typed rows losslessly") {
    val base = Files.createTempDirectory("formats").toString
    val orig = graft.relational.StreamingQueries
      .events(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("user_id") < 5)
      .select("event_id", "user_id", "event_type", "value")
    orig.write.option("header", "true").csv(s"$base/csv")
    orig.write.json(s"$base/json")
    val fromCsv = spark.read.option("header", "true")
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .csv(s"$base/csv")
    val fromJson = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(s"$base/json")
    orig.write.orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))
    val o = orig.collect().map(key).toSet
    assert(fromCsv.collect().map(key).toSet == o)
    assert(fromJson.collect().map(key).toSet == o)
    assert(fromOrc.collect().map(key).toSet == o)
    // and the three unioned sources agree under aggregation
    val total = orig.unionByName(fromCsv).unionByName(fromJson)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = orig.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(total == single.map { case (k, v) => k -> v * 3 })
  }

  test("dead-letter channel captures per-image enrichment failures") {
    val flaky = new InferenceService {
      override def detect(imageId: String, model: String): Seq[RawDetection] =
        if (imageId.contains("page_2"))
          throw new RuntimeException(s"inference down for $imageId")
        else Seq(RawDetection(0, "shop_item", 1, 2, 30, 40, 0.9, None))
    }
    val pages = PipelineFixtures.pages(spark).limit(20)
    val (ok, errors) = IngestPipeline.detectPagesSafe(pages, flaky, "model1")
    val nPages = pages.count()
    val nBad = pages.filter(_.image_id.contains("page_2")).count()
    assert(errors.count() == nBad)
    assert(ok.count() == nPages - nBad)
    assert(errors.collect().forall(_.error.contains("inference down")))
  }
}
