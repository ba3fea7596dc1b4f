package graft

import graft.enrich.FixtureInferenceService
import graft.pipeline.PipelineFixtures
import graft.sinks.KeyedUpsertSink
import graft.streaming.IngestJob
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IngestJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("incremental ingest: drains batches, idempotent on re-delivery") {
    val base = Files.createTempDirectory("ingest").toString
    val pagesDir = s"$base/pages"
    val svc = new FixtureInferenceService

    // first delivery: 10 pages
    val all = PipelineFixtures.pages(spark)
    all.limit(10).write.parquet(pagesDir)
    IngestJob.runOnce(spark, pagesDir, s"$base/ckpt", s"$base/out", svc)
    val n1 = KeyedUpsertSink.read(spark, s"$base/out").count()
    assert(n1 > 0)

    // re-run with nothing new: no change
    IngestJob.runOnce(spark, pagesDir, s"$base/ckpt", s"$base/out", svc)
    assert(KeyedUpsertSink.read(spark, s"$base/out").count() == n1)

    // second delivery INCLUDING a re-delivered overlap: grows by exactly
    // the new crops (overlapping image_ids upsert, not duplicate)
    all.limit(20).write.mode("overwrite").parquet(s"$base/pages2")
    spark.read.parquet(s"$base/pages2").write.mode("append").parquet(pagesDir)
    IngestJob.runOnce(spark, pagesDir, s"$base/ckpt", s"$base/out", svc)
    val out = KeyedUpsertSink.read(spark, s"$base/out")
    val n2 = out.count()
    assert(n2 > n1)
    assert(out.select("image_id").distinct().count() == n2, "no duplicate keys")
  }
}
