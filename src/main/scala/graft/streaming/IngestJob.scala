package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.enrich.{InferenceService, OcrService}
import graft.model.PageImage
import graft.pipeline.IngestPipeline
import graft.sinks.KeyedUpsertSink

/** ST1 — the triggered ingest (reference: per-upload DAG run,
  * data_pipeline.py:159) as an incremental streaming job: each
  * `Trigger.AvailableNow` run drains page batches that landed since the
  * last checkpoint, runs the FULL EP1 dataflow on just those pages, and
  * upserts detected_data by image_id — so re-deliveries and re-runs are
  * no-ops (the reference gets the same effect from DynamoDB put_item
  * idempotency, SURVEY ST6).
  */
object IngestJob {

  def runOnce[S <: InferenceService with OcrService](
      spark: SparkSession,
      pagesDir: String,
      checkpointDir: String,
      outDir: String,
      svc: S): Unit = {
    val schema = "image_id STRING, filename STRING, shop_name STRING, " +
      "page_no INT, width INT, height INT"
    val stream = spark.readStream.schema(schema).parquet(pagesDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val pages = batch.as[PageImage]
        val det1 = IngestPipeline.detectPages(pages, svc, "model1")
        // checkpoint-after-enrichment: crops feeds BOTH detectCrops and
        // wholeImageOcr — without persisting, model-1 inference would
        // re-execute per consumer (twice the service cost, and a
        // nondeterministic service would hand the two branches different
        // crop sets, silently corrupting the det2 x ocr join)
        val crops = IngestPipeline.crops(det1).persist()
        try {
          val det2 = IngestPipeline.detectCrops(crops, svc)
          val ocr = IngestPipeline.wholeImageOcr(crops, svc)
          val detected = IngestPipeline.detectedData(det2, ocr)
            .drop("model2_detections") // nested arrays stay queryable via
                                       // EP1; the upsert store keeps the
                                       // scalar row
          KeyedUpsertSink.upsert(detected, outDir, "image_id")
        } finally crops.unpersist(blocking = false)
      }
      .start()
    q.awaitTermination()
  }
}
