package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.PdfMeta
import graft.pipeline.ValidityPipeline

/** ST2 wiring — the daily validity sweep as a `Trigger.AvailableNow`
  * streaming job: each run drains whatever catalog snapshots have landed
  * since the last run (checkpointed), recomputes validity as of `asOf`,
  * and hands the CDC set to an idempotent sink via foreachBatch. The
  * same job triggered post-ingest covers the README's second schedule
  * (README.md:68).
  */
object ValidityJob {

  /** One AvailableNow drain over a parquet directory of catalog
    * snapshots; `apply` receives each micro-batch's CDC set. */
  def runOnce(
      spark: SparkSession,
      metaDir: String,
      checkpointDir: String,
      asOfDate: String)(apply: DataFrame => Unit): Unit = {
    val schema = "filename STRING, shop_name STRING, valid_from DATE, " +
      "valid_to DATE, valid BOOLEAN, num_pages INT"
    val stream = spark.readStream.schema(schema).parquet(metaDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val changes = ValidityPipeline.validitySweep(
          batch.as[PdfMeta], to_date(lit(asOfDate)))
        apply(changes)
      }
      .start()
    q.awaitTermination()
  }
}
