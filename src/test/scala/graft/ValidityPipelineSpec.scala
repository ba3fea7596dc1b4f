package graft

import graft.pipeline.{NotificationSender, NotificationSink, PipelineFixtures, ValidityPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

object CollectingSink extends NotificationSink {
  val batches = new ConcurrentLinkedQueue[Seq[(Long, String, String)]]()
  override def sendBatch(batch: Seq[(Long, String, String)]): Unit =
    batches.add(batch)
}

class ValidityPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def asOf = to_date(lit("2024-10-15"))

  test("applySweep makes the catalog consistent with the sweep date") {
    val meta = PipelineFixtures.pdfMetadata(spark)
    val changes = ValidityPipeline.validitySweep(meta, asOf)
    val updated = ValidityPipeline.applySweep(meta, changes)
    val stillWrong = updated
      .withColumn("valid_now", asOf.between(col("valid_from"), col("valid_to")))
      .filter(col("valid_now") =!= col("valid"))
      .count()
    assert(stillWrong == 0)
    // idempotent: a second sweep finds nothing
    import spark.implicits._
    val again = ValidityPipeline.validitySweep(
      updated.as[graft.model.PdfMeta], asOf).count()
    assert(again == 0)
  }

  test("notification sink receives every row exactly once, batched") {
    val n = ValidityPipeline.notifications(
      PipelineFixtures.users(spark), PipelineFixtures.pdfMetadata(spark), asOf)
    val expected = n.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    CollectingSink.batches.clear()
    NotificationSender.sendBatched(n, CollectingSink, batchSize = 5)
    val sent = CollectingSink.batches.asScala.flatten.toSeq
    assert(CollectingSink.batches.asScala.forall(_.size <= 5))
    assert(sent.map(t => (t._1, t._2)).toSet == expected)
    assert(sent.size == expected.size)
  }
}
