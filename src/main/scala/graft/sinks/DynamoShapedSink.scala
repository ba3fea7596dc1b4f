package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adapter to the reference's DynamoDB storage shape
  * (yolo_ocr_utils.py:135-141, data_pipeline.py:126-140): numbers become
  * strings and nested structures become JSON documents at the sink — and
  * ONLY at the sink. In-plan data stays typed (SURVEY §1.3); this is the
  * single place the stringly representation exists, so a consumer of the
  * reference's tables sees the shape they expect while every upstream
  * operator keeps numeric semantics.
  *
  * Divergence (documented, SURVEY §2.10.4): absent prices are JSON null
  * rather than the Python literal string "None".
  */
object DynamoShapedSink {

  /** detected_data rows -> the reference's item shape: nested detections
    * with stringified coords/confidence, price structs as JSON strings. */
  def toDynamoShape(detected: DataFrame): DataFrame = {
    val det = expr(
      """transform(model2_detections, d -> struct(
        |  d.class_name as class_name,
        |  struct(cast(d.bounding_box.x1 as string) as x1,
        |         cast(d.bounding_box.y1 as string) as y1,
        |         cast(d.bounding_box.x2 as string) as x2,
        |         cast(d.bounding_box.y2 as string) as y2) as bounding_box,
        |  cast(d.confidence as string) as confidence,
        |  d.ocr_text as ocr_text))""".stripMargin)
    detected.select(
      col("image_id"),
      col("item_name"),
      col("processed_item_name"),
      col("whole_image_ocr_text"),
      to_json(det).as("model2_detections"),
      col("shop_name"),
      col("item_price"),
      to_json(col("processed_item_price")).as("processed_item_price"),
      col("item_member_price"),
      to_json(col("processed_item_member_price"))
        .as("processed_item_member_price"),
      col("item_initial_price"),
      to_json(col("processed_item_initial_price"))
        .as("processed_item_initial_price"),
      col("valid"))
  }
}
