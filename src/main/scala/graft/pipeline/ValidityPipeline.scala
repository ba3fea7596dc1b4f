package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.PdfMeta

/** EP2 — validity maintenance + notification fan-out (README-only DAG
  * `check_file_validity_and_update_detected_items`, README.md:66-106;
  * SURVEY §3 EP2). Batch jobs meant to run on a daily
  * `Trigger.AvailableNow` cadence plus post-ingest triggers.
  *
  * Scale notes: the sweep is a narrow scan + filter (no shuffle); the
  * propagate step joins detected_data only against the CHANGED keys
  * (ST3 incremental semantics) — broadcast-able since validity flips are
  * a tiny fraction of the catalog; the notification regroups shuffle on
  * shop_name (21 distinct values — fine, the payload per shop is a file
  * list, not the detected rows).
  */
object ValidityPipeline {

  /** Recompute `valid` as of a date (README.md:70-75): a file is valid
    * while `asOf` lies in [valid_from, valid_to]. Returns only rows whose
    * flag CHANGED (the CDC set), with old and new values. */
  def validitySweep(meta: Dataset[PdfMeta], asOf: Column): DataFrame =
    meta.toDF()
      .withColumn("valid_now", asOf.between(col("valid_from"), col("valid_to")))
      .filter(col("valid_now") =!= col("valid"))
      .select(col("filename"), col("shop_name"), col("valid").as("valid_old"),
        col("valid_now").as("valid_new"))

  /** Apply a CDC set back onto the catalog (MERGE emulation). */
  def applySweep(meta: Dataset[PdfMeta], changes: DataFrame): DataFrame =
    meta.toDF()
      .join(changes.select(col("filename"), col("shop_name"), col("valid_new")),
        Seq("filename", "shop_name"), "left")
      .withColumn("valid", coalesce(col("valid_new"), col("valid")))
      .drop("valid_new")

  /** Extract the source-PDF base name from a crop image id
    * (`item_detected/valid/images/{pdfbase}_page_{p}_det_{i}_{cls}.png`). */
  def pdfBaseFromImageId(imageId: Column): Column =
    regexp_extract(imageId, "images/(.+)_page_\\d+_det_", 1)

  /** ST3: propagate validity flips to detected items of affected files
    * ONLY (README.md:77-82) — join against the changed-key set, which is
    * small, so Spark broadcasts it and no full-table shuffle happens. */
  def propagateValidity(detected: DataFrame, changes: DataFrame): DataFrame = {
    val keyed = changes
      .select(regexp_replace(col("filename"), "\\.pdf$", "").as("pdf_base"),
        col("valid_new"))
    detected
      .withColumn("pdf_base", pdfBaseFromImageId(col("image_id")))
      .join(broadcast(keyed), Seq("pdf_base"), "inner")
      .select(col("image_id"), col("valid_new").as("valid"))
  }

  /** A5: users regrouped by effective shop preference (README.md:96-97):
    * a user follows a shop iff it is in included_shops and not in
    * excluded_shops. Output one row per (shop, user). */
  def usersByShop(users: DataFrame): DataFrame =
    users
      .select(col("user_id"), explode(col("included_shops")).as("shop_name"),
        col("excluded_shops"))
      .filter(!array_contains(col("excluded_shops"), col("shop_name")))
      .select(col("shop_name"), col("user_id"))

  /** A6: shop -> currently-valid files (README.md:96-98), validity
    * recomputed as of the given date. */
  def shopToValidFiles(meta: Dataset[PdfMeta], asOf: Column): DataFrame =
    meta.toDF()
      .filter(asOf.between(col("valid_from"), col("valid_to")))
      .groupBy(col("shop_name"))
      .agg(array_join(sort_array(collect_list(col("filename"))), ",")
        .as("files_csv"))

  /** J3/ST4: notification targeting — opted-in users x shops with valid
    * files. One row per (user, shop) with the file list payload. */
  def notifications(users: DataFrame, meta: Dataset[PdfMeta], asOf: Column): DataFrame =
    usersByShop(users.filter(col("wants_pdf_news")))
      .join(shopToValidFiles(meta, asOf), Seq("shop_name"), "inner")
      .select(col("user_id"), col("shop_name"), col("files_csv"))

  /** Per-item tracking (README.md:98 "tracking specific items"): alert
    * rows for users whose tracked item words appear in a detected item's
    * corrected name, restricted to shops the user effectively follows.
    * The detected side explodes to (shop, name-words) once; users explode
    * by tracked item — both sides meet on an equi-join of (shop_name,
    * word), so no cross join of users x items ever forms. */
  def itemAlerts(users: DataFrame, detected: DataFrame): DataFrame = {
    val trackedByShop = usersByShop(users)
      .join(users.select(col("user_id"), col("tracked_items")), Seq("user_id"))
      .select(col("user_id"), col("shop_name"),
        explode(col("tracked_items")).as("word"))
    val itemWords = detected
      .filter(col("processed_item_name").isNotNull &&
        length(col("processed_item_name")) > 0)
      .select(col("image_id"), col("shop_name"),
        explode(split(col("processed_item_name"), " ")).as("word"))
    trackedByShop.join(itemWords, Seq("shop_name", "word"))
      .select(col("user_id"), col("shop_name"), col("word"),
        col("image_id"))
      .distinct()
  }
}

/** Batched webhook-style delivery (README.md:89 "send updates in groups"):
  * partition-local batching keeps the sink call count at
  * ceil(rows/batchSize) per partition with zero extra shuffle. */
trait NotificationSink extends Serializable {
  def sendBatch(batch: Seq[(Long, String, String)]): Unit
}

object NotificationSender {
  def sendBatched(
      notifications: DataFrame,
      sink: NotificationSink,
      batchSize: Int = 25): Unit = {
    notifications
      .select(col("user_id").cast("long"), col("shop_name"), col("files_csv"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .grouped(batchSize)
          .foreach(b => sink.sendBatch(b.toSeq))
      }
  }
}
