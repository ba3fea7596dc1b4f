package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.{InferenceService, OcrService}
import graft.model._
import graft.price.PriceFunctions
import graft.text.NameCorrection

/** EP1 — the flyer-ingest dataflow (SURVEY §3) as one lazy Spark plan:
  *
  *   pages -> [detect model1] -> pad -> regroup-by-class   (item_detection_data)
  *         -> crop fan-out -> [detect model2 + box OCR] -> pad
  *         -> last-wins class routing -> correctName / processPrice
  *         -> detected_data
  *
  * Enrichment stages ([detect]) cross the external-service boundary via
  * typed flatMap (SURVEY §2.9) and should be persisted by callers before
  * reuse; everything else is declarative so Catalyst optimizes the whole
  * plan. At cluster scale the per-image aggregations shuffle on image_id
  * (high-cardinality, well distributed) and every other stage is narrow.
  */
object IngestPipeline {

  /** Grow each box by 10% per side (truncated toward zero, like Python
    * int()) and clamp to the image bounds — reference
    * yolo_ocr_utils.py:115-132; the `padding` parameter there is ignored
    * and 10% hard-coded, replicated as the spec (SURVEY §2.2 P2). */
  def withPaddedBox(df: DataFrame): DataFrame = {
    val padW = ((col("x2") - col("x1")) * 0.10).cast("int")
    val padH = ((col("y2") - col("y1")) * 0.10).cast("int")
    df.withColumn("px1", greatest(lit(0), col("x1") - padW))
      .withColumn("py1", greatest(lit(0), col("y1") - padH))
      .withColumn("px2", least(col("width"), col("x2") + padW))
      .withColumn("py2", least(col("height"), col("y2") + padH))
  }

  /** Run the inference service over images — the enrichment boundary. */
  def detectPages(
      pages: Dataset[PageImage],
      svc: InferenceService,
      model: String): Dataset[ImageDetection] = {
    import pages.sparkSession.implicits._
    pages.flatMap { p =>
      svc.detect(p.image_id, model).map(d =>
        ImageDetection(p.image_id, p.shop_name, p.width, p.height, d.idx,
          d.class_name, d.x1, d.y1, d.x2, d.y2, d.confidence, d.ocr_text))
    }
  }

  /** ST6 divergence: the reference swallows per-image errors and silently
    * drops the image (yolo_ocr_utils.py:198-199); here failures surface
    * on a dead-letter channel while healthy rows flow on. */
  final case class EnrichError(image_id: String, error: String)

  def detectPagesSafe(
      pages: Dataset[PageImage],
      svc: InferenceService,
      model: String): (Dataset[ImageDetection], Dataset[EnrichError]) = {
    import pages.sparkSession.implicits._
    val attempted = pages.map { p =>
      scala.util.Try(svc.detect(p.image_id, model)) match {
        case scala.util.Success(ds) =>
          (ds.map(d => ImageDetection(p.image_id, p.shop_name, p.width,
            p.height, d.idx, d.class_name, d.x1, d.y1, d.x2, d.y2,
            d.confidence, d.ocr_text)),
            None: Option[EnrichError])
        case scala.util.Failure(e) =>
          (Seq.empty[ImageDetection],
            Some(EnrichError(p.image_id, String.valueOf(e.getMessage))))
      }
    }
    // persist BEFORE splitting: the success and error channels are two
    // separate jobs over the same mapped dataset — unpersisted, each
    // would re-run svc.detect per page, and a transiently-failing
    // service could land an image in BOTH channels (or neither),
    // breaking exactly the dead-letter contract this exists for
    val materialized = attempted.persist()
    (materialized.flatMap(_._1), materialized.flatMap(_._2))
  }

  /** HTTP twin of [[detectPagesSafe]]: one POST per image against the
    * enrichment service, issued through a BOUNDED per-partition async
    * window (`cfg.maxInFlight` requests in flight at once — the
    * batching knob; the reference's loop is strictly sequential,
    * yolo_ocr_utils.py:82). First attempts ride the async window; an
    * image whose first attempt fails transiently falls back to the
    * synchronous bounded-retry path with the remaining retry budget —
    * retries are the rare case, so they never stall the window.
    * Permanent failures (4xx, malformed JSON) take the dead-letter
    * channel immediately, per row, exactly like [[detectPagesSafe]].
    *
    * Scale shape: no driver involvement, no shuffle — enrichment
    * parallelism is partitions x maxInFlight; the service endpoint is
    * the throughput governor, which is why the window is a per-request
    * knob and not a global pool. */
  def detectPagesHttp(
      pages: Dataset[PageImage],
      cfg: graft.enrich.HttpEnrichConfig,
      model: String): (Dataset[ImageDetection], Dataset[EnrichError]) = {
    import pages.sparkSession.implicits._
    import graft.enrich.HttpInferenceService
    val attempted = pages.mapPartitions { it =>
      val uri = java.net.URI.create(s"${cfg.baseUrl}/predict?model=$model")
      it.grouped(math.max(1, cfg.maxInFlight)).flatMap { group =>
        val inFlight = group.map { p =>
          (p, HttpInferenceService.sharedClient.sendAsync(
            HttpInferenceService.request(uri, p.image_id, cfg),
            java.net.http.HttpResponse.BodyHandlers.ofString()))
        }
        inFlight.map { case (p, fut) =>
          val body: Either[Throwable, String] =
            try {
              val resp = fut.join()
              if (resp.statusCode() == 200) Right(resp.body())
              else if (resp.statusCode() >= 500) Left(new RuntimeException(
                s"HTTP ${resp.statusCode()} from $uri: ${resp.body()}"))
              else Left(new graft.enrich.PermanentEnrichException(
                s"HTTP ${resp.statusCode()} from $uri: ${resp.body()}"))
            } catch {
              case e: java.util.concurrent.CompletionException =>
                Left(if (e.getCause != null) e.getCause else e)
            }
          val recovered: Either[Throwable, String] = body match {
            case Left(_: graft.enrich.PermanentEnrichException) => body
            case Left(transient) if cfg.maxRetries >= 1 =>
              // the async attempt spent try #1; give the sync path the rest
              try Right(HttpInferenceService.postWithRetry(uri, p.image_id,
                cfg.copy(maxRetries = cfg.maxRetries - 1)))
              catch { case e: Exception => Left(e) }
            case Left(transient) =>
              Left(new graft.enrich.EnrichRetriesExhaustedException(
                s"retries exhausted after 1 attempt: $uri", transient))
            case ok => ok
          }
          recovered.flatMap { b =>
            try Right(HttpInferenceService.parseDetections(b))
            catch { case e: Exception => Left(e) }
          } match {
            case Right(ds) =>
              (ds.map(d => ImageDetection(p.image_id, p.shop_name, p.width,
                p.height, d.idx, d.class_name, d.x1, d.y1, d.x2, d.y2,
                d.confidence, d.ocr_text)),
                None: Option[EnrichError])
            case Left(e) =>
              (Seq.empty[ImageDetection],
                Some(EnrichError(p.image_id, String.valueOf(e.getMessage))))
          }
        }
      }
    }
    // same persist-before-split discipline as detectPagesSafe: the two
    // channels are two jobs; unpersisted, every page would be POSTed twice
    val materialized = attempted.persist()
    (materialized.flatMap(_._1), materialized.flatMap(_._2))
  }

  def detectCrops(
      crops: Dataset[CropImage],
      svc: InferenceService): Dataset[ImageDetection] = {
    import crops.sparkSession.implicits._
    crops.flatMap { c =>
      svc.detect(c.image_id, "model2").map(d =>
        ImageDetection(c.image_id, c.shop_name, c.width, c.height, d.idx,
          d.class_name, d.x1, d.y1, d.x2, d.y2, d.confidence, d.ocr_text))
    }
  }

  /** item_detection_data: per image, detections grouped by class with
    * padded boxes, insertion-ordered (yolo_ocr_utils.py:155-171, A2). */
  def itemDetectionData(det: Dataset[ImageDetection]): DataFrame = {
    val padded = withPaddedBox(det.toDF())
    padded
      .groupBy(col("image_id"), col("class_name"))
      .agg(expr(
        """transform(
          |  array_sort(collect_list(struct(idx, px1, py1, px2, py2, confidence, ocr_text))),
          |  d -> struct(
          |    struct(d.px1 as x1, d.py1 as y1, d.px2 as x2, d.py2 as y2) as bounding_box,
          |    d.confidence as confidence, d.ocr_text as ocr_text))""".stripMargin)
        .as("items"))
      .groupBy(col("image_id"))
      .agg(map_from_entries(collect_list(struct(col("class_name"), col("items"))))
        .as("detections"))
  }

  /** ROI crop fan-out (A3): one crop per model-1 detection, named
    * `{base}_det_{i}_{class}.png` (yolo_ocr_utils.py:179, 187); crop dims
    * come from the RAW unpadded box (yolo_ocr_utils.py:176-178). */
  def crops(det1: Dataset[ImageDetection],
      outputDir: String = "item_detected/valid"): Dataset[CropImage] = {
    import det1.sparkSession.implicits._
    val base = regexp_replace(element_at(split(col("image_id"), "/"), -1),
      "\\.png$", "")
    det1.toDF()
      .select(
        concat(lit(s"$outputDir/images/"), base, lit("_det_"), col("idx"),
          lit("_"), col("class_name"), lit(".png")).as("image_id"),
        col("image_id").as("page_image_id"),
        col("shop_name"),
        (col("x2") - col("x1")).as("width"),
        (col("y2") - col("y1")).as("height"))
      .as[CropImage]
  }

  /** Whole-crop OCR enrichment (got_text_from_image, data_pipeline.py:93-99). */
  def wholeImageOcr(crops: Dataset[CropImage], svc: OcrService): DataFrame = {
    import crops.sparkSession.implicits._
    crops.map(c => (c.image_id, svc.extractText(c.image_id)))
      .toDF("image_id", "whole_image_ocr_text")
  }

  /** Final detected_data assembly (data_pipeline.py:104-140):
    * last-wins routing per class (P4 — the reference loop overwrites, so
    * the highest detection idx of each class survives), name correction,
    * shop-dispatched price parsing, nested model2_detections retained with
    * padded boxes. Divergence: real NULLs instead of "None" strings
    * (SURVEY §2.10.4). */
  def detectedData(
      det2: Dataset[ImageDetection],
      wholeOcr: DataFrame): DataFrame = {
    val padded = withPaddedBox(det2.toDF())
    val routed = padded
      .groupBy(col("image_id"), col("shop_name"))
      .agg(
        expr("max_by(ocr_text, idx) FILTER (WHERE class_name = 'item_name')")
          .as("item_name"),
        expr("max_by(ocr_text, idx) FILTER (WHERE class_name = 'item_price')")
          .as("item_price"),
        expr("max_by(ocr_text, idx) FILTER (WHERE class_name = 'item_member_price')")
          .as("item_member_price"),
        expr("max_by(ocr_text, idx) FILTER (WHERE class_name = 'item_initial_price')")
          .as("item_initial_price"),
        count(lit(1)).cast("int").as("n_detections"),
        expr(
          """transform(
            |  array_sort(collect_list(struct(idx, class_name, px1, py1, px2, py2, confidence, ocr_text))),
            |  d -> struct(d.class_name as class_name,
            |    struct(d.px1 as x1, d.py1 as y1, d.px2 as x2, d.py2 as y2) as bounding_box,
            |    d.confidence as confidence, d.ocr_text as ocr_text))""".stripMargin)
          .as("model2_detections"))
    routed
      .withColumn("processed_item_name",
        NameCorrection.correctName(col("item_name")))
      .withColumn("processed_item_price",
        PriceFunctions.processPrice(col("shop_name"), col("item_price"),
          lit("item_price")))
      .withColumn("processed_item_member_price",
        PriceFunctions.processPrice(col("shop_name"), col("item_member_price"),
          lit("item_member_price")))
      .withColumn("processed_item_initial_price",
        PriceFunctions.processPrice(col("shop_name"), col("item_initial_price"),
          lit("item_initial_price")))
      .join(wholeOcr, Seq("image_id"), "left")
      .withColumn("valid", lit(true))
  }

  /** The full EP1 plan over the bundled fixtures — pages through
    * detected_data with the deterministic fake services.
    *
    * Checkpoint-after-enrichment discipline (SURVEY §4): `crops` feeds
    * BOTH the model-2 detection pass and the whole-image OCR pass, so it
    * is persisted — with a real (nondeterministic, paid-per-call)
    * inference service, re-deriving it would re-run model-1 inference;
    * persist makes each enrichment happen exactly once per run. */
  def runFixture(spark: SparkSession): DataFrame = {
    val svc = new graft.enrich.FixtureInferenceService
    runWith(spark, svc, svc)
  }

  /** [[runFixture]] with the enrichment services injected — the seam the
    * HTTP client swaps through (HttpEnrichSpec runs the full EP1 plan
    * against an in-process HTTP stub and pins output equality with the
    * fixture services). */
  def runWith(
      spark: SparkSession,
      det: InferenceService,
      ocr: OcrService): DataFrame = {
    val pages = PipelineFixtures.pages(spark)
    val det1 = detectPages(pages, det, "model1")
    val cropDs = crops(det1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val det2 = detectCrops(cropDs, det)
    val ocrDf = wholeImageOcr(cropDs, ocr)
    detectedData(det2, ocrDf)
  }
}

/** Bundled EP1 fixture tables (classpath TSVs, generated by
  * tools/gen_pipeline_fixture.py together with reference-produced goldens). */
object PipelineFixtures {
  private def rows(path: String): List[Array[String]] =
    graft.util.Resources.tsv(path)

  def pages(spark: SparkSession): Dataset[PageImage] = {
    import spark.implicits._
    rows("/graft/pipeline_pages.tsv").map(c =>
      PageImage(c(0), c(1), c(2), c(3).toInt, c(4).toInt, c(5).toInt)).toDS()
  }

  def pdfMetadata(spark: SparkSession): Dataset[PdfMeta] = {
    import spark.implicits._
    rows("/graft/pipeline_pdf_metadata.tsv").map(c =>
      PdfMeta(c(0), c(1), java.sql.Date.valueOf(c(2)),
        java.sql.Date.valueOf(c(3)), c(4).toBoolean, c(5).toInt)).toDS()
  }

  /** Raw inference-API JSON payloads per image (the reference's
    * response shape, yolo_ocr_utils.py:100) — input for the from_json
    * external-boundary pattern (SURVEY §2.2 P7). */
  def payloads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows("/graft/pipeline_payloads.tsv").map(c => (c(0), c(1)))
      .toDF("image_id", "payload")
  }

  /** Notification-targeting users (FIXTURES.md A8, README.md:86-98). */
  def users(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def arr(s: String): Seq[String] =
      if (s.isEmpty) Nil else s.split(",", -1).toSeq
    rows("/graft/pipeline_users.tsv").map(c =>
      (c(0).toLong, arr(c(1)), arr(c(2)), c(3).toBoolean, arr(c(4))))
      .toDF("user_id", "included_shops", "excluded_shops", "wants_pdf_news",
        "tracked_items")
  }
}
