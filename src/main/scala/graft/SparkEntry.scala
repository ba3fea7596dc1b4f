package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{IngestPipeline, PipelineFixtures, ValidityPipeline}
import graft.price.PriceFunctions
import graft.relational.{AdvancedQueries, Fixtures, RelationalQueries, StreamingQueries, TrainingDataQueries, WaveEightQueries, WaveElevenQueries, WaveFifteenQueries, WaveSeventeenQueries, WaveSixteenQueries, WaveFiveQueries, WaveFourteenQueries, WaveNineQueries, WaveFourQueries, WaveSevenQueries, WaveSixQueries, WaveTenQueries, WaveThirteenQueries, WaveThreeQueries, WaveTwelveQueries}
import graft.text.{CzechText, NameCorrection}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql`. Queries
  * receive the scale-factor directory and read only driver testdata or
  * bundled fixtures. Aggregates over doubles are rounded on both sides so
  * the driver's hash compare is insensitive to summation order.
  */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def resource(path: String): String = graft.util.Resources.text(path)

  /** Czech pangram appended to each document so the normalization queries
    * actually exercise the diacritic fold on the ASCII-ish testdata. */
  private val CzechProbe = " Příliš žluťoučký kůň\tpěl|ódy "

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation with the
    * small dims broadcast — representative of the engine's join+agg path. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(t(dir, "lineitem"))
    val o = spark.read.parquet(t(dir, "orders"))
    val c = spark.read.parquet(t(dir, "customer"))
    val n = spark.read.parquet(t(dir, "nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(round(sum(li("l_extendedprice") * (lit(1.0) - li("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("nation"))
  }

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-family: aggregation over lineitem (SURVEY §2.3)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // P1/T1: Czech normalization as pure built-ins (SURVEY §2.6)
    "czech_normalize" -> ((s, dir) => {
      // spread: regex-heavy narrow projection over a single-file input
      // would otherwise run on one core
      graft.relational.Scale.spreadIfNarrow(
          s.read.parquet(t(dir, "documents")))
        .select(col("doc_id"),
          CzechText.normalizeCzech(concat(col("text"), lit(CzechProbe)))
            .as("norm_text"))
        .orderBy(col("doc_id"))
    }),
    // F1-F18: shop price dispatcher over the golden corpus (SURVEY §2.7);
    // oracle VALUES were produced by executing the reference implementation.
    "price_parse" -> ((s, _) => {
      val r = PriceFunctions.processPrice(col("shop"), col("text"), col("class_id"))
      Fixtures.priceCases(s)
        .select(col("id"), col("shop"), col("class_id"), r.as("r"))
        .select(col("id"), col("shop"), col("class_id"),
          col("r.item_price").as("item_price"),
          col("r.initial_price").as("initial_price"),
          col("r.member_price").as("member_price"),
          col("r.volume").as("volume"),
          col("r.packaging").as("packaging"),
          col("r.price_ex_vat").as("price_ex_vat"),
          col("r.member_tag").as("member_tag"))
        .orderBy(col("id"))
    }),
    // T2-T5: trie + DP name correction over the golden corpus (SURVEY §2.6)
    "name_correct" -> ((s, _) => {
      Fixtures.nameCases(s)
        .select(col("id"), NameCorrection.correctName(col("text")).as("corrected"))
        .orderBy(col("id"))
    }),
    // EP1 end-to-end: pages -> detect -> crops -> detect2+OCR -> routing ->
    // detected_data (SURVEY §3); oracle VALUES computed by executing the
    // reference implementation over the same fixtures.
    "detected_items" -> ((s, _) => {
      val d = IngestPipeline.runFixture(s)
      val prefixes = Seq(
        "ip" -> "processed_item_price",
        "mp" -> "processed_item_member_price",
        "inp" -> "processed_item_initial_price")
      val fields = Seq("item_price", "initial_price", "member_price",
        "volume", "packaging", "price_ex_vat", "member_tag")
      val flat = for { (p, src) <- prefixes; f <- fields }
        yield col(s"$src.$f").as(s"${p}_$f")
      d.select(
        Seq(col("image_id"), col("item_name"), col("processed_item_name"),
          col("whole_image_ocr_text"), col("shop_name"), col("item_price"),
          col("item_member_price"), col("item_initial_price"), col("valid"),
          col("n_detections")) ++ flat: _*)
        .orderBy(col("image_id"))
    }),
    // P2: bbox pad + clamp over the model-2 detections (SURVEY §2.2)
    "det2_padded" -> ((s, _) => {
      val svc = new graft.enrich.FixtureInferenceService
      val cropDs = IngestPipeline.crops(
        IngestPipeline.detectPages(PipelineFixtures.pages(s), svc, "model1"))
      val det2 = IngestPipeline.detectCrops(cropDs, svc)
      IngestPipeline.withPaddedBox(det2.toDF())
        .select(col("image_id"), col("idx"), col("class_name"),
          col("px1").as("x1"), col("py1").as("y1"),
          col("px2").as("x2"), col("py2").as("y2"))
        .orderBy(col("image_id"), col("idx"))
    }),
    // A2: per-image regroup into class -> [detections]. The map's
    // INSERTION order is proven by the flattened twin below; here the
    // map is serialized as CANONICAL JSON — entries sorted by class,
    // nulls explicit — so the whole nested value (key set, box padding,
    // confidence, shape) hash-matches a reference-derived golden.
    "item_detection_regroup" -> ((s, _) => {
      val svc = new graft.enrich.FixtureInferenceService
      val det1 = IngestPipeline.detectPages(PipelineFixtures.pages(s), svc, "model1")
      IngestPipeline.itemDetectionData(det1)
        .select(col("image_id"),
          to_json(map_from_entries(array_sort(map_entries(col("detections")))),
            Map("ignoreNullFields" -> "false")).as("detections_json"))
        .orderBy(col("image_id"))
    }),
    // A2 flattened: the nested class->detections map exploded back out,
    // proving map construction + insertion order against a golden oracle
    "regroup_flat" -> ((s, _) => {
      val svc = new graft.enrich.FixtureInferenceService
      val det1 = IngestPipeline.detectPages(PipelineFixtures.pages(s), svc, "model1")
      IngestPipeline.itemDetectionData(det1)
        .select(col("image_id"),
          explode(col("detections")).as(Seq("class_name", "items")))
        .select(col("image_id"), col("class_name"),
          size(col("items")).as("n_items"),
          element_at(col("items"), 1).getField("bounding_box")
            .getField("x1").as("first_x1"))
        .orderBy(col("image_id"), col("class_name"))
    }),
    // ST2: daily validity sweep — CDC set of flipped flags (SURVEY §2.8)
    "validity_sweep" -> ((s, _) => {
      ValidityPipeline.validitySweep(PipelineFixtures.pdfMetadata(s), Ep2AsOf)
        .orderBy(col("filename"), col("shop_name"))
    }),
    // ST3/J2: propagate flips to detected items of affected files only
    "validity_propagate" -> ((s, _) => {
      val svc = new graft.enrich.FixtureInferenceService
      val meta = PipelineFixtures.pdfMetadata(s)
      val changes = ValidityPipeline.validitySweep(meta, Ep2AsOf)
      val cropIds = IngestPipeline.crops(
        IngestPipeline.detectPages(PipelineFixtures.pages(s), svc, "model1"))
      ValidityPipeline.propagateValidity(cropIds.toDF(), changes)
        .orderBy(col("image_id"))
    }),
    // A5: users regrouped by effective shop preference
    "users_by_shop" -> ((s, _) => {
      ValidityPipeline.usersByShop(PipelineFixtures.users(s))
        .orderBy(col("shop_name"), col("user_id"))
    }),
    // A6: shop -> currently-valid files
    "shop_valid_files" -> ((s, _) => {
      ValidityPipeline.shopToValidFiles(PipelineFixtures.pdfMetadata(s), Ep2AsOf)
        .orderBy(col("shop_name"))
    }),
    // J3/ST4: notification targeting (opted-in users x valid files)
    "notifications" -> ((s, _) => {
      ValidityPipeline.notifications(PipelineFixtures.users(s),
        PipelineFixtures.pdfMetadata(s), Ep2AsOf)
        .orderBy(col("user_id"), col("shop_name"))
    }),
    // ST4 per-item tracking (README-only): users' tracked item words x
    // detected corrected names, equi-joined on (shop, word)
    "item_alerts" -> ((s, _) => {
      ValidityPipeline.itemAlerts(PipelineFixtures.users(s),
          IngestPipeline.runFixture(s))
        .orderBy(col("user_id"), col("shop_name"), col("word"),
          col("image_id"))
    }),
    // P7: external-boundary JSON parsed against a DECLARED schema (the
    // reference trusts ast.literal_eval blindly; we parse + explode)
    "json_boundary" -> ((s, _) => {
      val schema = "detections ARRAY<STRUCT<box: ARRAY<INT>, " +
        "class: STRING, confidence: DOUBLE, ocr_text: STRING>>"
      PipelineFixtures.payloads(s)
        .select(col("image_id"), from_json(col("payload"), schema,
          Map.empty[String, String]).as("p"))
        .select(col("image_id"),
          posexplode(col("p.detections")).as(Seq("det_idx", "d")))
        .select(col("image_id"), col("det_idx"),
          col("d.class").as("class_name"),
          element_at(col("d.box"), 1).as("x1"),
          element_at(col("d.box"), 2).as("y1"),
          element_at(col("d.box"), 3).as("x2"),
          element_at(col("d.box"), 4).as("y2"),
          col("d.confidence").as("confidence"),
          col("d.ocr_text").as("ocr_text"))
        .orderBy(col("image_id"), col("det_idx"))
    }),
    // S1: PDF split source — binaryFile scan + per-page typed flatMap
    // fan-out with the reference's page-naming scheme (structural
    // rasterizer; dims = A4 @ dpi 250)
    "pdf_split" -> ((s, _) => {
      import graft.sources.{ContentStreamRasterizer, PdfSource}
      val dir = PdfSource.writeFixturePdfs(
        sys.props("java.io.tmpdir") + "/graft_pdfs")
      val shops = Map("a.pdf" -> "Lidl", "b.pdf" -> "Penny", "c.pdf" -> "Billa")
      PdfSource.splitToPages(PdfSource.readPdfs(s, dir),
          f => shops.getOrElse(f, "Unknown"), new ContentStreamRasterizer)
        .toDF()
        .orderBy(col("image_id"))
    }),
    // J1: point-lookup join of pages -> catalog (broadcast; misses kept
    // and flagged instead of failing, the anti-join surface)
    "pages_meta_join" -> ((s, _) => {
      import s.implicits._
      val orphans = Seq(
        ("pages/valid/orphan_1.png", "ghost.pdf", "Lidl"),
        ("pages/valid/orphan_2.png", "phantom.pdf", "NoShop"))
        .toDF("image_id", "filename", "shop_name")
      val pages = PipelineFixtures.pages(s).toDF()
        .select(col("image_id"), col("filename"), col("shop_name"))
        .unionAll(orphans)
      val meta = PipelineFixtures.pdfMetadata(s).toDF()
        .select(col("filename"), col("shop_name"), col("valid"))
      pages.join(broadcast(meta), Seq("filename", "shop_name"), "left")
        .select(col("image_id"), col("filename"), col("shop_name"),
          col("valid").isNotNull.as("joined"),
          coalesce(col("valid"), lit(false)).as("valid"))
        .orderBy(col("image_id"))
    }),
  )

  /** Fixed EP2 sweep date (fixtures span windows before/around/after it). */
  private def Ep2AsOf = to_date(lit("2024-10-15"))

  /** Full query surface = core/domain queries + the relational module. */
  private def modules =
    RelationalQueries.all ++ AdvancedQueries.all ++ WaveThreeQueries.all ++
      WaveFourQueries.all ++ WaveFiveQueries.all ++ WaveSixQueries.all ++
      WaveSevenQueries.all ++ WaveEightQueries.all ++ WaveNineQueries.all ++
      WaveTenQueries.all ++ WaveElevenQueries.all ++
      WaveTwelveQueries.all ++ WaveThirteenQueries.all ++
      WaveFourteenQueries.all ++ WaveFifteenQueries.all ++
      WaveSixteenQueries.all ++ WaveSeventeenQueries.all ++
      TrainingDataQueries.all ++ StreamingQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ modules.map(q => q.name -> q.fn)

  def oracleSql: Map[String, String] =
    coreOracleSql ++ modules.flatMap(q => q.oracle.map(q.name -> _))

  private def coreOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "czech_normalize" ->
      s"""SELECT doc_id,
        |  regexp_replace(
        |    translate(
        |      lower(regexp_replace(regexp_replace(
        |        translate(text || ${duckLit(CzechProbe)},
        |                  chr(160) || chr(9) || chr(10) || '|', ' '),
        |        '^\\s+', ''), '\\s+$$', '')),
        |      '${CzechText.CzechSrc.take(16)}', '${CzechText.CzechDst.take(16)}'),
        |    '[^\\x00-\\x7F]', ' ', 'g') AS norm_text
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "price_parse" -> resource("/graft/oracle_price.sql"),
    "name_correct" -> resource("/graft/oracle_name.sql"),
    "detected_items" -> resource("/graft/oracle_detected.sql"),
    "det2_padded" -> resource("/graft/oracle_det2_padded.sql"),
    "json_boundary" -> resource("/graft/oracle_json_payloads.sql"),
    "pdf_split" -> {
      val rows = Seq(("a.pdf", "Lidl", 2), ("b.pdf", "Penny", 1),
        ("c.pdf", "Billa", 3)).flatMap { case (f, shop, n) =>
        val base = f.stripSuffix(".pdf")
        (1 to n).map(p =>
          // MediaBox 595x842pt at dpi 250 (round(pt * dpi / 72))
          s"('pages/valid/${base}_page_$p.png', '$f', '$shop', $p, 2066, 2924)")
      }
      "SELECT * FROM (VALUES\n" + rows.mkString(",\n") +
        ") AS t(image_id, filename, shop_name, page_no, width, height)" +
        "\nORDER BY image_id"
    },
    "pages_meta_join" -> resource("/graft/oracle_pages_meta.sql"),
    "regroup_flat" -> resource("/graft/oracle_regroup_flat.sql"),
    "item_detection_regroup" -> resource("/graft/oracle_regroup_json.sql"),
    "validity_sweep" -> resource("/graft/oracle_validity_sweep.sql"),
    "validity_propagate" -> resource("/graft/oracle_validity_propagate.sql"),
    "users_by_shop" -> resource("/graft/oracle_users_by_shop.sql"),
    "shop_valid_files" -> resource("/graft/oracle_shop_valid_files.sql"),
    "notifications" -> resource("/graft/oracle_notifications.sql"),
    "item_alerts" -> resource("/graft/oracle_item_alerts.sql"),
  )

  /** Render a Scala string as a DuckDB string literal: quotes doubled,
    * tab/newline emitted as chr(n) concatenation, UTF-8 text kept as-is. */
  private def duckLit(s: String): String = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    def flush(): Unit =
      if (sb.nonEmpty) { parts += s"'${sb.toString}'"; sb.clear() }
    s.foreach {
      case c @ ('\t' | '\n' | '\r') => flush(); parts += s"chr(${c.toInt})"
      case '\''                     => sb.append("''")
      case c                        => sb.append(c)
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString(" || ")
  }
}
