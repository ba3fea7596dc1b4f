package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayDot

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for SQL use
  * (`spark.sql("SELECT array_dot(a, b) ...")`).
  *
  * Wire-up: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.arrayDotDescriptor)
    GraftExtensions.textDescriptors.foreach(e.injectFunction)
    GraftExtensions.signatureDescriptors.foreach(e.injectFunction)
    // materialized-summary routing (no-op until a summary is registered)
    e.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  val arrayDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (children: Seq[Expression]) => ArrayDot(children(0), children(1)))

  /** Lift a Column-composition operator into a SQL expression builder:
    * the registered function expands to the SAME Catalyst tree the
    * DataFrame API builds, so SQL and Column callers share one
    * implementation (no scalar twin to drift). */
  private def lift1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    exprs => ColumnBridge.eagerExpression(f(ColumnBridge.column(exprs.head)))

  /** The text-pipeline operators as SQL functions. */
  val textFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_scrub_pii" -> lift1(graft.analysis.TextAnalysis.scrubPii),
    "graft_quality_score" -> lift1(graft.analysis.TextAnalysis.qualityScore),
    "graft_lang_id" -> lift1(graft.analysis.TextAnalysis.langId),
    "graft_token_count" -> lift1(graft.analysis.TextAnalysis.tokenCount),
    "graft_url_norm" -> lift1(graft.text.UrlNormalize.norm),
    "graft_url_scope" -> lift1(graft.text.UrlScope.classify))

  val textDescriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    textFunctions.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.analysis.TextAnalysis", name), builder)
    }

  /** The dedup signature expressions as SQL functions, bound to the
    * dedup family's published constants (MinhashK/A/B/P, WinnowK/W) so
    * SQL callers get signatures BIT-IDENTICAL to the Dataset operators
    * — one band key computed in SQL joins against one computed by
    * [[graft.dedup.Dedup.minhashLshPairs]]. */
  val signatureFunctions: Seq[(String, Seq[Expression] => Expression)] = {
    import graft.dedup.Dedup
    Seq(
      "graft_minhash_sig" -> (exprs => graft.functions.MinhashSig(
        exprs.head,
        (0 until Dedup.MinhashK).map(Dedup.minhashA),
        (0 until Dedup.MinhashK).map(Dedup.minhashB),
        Dedup.MinhashP)),
      "graft_simhash_sig" ->
        (exprs => graft.functions.SimhashSig(exprs.head)),
      "graft_winnow_fps" -> (exprs => graft.functions.WinnowSig(
        exprs.head,
        graft.analysis.TextAnalysis.WinnowK,
        graft.analysis.TextAnalysis.WinnowW)))
  }

  val signatureDescriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    signatureFunctions.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder)
    }

  /** Idempotent per-session registration for sessions built without
    * extensions (e.g. the driver-owned harness session). Registers the
    * custom expression plus the whole domain function library, so every
    * operator of the engine is reachable from pure SQL:
    *
    *   SELECT graft_correct_name(ocr_text),
    *          graft_process_price(shop, txt, 'item_price').item_price,
    *          graft_normalize_czech(name), graft_parse_price(s),
    *          array_dot(a, b), graft_minhash_sig(shingles),
    *          graft_simhash_sig(shingles), graft_winnow_fps(t),
    *          graft_theta_estimate(graft_theta_union(sk)),
    *          graft_kll_quantile(graft_kll_merge(sk), 0.5),
    *          graft_freq_heavy_hitters(graft_freq_merge(sk)) ...
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "scala_udf")
    textFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    spark.udf.register("graft_correct_name",
      (s: String) => graft.text.NameCorrection.correctDefault(s))
    spark.udf.register("graft_normalize_czech",
      (s: String) => graft.text.CzechText.normalize(s))
    // native expressions since r8 (SURVEY §2.7 promotion)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_parse_price",
      exprs => graft.functions.ParsePrice(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_process_price",
      exprs => graft.functions.ProcessPrice(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    // dedup signature expressions (r9): native Catalyst trees, same
    // registration path as the text/price surface
    signatureFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    // mergeable-sketch surface (r9): the theta/KLL/frequencies
    // Aggregators as SQL AGGREGATES over serialized sketch bytes, plus
    // scalar readers — `SELECT graft_theta_estimate(
    // graft_theta_union(sk)) FROM partials` composes the whole
    // distributed sketch pipeline from pure SQL. Registered as udaf
    // wrappers (the documented Aggregator->SQL path); they appear in
    // no SparkEntry query plan, so the PlanLint UDF allowlist is
    // untouched.
    locally {
      import org.apache.spark.sql.functions.udaf
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      import graft.functions.{CmsSketchOps, FreqSketchOps, QuantileSketchOps, ThetaSketchOps}
      val bytesEnc = ExpressionEncoder[Array[Byte]]()
      spark.udf.register("graft_theta_union",
        udaf(new ThetaSketchOps.UnionAggregator, bytesEnc))
      spark.udf.register("graft_theta_estimate",
        (b: Array[Byte]) => ThetaSketchOps.estimate(b))
      spark.udf.register("graft_theta_set_ops",
        (a: Array[Byte], b: Array[Byte]) => ThetaSketchOps.setOps(a, b))
      spark.udf.register("graft_kll_merge",
        udaf(new QuantileSketchOps.MergeAggregator, bytesEnc))
      spark.udf.register("graft_kll_quantile",
        (b: Array[Byte], rank: Double) =>
          QuantileSketchOps.quantile(b, rank))
      spark.udf.register("graft_freq_merge",
        udaf(new FreqSketchOps.MergeAggregator, bytesEnc))
      spark.udf.register("graft_freq_heavy_hitters",
        (b: Array[Byte]) => FreqSketchOps.heavyHitters(b))
      spark.udf.register("graft_cms_merge",
        udaf(new CmsSketchOps.MergeAggregator, bytesEnc))
      spark.udf.register("graft_cms_estimate",
        (b: Array[Byte], key: Long) => CmsSketchOps.estimate(b, key))
    }
  }
}
