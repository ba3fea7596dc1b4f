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
    "graft_token_count" -> lift1(graft.analysis.TextAnalysis.tokenCount))

  val textDescriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    textFunctions.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.analysis.TextAnalysis", name), builder)
    }

  /** Idempotent per-session registration for sessions built without
    * extensions (e.g. the driver-owned harness session). Registers the
    * custom expression plus the whole domain function library, so every
    * operator of the engine is reachable from pure SQL:
    *
    *   SELECT graft_correct_name(ocr_text),
    *          graft_process_price(shop, txt, 'item_price').item_price,
    *          graft_normalize_czech(name), graft_parse_price(s),
    *          array_dot(a, b) ...
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
  }
}
