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
  }
}

object GraftExtensions {
  val arrayDotDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (children: Seq[Expression]) => ArrayDot(children(0), children(1)))

  /** Idempotent per-session registration for sessions built without
    * extensions (e.g. the driver-owned harness session). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDot(exprs(0), exprs(1)), "scala_udf")
}
