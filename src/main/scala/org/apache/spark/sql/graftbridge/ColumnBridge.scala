package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters —
  * the standard seam for libraries shipping custom Catalyst expressions
  * as user-facing Columns (the public API only exposes registry-based
  * SQL registration). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column -> Expression conversion. `expression` wraps the
    * column LAZILY (`ColumnNodeExpression`, Unevaluable) and only
    * Dataset API paths unwrap it — inside a FunctionRegistry builder it
    * reaches codegen unconverted and crashes. This walks the column's
    * node tree NOW; embedded function calls come out as
    * `UnresolvedFunction`s, which the analyzer then resolves like any
    * SQL-authored call. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The persisted RDD id backing a `localCheckpoint()`ed DataFrame (its
    * plan is a LogicalRDD leaf). Lets iterative operators free a
    * superseded round's blocks EXACTLY — `Dataset.unpersist` does not
    * touch checkpoint blocks, and diffing `getPersistentRDDs` around the
    * checkpoint would misattribute concurrently persisted RDDs. */
  def checkpointRddId(df: org.apache.spark.sql.DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
}
