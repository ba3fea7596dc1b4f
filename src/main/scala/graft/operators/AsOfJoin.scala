package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively: for each left
  * row, attach the most recent right row with `right.ts <= left.ts` within
  * the same key.
  *
  * Implemented as the union + ordered-window formulation (SURVEY §2's
  * "compose existing ops" preference): tag both sides, union on a common
  * schema, then `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER
  * BY ts, side)` carries the latest right payload forward to each left
  * row. One shuffle on the key, linear in |L| + |R| — no per-row probe,
  * no range cross join; at equal timestamps the right row sorts first, so
  * the match is inclusive (>=), matching DuckDB/kdb ASOF semantics.
  */
object AsOfJoin {

  /** @param rightVals right columns to carry onto matched left rows,
    *                  emitted typed as `asof_<name>` (NULL = no prior row) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightVals: Seq[String]): DataFrame =
    joined(left, right, key, ts, rightVals, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` within the key (NULL = no later row). Same
    * union + ordered-window shape as [[backward]], with the timestamp
    * ordering reversed. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightVals: Seq[String]): DataFrame =
    joined(left, right, key, ts, rightVals, forward = true)

  /** Catalyst's ORDER BY type rule: maps are unorderable; arrays and
    * structs are orderable iff their element/field types are. */
  private def isOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case ArrayType(et, _) => isOrderable(et)
      case StructType(fields) => fields.forall(f => isOrderable(f.dataType))
      case _ => true
    }
  }

  private def joined(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightVals: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("__rv", "__side", "__m")
    val clashes = (leftCols ++ right.columns).filter(reserved)
    require(clashes.isEmpty,
      s"AsOfJoin reserves column names ${reserved.mkString(", ")}; " +
        s"input carries ${clashes.distinct.mkString(", ")}")
    val otherLeft = leftCols.filterNot(c => c == key || c == ts)

    // ASOF comparisons never match a NULL timestamp, and the key equality
    // never matches a NULL key (SQL equality semantics): null-ts/null-key
    // right rows must not exist in the union (a null-ts row would sort
    // nulls-first and forward-fill a spurious payload; a null-key row
    // would land in the null-key window partition and match null-key
    // left rows). Null-key left rows then sit in a partition with no
    // right rows and come out unmatched; null-ts left rows are forced
    // unmatched below.
    val rp = right.filter(col(ts).isNotNull && col(key).isNotNull)
      .select(col(key), col(ts), struct(rightVals.map(col): _*).as("__rv"))
    val payloadType = rp.schema("__rv").dataType

    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__rv")) ++ otherLeft.map(col)): _*)
    val r = rp.select(
      (Seq(col(key), col(ts), lit(0).as("__side"), col("__rv")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // Final tiebreak on the payload struct itself: when several right rows
    // share one (key, ts), `last` deterministically carries the greatest
    // payload (struct ordering is lexicographic by field) instead of
    // whichever row the shuffle happened to order last. Left rows carry a
    // NULL payload, which sorts first and never wins the tie.
    // The payload tiebreak only applies when every rightVals type is
    // orderable — a MapType payload would fail the whole join at
    // analysis if placed in an ORDER BY, so unorderable payloads fall
    // back to ts+side ordering (ts ties then carry an arbitrary-but-
    // matched right row, the pre-tiebreak behavior).
    // Forward direction = the same scan over reversed time.
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val orderCols =
      if (isOrderable(payloadType))
        Seq(tsOrder, col("__side"), col("__rv"))
      else Seq(tsOrder, col("__side"))
    val w = Window.partitionBy(col(key))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m",
        // a null-ts LEFT row matches nothing regardless of where the
        // null sorted (desc ordering would otherwise place it after
        // every right row and hand it a spurious payload)
        when(col(ts).isNull, lit(null).cast(payloadType))
          .otherwise(last(col("__rv"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
