package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two scan
  * dimensions and range-sort files by the interleaved value, so every
  * file covers a NARROW range in BOTH dimensions at once. A single-key
  * sort gives perfect min/max file skipping on that key and none on any
  * other; Z-ordering trades a little locality on the first key for
  * skipping on both — the standard layout lever for multi-dimension
  * point/range scans at 100 TB (Delta/Iceberg OPTIMIZE ZORDER does the
  * same thing ahead of the same parquet min/max pruning).
  *
  * The engine needs no reader-side support: parquet row-group stats +
  * Spark's default filter pushdown do the skipping; this operator only
  * changes WHERE rows land.
  */
object ZOrder {

  /** Morton interleave of two non-negative integral columns, `bits` bits
    * each (x takes even bit positions, y odd). Inputs must lie in
    * [0, 2^bits); values are clamped by masking to keep the expression
    * total. Pure codegen'd built-ins — shiftright with literal amounts. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** Write `df` z-ordered on (xCol, yCol) into `nFiles` range-split,
    * internally sorted parquet files. Range partitioning keeps the curve
    * segments disjoint across files (each file owns one contiguous z
    * interval), which is what makes BOTH dimensions' min/max tight. */
  def writeZOrdered(
      df: DataFrame,
      dir: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      nFiles: Int = 32): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
