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

  /** N-dimensional Morton interleave: dimension d of `xs` takes bit
    * positions d, d+n, d+2n, ... (the 2-dim [[zValue]] generalized the
    * way OPTIMIZE ZORDER BY accepts arbitrary column lists). Total key
    * width n*bits must fit a long's 63 value bits. */
  def zValueN(xs: Seq[Column], bits: Int): Column = {
    val n = xs.size
    require(n >= 1, "at least one dimension")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit 63 bits, got $n x $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      xs.zipWithIndex.foldLeft(acc) { case (a, (x, d)) =>
        a + shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) *
          lit(1L << (n * i + d))
      }
    }
  }

  /** [[writeZOrdered]] over any dimension list via [[zValueN]]. */
  def writeZOrderedN(
      df: DataFrame,
      dir: String,
      cols: Seq[String],
      bits: Int,
      nFiles: Int): Unit =
    df.withColumn("__z", zValueN(cols.map(col), bits))
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** DuckDB oracle twin of [[zValue]] at bits = 16, via the classic
    * shift-and-mask bit spread (identical Morton value, O(log bits)
    * ops): even bits carry x, odd bits carry y. */
  def zValue16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  private def spread16Sql(x: String): String = {
    val s1 = s"((($x) | (($x) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** Affine rescale of a dimension onto the 16-bit grid — exact integer
    * `div` (truncating in both engines), constant-dimension safe via
    * the greatest(span, 1) clamp. SQL twin for oracles; the Spark side
    * writes the same arithmetic with `div`. */
  def normalize16Sql(x: String, mn: String, mx: String): String =
    s"(($x - $mn) * 65535 // greatest($mx - $mn, 1))"

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
