package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score, id) pairs per group
  * in a fixed-size buffer.
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k`) must shuffle and SORT every row of each
  * group; this aggregator reduces map-side to at most k rows per group
  * per partition before the shuffle — at 100 TB the shuffle volume drops
  * from |rows| to |groups| * k * |partitions|, and no full sort happens.
  *
  * Ordering: score DESC, then id ASC — identical tiebreak to the window
  * formulation, so results are interchangeable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // s + 0.0 collapses -0.0 to 0.0 before negation: Spark's window sort
  // treats -0.0 == 0.0, while Double.compare distinguishes them — without
  // the normalization a -0.0 vs 0.0 tie at the rank-k boundary could order
  // differently from the row_number formulation this claims parity with.
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-(s + 0.0), id) }

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def reduce(
      buf: List[(Double, Long)],
      row: (Double, Long)): List[(Double, Long)] =
    trim(row :: buf)

  override def merge(
      a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ::: b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
