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

  // Matches Spark's window sort on `score DESC, id ASC` exactly:
  //  - s + 0.0 collapses -0.0 to 0.0 (the window sort treats them equal;
  //    Double.compare does not)
  //  - comparing the ORIGINAL scores descending (not negated ascending)
  //    keeps NaN as the GREATEST value, as Spark's descending double
  //    ordering ranks it — negation would flip NaN to sort last and the
  //    aggregator would silently drop a candidate the window form ranks
  //    first.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(p: (Double, Long), q: (Double, Long)): Int = {
      val c = java.lang.Double.compare(q._1 + 0.0, p._1 + 0.0) // score desc
      if (c != 0) c else java.lang.Long.compare(p._2, q._2)    // id asc
    }
  }

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  // The buffer is kept SORTED (best first) as an invariant, so the hot
  // path — a row no better than the current k-th best — is one compare
  // and zero allocation. Re-sorting the whole buffer per row (the r01
  // shape) paid O(k log k) + list churn on every input.
  override def reduce(
      buf: List[(Double, Long)],
      row: (Double, Long)): List[(Double, Long)] = {
    val full = buf.lengthCompare(k) >= 0
    if (full && ord.compare(row, buf.last) >= 0) buf
    else {
      val (before, after) = buf.span(x => ord.compare(x, row) <= 0)
      val inserted = before ::: (row :: after)
      if (full) inserted.init else inserted
    }
  }

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
