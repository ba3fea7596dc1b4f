package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SimHash bit-vote aggregator: folds word hashes into per-bit vote
  * counters and emits the signed-majority signature.
  *
  * Replaces the explode-32-rows-per-word formulation: map-side partial
  * aggregation reduces each partition to one `bits`-long vector per
  * document, so the shuffle carries |docs| x bits longs instead of
  * |words| x bits rows.
  */
class BitVoteAggregator(bits: Int)
    extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < bits) {
      buf(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] =
    ExpressionEncoder[Long]()
}
