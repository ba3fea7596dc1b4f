package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketches (DataSketches KLL) — the third leg of
  * the sketch triad next to theta (distinct set ops) and frequencies
  * (heavy hitters): rank/quantile queries over a column whose exact
  * percentile would need a global sort. Same pipeline shape: one
  * sketch per partition, a distributed merge Aggregator, one
  * model-sized result.
  *
  * Exactness contract: a KLL sketch whose item count stays below its
  * first compaction holds EVERY item, and quantiles with INCLUSIVE
  * search criteria equal SQL `percentile_disc` exactly —
  * `q_kll_quantiles` hash-checks that regime against DuckDB. Past
  * capacity the published normalized rank error (~1.65% at the
  * default k=200; smaller at the k used here) takes over, pinned by
  * QuantileSketchSpec on a 500k stream.
  */
object QuantileSketchOps {

  /** KLL k parameter: the retained-capacity / accuracy knob. k=32768
    * holds every item before the first compaction at every test SF's
    * corpus cardinality (exact regime) and carries a sub-0.1%
    * normalized rank error beyond it. */
  val K = 32768

  private def wrap(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.wrap(Memory.wrap(bytes))

  /** One serialized sketch per partition of `values`. */
  def partials(values: Dataset[Long]): Dataset[Array[Byte]] = {
    implicit val enc: Encoder[Array[Byte]] =
      values.sparkSession.implicits.newByteArrayEncoder
    values.mapPartitions { it =>
      val sk = KllLongsSketch.newHeapInstance(K)
      it.foreach(sk.update)
      Iterator.single(sk.toByteArray)
    }
  }

  /** Distributed merge of serialized KLL sketches. */
  class MergeAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def unite(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val sk = KllLongsSketch.heapify(Memory.wrap(a))
        sk.merge(wrap(b))
        sk.toByteArray
      }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      unite(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      unite(a, b)
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
  }

  /** Sketch a whole value column down to one serialized sketch. */
  def sketch(values: Dataset[Long]): Array[Byte] = {
    val agg = new MergeAggregator
    val merged = partials(values).select(agg.toColumn).head()
    if (merged.isEmpty) KllLongsSketch.newHeapInstance(K).toByteArray
    else merged
  }

  /** Quantile at `rank` with INCLUSIVE criteria — equals SQL
    * percentile_disc while the sketch is in the exact regime.
    * DataSketches contract: throws on an EMPTY sketch (quantiles of
    * nothing are undefined) — callers over possibly-empty inputs gate
    * on the sketch's item count first, exactly as SQL callers guard
    * percentile_disc over an empty relation. */
  def quantile(bytes: Array[Byte], rank: Double): Long =
    wrap(bytes).getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)

  def retainedAll(bytes: Array[Byte]): Boolean = {
    val sk = wrap(bytes)
    sk.getN == sk.getNumRetained
  }

  /** The sketch's normalized rank error bound (two-sided). */
  def rankError(bytes: Array[Byte]): Double =
    wrap(bytes).getNormalizedRankError(false)
}
