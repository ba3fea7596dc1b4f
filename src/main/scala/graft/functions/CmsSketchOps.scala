package graft.functions

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable count-min sketches (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary: the count-min sketch and its
  * applications") over Spark's own `spark-sketch` implementation —
  * the POINT-FREQUENCY member of the engine's sketch family (theta =
  * distinct set algebra, KLL = quantiles, Misra-Gries = heavy-hitter
  * identity, CMS = frequency of an arbitrary probed key without
  * shipping the key space anywhere).
  *
  * Dataflow is the family's standard shape: one sketch per partition
  * ([[partials]]), a distributed [[MergeAggregator]] union (the
  * shuffle carries sketch bytes, never keys), probe on the final
  * model-sized table.
  *
  * Determinism contract (what makes the query hash-checkable): CMS
  * counters are plain sums, so the final table — and therefore every
  * estimate AND the serialized bytes — is identical under ANY
  * partitioning or merge order, unlike HLL's HIP estimator
  * (`q_cms_counts` proves byte-equality of two differently-partitioned
  * builds). Estimates are exact for a probed key unless that key
  * collides with other traffic in ALL [[Depth]] rows; at the test
  * cardinalities (≤20k distinct keys vs [[Width]] 131072 counters)
  * the expected number of over-counted probes is ≪ 1 and the outcome
  * is deterministic, so the exact-count oracle is stable across runs.
  * Past capacity the same code degrades to the published guarantee
  * (overcount ≤ 2N/width with probability 1 − 2^−depth), which
  * CmsSketchSpec pins on a deliberately undersized sketch.
  */
object CmsSketchOps {

  /** Hash-row count: error probability halves per row. */
  val Depth = 5

  /** Counters per row: published overcount bound is 2N/Width. */
  val Width = 1 << 17

  /** Fixed hash seed — part of the sketch identity; two sketches only
    * merge if built with the same (depth, width, seed). */
  val Seed = 42

  def empty(depth: Int = Depth, width: Int = Width): CountMinSketch =
    CountMinSketch.create(depth, width, Seed)

  /** One serialized sketch per partition of `keys`. */
  def partials(keys: Dataset[Long], depth: Int = Depth,
      width: Int = Width): Dataset[Array[Byte]] = {
    implicit val enc: Encoder[Array[Byte]] =
      keys.sparkSession.implicits.newByteArrayEncoder
    keys.mapPartitions { it =>
      val sk = empty(depth, width)
      it.foreach(sk.addLong)
      Iterator.single(sk.toByteArray)
    }
  }

  /** Distributed merge of serialized sketch partials (counter-wise
    * integer addition — associative, commutative, order-free). */
  class MergeAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def unite(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else CountMinSketch.readFrom(a)
        .mergeInPlace(CountMinSketch.readFrom(b)).toByteArray
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

  /** Sketch a whole key column down to one serialized table. The merge
    * is an OBJECT-LEVEL tree fold, not a single-group aggregate and
    * not a pairwise byte-array treeReduce: one reducer would
    * deserialize + re-serialize every partition's Depth×Width table in
    * sequence (O(partitions × model) single-threaded churn — measured
    * 2.3s/sketch at 32 partitions, and a 1000-partition cluster scan
    * would serialize 5 GB through one task), and even treeReduce's
    * pairwise unite re-serializes the accumulator once per merged
    * input. One shuffled sqrt(n)-task level folds live sketch objects
    * (deserialize each input once, serialize once per task), then the
    * driver folds the sqrt(n) survivors. Counter addition is
    * exact-integer commutative/associative, so fold order changes
    * nothing — the table stays byte-identical under any partitioning
    * (CmsSketchSpec pins it). */
  def sketch(keys: Dataset[Long], depth: Int = Depth,
      width: Int = Width): Array[Byte] = {
    val fold = (it: Iterator[Array[Byte]]) => {
      var acc: CountMinSketch = null
      it.foreach { b =>
        if (b.nonEmpty) {
          val s = CountMinSketch.readFrom(b)
          if (acc == null) acc = s else acc.mergeInPlace(s)
        }
      }
      if (acc == null) Iterator.empty
      else Iterator.single(acc.toByteArray)
    }
    val rdd = partials(keys, depth, width).rdd
    val mid = math.max(1,
      math.ceil(math.sqrt(rdd.getNumPartitions.toDouble)).toInt)
    val level1 = rdd.repartition(mid).mapPartitions(fold).collect()
    fold(level1.iterator).toSeq.headOption
      .getOrElse(empty(depth, width).toByteArray)
  }

  /** Estimated frequency of `key` (never under the true count). */
  def estimate(bytes: Array[Byte], key: Long): Long =
    CountMinSketch.readFrom(bytes).estimateCount(key)

  /** Deserialize ONCE, probe many: [[estimate]] re-reads the whole
    * Depth×Width table per call, which turns an n-key probe loop into
    * n×model churn (measured ~3s of the old join_skew_probe at sf0.1).
    * Returns a closure over the live sketch. */
  def prober(bytes: Array[Byte]): Long => Long = {
    val sk = CountMinSketch.readFrom(bytes)
    k => sk.estimateCount(k)
  }

  /** Total stream length folded into the sketch. */
  def totalCount(bytes: Array[Byte]): Long =
    CountMinSketch.readFrom(bytes).totalCount()
}
