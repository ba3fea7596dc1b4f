package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items sketches (DataSketches frequencies — the
  * Misra-Gries/space-saving family): guaranteed-error heavy hitters
  * over a corpus whose exact top-k would need the full token shuffle.
  * Same pipeline shape as [[ThetaSketchOps]]: per-partition sketches,
  * a distributed merge Aggregator (the shuffle carries sketch bytes),
  * one model-sized result.
  *
  * Exactness contract: while distinct items fit the sketch's map
  * (2^[[LgMaxMapSize]] * 0.75 slots), counts are EXACT and the sketch
  * equals a plain frequency table — `corpus_heavy_hitters` hash-checks
  * that regime against DuckDB's exact top-k. Past capacity the
  * published epsilon bound (3.5/mapSize * n) takes over —
  * FreqSketchSpec pins it with planted heavy keys in a long tail.
  */
object FreqSketchOps {

  /** log2 max map size: exact while distinct items <= 0.75 * 2^11. */
  val LgMaxMapSize = 11

  private val serde = new ArrayOfStringsSerDe

  private def wrap(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  /** One serialized sketch per partition of `items`. `lgMaxMapSize`
    * widens the exact regime for callers whose key space is known to
    * fit a larger map (join_skew_probe sizes it to the join-key
    * cardinality at the gate SFs). */
  def partials(items: Dataset[String],
      lgMaxMapSize: Int = LgMaxMapSize): Dataset[Array[Byte]] = {
    implicit val enc: Encoder[Array[Byte]] =
      items.sparkSession.implicits.newByteArrayEncoder
    items.mapPartitions { it =>
      val sk = new ItemsSketch[String](1 << lgMaxMapSize)
      it.foreach(sk.update)
      Iterator.single(sk.toByteArray(serde))
    }
  }

  /** Distributed merge of serialized frequency sketches. */
  class MergeAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def unite(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else wrap(a).merge(wrap(b)).toByteArray(serde)
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

  /** Sketch a whole item column down to one serialized sketch. */
  def sketch(items: Dataset[String],
      lgMaxMapSize: Int = LgMaxMapSize): Array[Byte] = {
    // object-level tree fold, not a single-group aggregate (one
    // reducer would churn O(partitions x model) single-threaded; the
    // CmsSketchOps.sketch rationale, string serde makes it worse
    // here): one shuffled sqrt(n)-task level folds live sketches —
    // each input deserialized once, ONE serialization per task — then
    // the driver folds the survivors. Misra-Gries merge is
    // order-insensitive within the sketch's guarantees, and the hash
    // gate runs it in the exact regime where the result is order-FREE.
    // self-contained closure: builds its own serde so nothing
    // non-serializable is captured from the enclosing object
    val fold = (it: Iterator[Array[Byte]]) => {
      val sd = new ArrayOfStringsSerDe
      var acc: ItemsSketch[String] = null
      it.foreach { b =>
        if (b.nonEmpty) {
          val s = ItemsSketch.getInstance(Memory.wrap(b), sd)
          if (acc == null) acc = s else acc.merge(s)
        }
      }
      if (acc == null) Iterator.empty
      else Iterator.single(acc.toByteArray(sd))
    }
    val rdd = partials(items, lgMaxMapSize).rdd
    val mid = math.max(1,
      math.ceil(math.sqrt(rdd.getNumPartitions.toDouble)).toInt)
    val level1 = rdd.repartition(mid).mapPartitions(fold).collect()
    fold(level1.iterator).toSeq.headOption
      .getOrElse(new ItemsSketch[String](1 << lgMaxMapSize)
        .toByteArray(serde))
  }

  /** (item, estimate, lower bound, upper bound) rows, NO_FALSE_NEGATIVES,
    * estimate-descending then item for determinism. In the exact regime
    * lb == est == ub for every row. */
  def heavyHitters(bytes: Array[Byte]): Seq[(String, Long, Long, Long)] =
    wrap(bytes).getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound,
        r.getUpperBound))
      .toSeq
      .sortBy { case (item, est, _, _) => (-est, item) }

  /** The sketch's maximum possible count error (0 in the exact regime). */
  def maxError(bytes: Array[Byte]): Long = wrap(bytes).getMaximumError

  /** Enforce the exact-regime precondition at hash-checked call sites.
    * maxError == 0 holds iff the sketch never evicted — counts are
    * exact AND the treeReduce merge was order-free, so the result is
    * partitioning-independent and safe to hash-check. Past capacity
    * the merge topology (which varies with partition count) would leak
    * into the estimates; failing loudly here beats a flaky hash
    * mismatch at a bigger SF. */
  def requireExact(bytes: Array[Byte], context: String): Array[Byte] = {
    val err = maxError(bytes)
    require(err == 0L,
      s"$context: Misra-Gries sketch left its exact regime " +
        s"(maxError=$err > 0); item cardinality exceeded the map — " +
        "raise lgMaxMapSize to keep the result partitioning-" +
        "independent and hash-checkable")
    bytes
  }
}
