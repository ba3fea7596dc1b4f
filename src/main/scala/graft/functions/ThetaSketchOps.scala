package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable theta sketches (Apache DataSketches) for distinct-count
  * SET OPERATIONS — the sketch family HLL cannot provide: union AND
  * intersection AND difference over arbitrary splits, the
  * audience-overlap workhorse. Dataflow is the sketch pipeline shape:
  * one exact-mode UpdateSketch per partition ([[partials]]), a
  * distributed union [[UnionAggregator]] merge (shuffle carries
  * sketch bytes, never raw keys), set operations on the final
  * MODEL-sized compacts.
  *
  * Exactness contract: a theta sketch below its nominal-entry budget
  * (2^[[LgK]] = 65536 here) retains every distinct hash — estimates,
  * intersections, and differences are EXACT integers, so the whole
  * operator hash-checks against DuckDB's exact set algebra
  * (`q_theta_sketch`). Past the budget the same code degrades to the
  * published bounded-error sampling regime — the 100 TB path, where
  * ThetaSketchSpec pins the error bound instead.
  */
object ThetaSketchOps {

  /** log2 nominal entries: exact to 65536 distinct keys per sketch. */
  val LgK = 16

  private def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** One compact exact-mode sketch per partition of `keys`. */
  def partials(keys: Dataset[Long]): Dataset[Array[Byte]] = {
    implicit val enc: Encoder[Array[Byte]] =
      keys.sparkSession.implicits.newByteArrayEncoder
    keys.mapPartitions { it =>
      val sk = UpdateSketch.builder().setLogNominalEntries(LgK).build()
      it.foreach(sk.update)
      Iterator.single(sk.compact().toByteArray)
    }
  }

  /** Distributed union-merge of compact sketch bytes. */
  class UnionAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def unite(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val u = SetOperation.builder().setLogNominalEntries(LgK)
          .buildUnion()
        u.union(wrap(a))
        u.union(wrap(b))
        u.getResult.toByteArray
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

  /** One compact sketch PER COLUMN per partition from rows of
    * pre-hashed column values — the one-pass multi-column NDV shape
    * (ANALYZE builds every column's sketch from a SINGLE table scan,
    * not one scan per column). `nullSentinel` marks a null cell (the
    * caller maps nulls to it in-plan; a genuine hash landing on the
    * sentinel is the same 2^-64 event as any hash collision the NDV
    * estimate already tolerates). Emits (colIdx, compactBytes). */
  def multiPartials(rows: Dataset[Seq[Long]], nCols: Int,
      nullSentinel: Long): Dataset[(Int, Array[Byte])] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val sks = Array.fill(nCols)(
        UpdateSketch.builder().setLogNominalEntries(LgK).build())
      it.foreach { vs =>
        var i = 0
        while (i < nCols) {
          val v = vs(i)
          if (v != nullSentinel) sks(i).update(v)
          i += 1
        }
      }
      Iterator.tabulate(nCols)(i => (i, sks(i).compact().toByteArray))
    }
  }

  /** Per-column union of [[multiPartials]] (nCols tiny groups; each
    * group merges one model-sized compact per partition). */
  def sketchColumns(rows: Dataset[Seq[Long]], nCols: Int,
      nullSentinel: Long): Map[Int, Array[Byte]] = {
    import rows.sparkSession.implicits._
    val agg = new UnionAggregator
    multiPartials(rows, nCols, nullSentinel)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .collect().toMap
  }

  /** Sketch an entire key column down to one compact byte array
    * (distributed partials + distributed union; the single collected
    * row is model-sized — at most ~8 x 2^LgK bytes). Empty input
    * yields an empty sketch. */
  def sketch(keys: Dataset[Long]): Array[Byte] = {
    val agg = new UnionAggregator
    val merged = partials(keys).select(agg.toColumn).head()
    if (merged.isEmpty)
      UpdateSketch.builder().setLogNominalEntries(LgK).build()
        .compact().toByteArray
    else merged
  }

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** (union, intersection, aNotB) estimates of two compact sketches. */
  def setOps(a: Array[Byte], b: Array[Byte]): (Double, Double, Double) = {
    val u = SetOperation.builder().setLogNominalEntries(LgK).buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    val i = SetOperation.builder().setLogNominalEntries(LgK)
      .buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    val d = Sketches.setOperationBuilder().buildANotB()
    (u.getResult.getEstimate, i.getResult.getEstimate,
      d.aNotB(wrap(a), wrap(b)).getEstimate)
  }
}
