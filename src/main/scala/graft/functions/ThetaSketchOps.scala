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
