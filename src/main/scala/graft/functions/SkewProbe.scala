package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.util.sketch.CountMinSketch

/** ONE-scan builder for the two-sketch join-skew probe: every
  * partition folds its keys into a Misra-Gries sketch (nominates heavy
  * hitters, no false negatives) AND a count-min sketch (confirms each
  * candidate's frequency) in the same pass, and the pair of byte
  * arrays rides one treeReduce. The two estimates keep their
  * independence of DERIVATION — different algorithms, different hash
  * families, different error models — while sharing the scan, which
  * halves the probe's dominant cost (the fact-table read; the sketches
  * themselves are model-sized).
  *
  * Merge order freedom: CMS counters are plain sums (order-free
  * always); the MG merge is order-insensitive in the exact regime,
  * which [[FreqSketchOps.requireExact]] enforces at the call site.
  */
object SkewProbe {

  /** (mgBytes, cmsBytes) from a single pass over `keys`. MG updates on
    * the key's decimal string (same item domain as
    * `col.cast("string")`); CMS on the raw long. */
  def sketchBoth(
      keys: Dataset[Long],
      lgMaxMapSize: Int = FreqSketchOps.LgMaxMapSize,
      depth: Int = CmsSketchOps.Depth,
      width: Int = CmsSketchOps.Width): (Array[Byte], Array[Byte]) = {
    implicit val enc: Encoder[(Array[Byte], Array[Byte])] =
      ExpressionEncoder[(Array[Byte], Array[Byte])]()
    val parts = keys.mapPartitions { it =>
      val sd = new ArrayOfStringsSerDe
      val mg = new ItemsSketch[String](1 << lgMaxMapSize)
      val cms = CountMinSketch.create(depth, width, CmsSketchOps.Seed)
      it.foreach { k => mg.update(k.toString); cms.addLong(k) }
      Iterator.single((mg.toByteArray(sd), cms.toByteArray))
    }
    // pairwise unite: each side's own associative merge, same closure
    // hygiene as the single-sketch treeReduces (serde built inside).
    val unite = (a: (Array[Byte], Array[Byte]),
        b: (Array[Byte], Array[Byte])) => {
      val mgU =
        if (a._1.isEmpty) b._1
        else if (b._1.isEmpty) a._1
        else {
          val sd = new ArrayOfStringsSerDe
          ItemsSketch.getInstance(Memory.wrap(a._1), sd)
            .merge(ItemsSketch.getInstance(Memory.wrap(b._1), sd))
            .toByteArray(sd)
        }
      val cmsU =
        if (a._2.isEmpty) b._2
        else if (b._2.isEmpty) a._2
        else CountMinSketch.readFrom(a._2)
          .mergeInPlace(CountMinSketch.readFrom(b._2)).toByteArray
      (mgU, cmsU)
    }
    val merged =
      try parts.rdd.treeReduce(unite, depth = 2)
      catch { // empty input: treeReduce has no identity element
        case _: UnsupportedOperationException =>
          (Array.emptyByteArray, Array.emptyByteArray)
      }
    val mg = if (merged._1.isEmpty)
      new ItemsSketch[String](1 << lgMaxMapSize)
        .toByteArray(new ArrayOfStringsSerDe)
    else merged._1
    val cms = if (merged._2.isEmpty)
      CountMinSketch.create(depth, width, CmsSketchOps.Seed).toByteArray
    else merged._2
    (mg, cms)
  }
}
