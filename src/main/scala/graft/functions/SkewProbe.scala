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
    // OBJECT-LEVEL fold, not pairwise treeReduce: a pairwise byte-array
    // unite re-serializes the ~width*depth*8B CMS accumulator once per
    // merged input (k inputs -> k serializations per task); folding
    // into live sketch OBJECTS deserializes each input once and
    // serializes once per task. One shuffled tree level (sqrt(n)
    // tasks) keeps the driver's share at sqrt(n) pairs — the same
    // topology discipline as treeReduce, minus the churn.
    val foldPairs = (it: Iterator[(Array[Byte], Array[Byte])]) => {
      val sd = new ArrayOfStringsSerDe
      var mg: ItemsSketch[String] = null
      var cms: CountMinSketch = null
      it.foreach { case (mgB, cmsB) =>
        if (mgB.nonEmpty) {
          val s = ItemsSketch.getInstance(Memory.wrap(mgB), sd)
          if (mg == null) mg = s else mg.merge(s)
        }
        if (cmsB.nonEmpty) {
          val c = CountMinSketch.readFrom(cmsB)
          if (cms == null) cms = c else cms.mergeInPlace(c)
        }
      }
      if (mg == null && cms == null)
        Iterator.empty
      else Iterator.single((
        if (mg == null) Array.emptyByteArray else mg.toByteArray(sd),
        if (cms == null) Array.emptyByteArray else cms.toByteArray))
    }
    val rdd = parts.rdd
    val mid = math.max(1,
      math.ceil(math.sqrt(rdd.getNumPartitions.toDouble)).toInt)
    val level1 = rdd.repartition(mid).mapPartitions(foldPairs).collect()
    val merged = foldPairs(level1.iterator)
      .toSeq.headOption
      .getOrElse((Array.emptyByteArray, Array.emptyByteArray))
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
