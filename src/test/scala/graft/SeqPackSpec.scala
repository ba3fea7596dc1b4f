package graft

import graft.analysis.SeqPack
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytic truth for sequence packing: hand-packed groups covering
  * exact-fit, overflow-to-next, over-capacity single docs, and the
  * group boundary. */
class SeqPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def words(n: Int) = Seq.fill(n)("w").mkString(" ")

  test("greedy next-fit with capacity 10, groups of 4") {
    // group 0 (ids 0-3): toks 4,4,3,9 -> [4+4], [3], [9]? NO —
    // next-fit: 4+4=8, +3=11>10 -> seq2: 3, +9=12>10 -> seq3: 9
    // group 1 (ids 4-7): toks 12,5,5,1 -> over-cap 12 alone; 5+5+1=11>10
    //   -> 5+5=10 exact fit, then 1 opens seq3
    val docs = Seq(
      (0L, words(4)), (1L, words(4)), (2L, words(3)), (3L, words(9)),
      (4L, words(12)), (5L, words(5)), (6L, words(5)), (7L, words(1)))
      .toDF("doc_id", "text")
    val got = SeqPack.pack(docs, groupSize = 4, capacity = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (0L, 1L) -> ((2L, 8L, 8000L)),
      (0L, 2L) -> ((1L, 3L, 3000L)),
      (0L, 3L) -> ((1L, 9L, 9000L)),
      (1L, 1L) -> ((1L, 12L, 12000L)),
      (1L, 2L) -> ((2L, 10L, 10000L)),
      (1L, 3L) -> ((1L, 1L, 1000L))))
  }

  test("packDocs is the per-doc emission of the same greedy loop") {
    val docs = Seq(
      (0L, words(4)), (1L, words(4)), (2L, words(3)), (3L, words(9)),
      (4L, words(12)), (5L, words(5)), (6L, words(5)), (7L, words(1)))
      .toDF("doc_id", "text")
    val perDoc = SeqPack.packDocs(docs, groupSize = 4, capacity = 10)
    // doc-level assignment: each doc lands where pack's loop put it
    val asg = perDoc.collect()
      .map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert(asg == Map(
      0L -> ((0L, 1L)), 1L -> ((0L, 1L)), 2L -> ((0L, 2L)),
      3L -> ((0L, 3L)), 4L -> ((1L, 1L)), 5L -> ((1L, 2L)),
      6L -> ((1L, 2L)), 7L -> ((1L, 3L))))
    // ...and its per-sequence rollup equals pack() exactly
    val rolled = perDoc.groupBy(col("grp"), col("seq_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("fill_bp",
        floor(col("n_tokens") * 10000.0 / 10).cast("long"))
    val packed = SeqPack.pack(docs, groupSize = 4, capacity = 10)
    assert(rolled.except(packed).isEmpty && packed.except(rolled).isEmpty)
  }

  test("packing is doc_id-ordered regardless of input partition order") {
    val docs = Seq((3L, words(9)), (0L, words(4)), (2L, words(3)),
        (1L, words(4)))
      .toDF("doc_id", "text").repartition(3)
    val got = SeqPack.pack(docs, groupSize = 4, capacity = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 8L), (2L, 1L, 3L), (3L, 1L, 9L)))
  }

  test("sorted re-id packs tighter where length variance binds") {
    import org.apache.spark.sql.functions.{col, size, split}
    // bimodal: lengths alternate 6 / 4 by id. Unsorted next-fit with
    // capacity 10 sees 6,4,6,4... -> every pair fits exactly BUT the
    // alternation 6,4 packs pairwise only when adjacent ids pair up;
    // make it adversarial: 6,5,6,5 -> nothing pairs (11 > 10), every
    // doc rides alone = 8 sequences. Sorted groups the 5s and 6s:
    // 5+5 fits, 6 alone -> 4+... = 6 sequences.
    val docs = (0L until 8L).map(i =>
        (i, words(if (i % 2 == 0) 6 else 5)))
      .toDF("doc_id", "text")
    val unsorted = SeqPack.pack(docs, groupSize = 8, capacity = 10)
    assert(unsorted.count() == 8) // 6,5 never pair

    val toks = docs.withColumn("tok",
      size(split(col("text"), " ")).cast("long"))
    val reid = graft.relational.Scale
      .globalRowNumber(toks, Seq(col("tok"), col("doc_id")))
      .select((col("rn") - 1).cast("long").as("doc_id"), col("text"))
    val sorted = SeqPack.pack(reid, groupSize = 8, capacity = 10)
    assert(sorted.count() == 6) // 5+5, 5+5, then four lone 6s
  }
}
