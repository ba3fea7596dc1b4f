package graft

import graft.analysis.{CorpusShard, SeqPack}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Analytic truth for output sharding: the hash permutation is
  * deterministic and partition-order-free, every sequence lands in
  * exactly one shard with dense 1..n positions, and the manifest is
  * the exact rollup of the assignment. */
class CorpusShardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def words(n: Int) = Seq.fill(n)("w").mkString(" ")

  private lazy val docs = (0L until 64L)
    .map(i => (i, words(3 + (i * 2 % 7).toInt)))
    .toDF("doc_id", "text")

  test("conservation: every packed sequence lands in exactly one shard") {
    val packed = SeqPack.pack(docs, 8, 16).collect()
    val assigned = CorpusShard.assign(docs, 8, 16, numShards = 4).collect()
    assert(assigned.length == packed.length)
    assert(assigned.map(r => (r.getLong(2), r.getLong(3))).toSet ==
      packed.map(r => (r.getLong(0), r.getLong(1))).toSet)
    // docs/tokens survive the permutation untouched
    assert(assigned.map(_.getLong(5)).sum == packed.map(_.getLong(3)).sum)
  }

  test("positions are dense 1..n per shard, in hash order") {
    val rows = CorpusShard.assign(docs, 8, 16, numShards = 4).collect()
    rows.groupBy(_.getLong(0)).foreach { case (shard, part) =>
      val ps = part.map(_.getLong(1)).sorted.toSeq
      assert(ps == (1L to part.length).toSeq,
        s"shard $shard positions not dense: $ps")
    }
    // more than one shard actually populated (the permutation spreads)
    assert(rows.map(_.getLong(0)).distinct.length > 1)
  }

  test("deterministic and partition-order invariant") {
    val a = CorpusShard.assign(docs, 8, 16, 4).collect().toSeq
      .map(_.toSeq).sortBy(_.toString)
    val b = CorpusShard.assign(docs.repartition(7), 8, 16, 4)
      .collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(a == b)
  }

  test("manifest is the exact rollup of the assignment") {
    val asg = CorpusShard.assign(docs, 8, 16, 4).collect()
    val man = CorpusShard.manifest(docs, 8, 16, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val exp = asg.groupBy(_.getLong(0)).map { case (s, part) =>
      s -> ((part.length.toLong, part.map(_.getLong(4)).sum,
        part.map(_.getLong(5)).sum))
    }
    assert(man == exp)
  }
}
