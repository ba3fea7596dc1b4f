package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy selection levers: the engine exposes all three physical
  * equi-join strategies and proves each is actually chosen. At scale the
  * difference is a cluster-wide shuffle (SMJ) vs a map-side hash probe
  * (BHJ) vs a shuffle without sort (SHJ for large-x-large with one
  * smaller side). */
class JoinStrategySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"
  // lazy vals: a def would mint fresh expression ids per call and the
  // join conditions below would reference a different instance
  private lazy val li = spark.read.parquet(s"$dir/lineitem.parquet")
  private lazy val sup = spark.read.parquet(s"$dir/supplier.parquet")

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("broadcast hint selects BroadcastHashJoin") {
    val p = planOf(li.join(broadcast(sup),
      li("l_suppkey") === sup("s_suppkey")).groupBy().count())
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("merge hint selects SortMergeJoin even for a broadcastable side") {
    val p = planOf(li.join(sup.hint("merge"),
      li("l_suppkey") === sup("s_suppkey")).groupBy().count())
    assert(p.contains("SortMergeJoin"), p.take(500))
  }

  test("shuffle_hash hint selects ShuffledHashJoin (no sort on either side)") {
    val p = planOf(li.join(sup.hint("shuffle_hash"),
      li("l_suppkey") === sup("s_suppkey")).groupBy().count())
    assert(p.contains("ShuffledHashJoin"), p.take(500))
  }

  test("all three strategies agree on the result") {
    def total(hinted: org.apache.spark.sql.DataFrame): Long =
      li.join(hinted, li("l_suppkey") === sup("s_suppkey")).count()
    val b = total(broadcast(sup))
    val m = total(sup.hint("merge"))
    val sh = total(sup.hint("shuffle_hash"))
    assert(b == m && m == sh, s"b=$b m=$m sh=$sh")
  }
}
