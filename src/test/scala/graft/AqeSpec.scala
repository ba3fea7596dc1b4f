package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution behavior: a join whose small side is only
  * discovered to be small at RUNTIME (post-filter) gets converted to a
  * broadcast join by AQE even with static broadcast planning disabled —
  * the mechanism that re-plans shuffles on a real cluster. */
class AqeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE converts a sort-merge join to broadcast at runtime") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // static planner must not broadcast; AQE gets its own threshold
    // (the adaptive threshold falls back to the static one when unset,
    // so -1 alone would disable both). AQE on as a runtime conf — the
    // shared test session may have been built without it.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try {
      val dir = "/root/testdata/sf0.01"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val tiny = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_totalprice") > 490000) // a handful of rows at runtime
        .select("o_orderkey", "o_totalprice")
      val joined = li.join(tiny, li("l_orderkey") === tiny("o_orderkey"))
      joined.collect() // execute THIS QueryExecution so AQE finalizes it
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"expected runtime broadcast conversion, got:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
