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

  test("AQE splits the planted skewed partition; result matches unskewed run") {
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // force a sort-merge join (no static or adaptive broadcast), and
    // lower the skew thresholds so the planted hot key trips
    // OptimizeSkewedJoin at test scale (defaults are 256MB-cluster
    // sized). The detection rule: partition is skewed if
    // size > max(thresholdInBytes, factor * median).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    try {
      def skewed() = {
        val dir = "/root/testdata/sf0.1"
        // plant the hot key: 80% of lineitem rows collapse onto key 1
        // OptimizeSkewedJoin only matches Sort-over-shuffle-stage on
        // BOTH sides, so the dim must reach the join without an
        // intermediate aggregate: orders' keys are already unique.
        // The fact must also arrive through MULTIPLE mappers — AQE
        // splits a skewed reduce partition along map-output boundaries,
        // so a single-mapper shuffle (one small parquet file) is
        // unsplittable no matter how skewed (spreadIfNarrow is the
        // same guard the production operators use).
        val fact = graft.relational.Scale.spreadIfNarrow(
          spark.read.parquet(s"$dir/lineitem.parquet"))
          .select(
            when(col("l_orderkey") % 10 < 8, 1L)
              .otherwise(col("l_orderkey")).as("k"),
            col("l_extendedprice"), col("l_quantity"))
        val dim = spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey").as("k"), col("o_custkey"))
        fact.hint("merge").join(dim, "k")
          .groupBy(col("k") % 100)
          .agg(sum(col("l_quantity")).cast("long").as("qty"),
            sum(col("o_custkey")).as("dn"))
      }
      val q = skewed()
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val adaptive = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a
        case other => fail(s"expected AQE plan, got ${other.getClass}")
      }
      val finalPlan = adaptive.executedPlan
      assert(finalPlan.toString.contains("skew=true"),
        s"OptimizeSkewedJoin must mark the SMJ:\n$finalPlan")
      // the skewed shuffle read must have SPLIT the hot partition:
      // more partitions read than the shuffle wrote, with at least one
      // partial-reducer spec. QueryStageExec is a LEAF node, so the
      // walk must recurse into each stage's private plan explicitly.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def deep(p: SparkPlan): Seq[AQEShuffleReadExec] =
        p.collect { case r: AQEShuffleReadExec => r } ++
          p.collect { case q: QueryStageExec => q }
            .flatMap(q => deep(q.plan))
      val reads = deep(finalPlan)
      assert(reads.exists(r =>
        r.partitionSpecs.size > prevShuffle.toInt &&
          r.partitionSpecs.exists(_.getClass.getSimpleName
            .contains("PartialReducer"))),
        s"expected a split skewed partition, specs=" +
          reads.map(_.partitionSpecs.size).mkString(","))
      // same answer as the unskewed execution of the same logical query
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val want = skewed().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.sameElements(want),
        "skew-split execution must not change the result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }
  }
}
