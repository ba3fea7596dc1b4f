package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout scale levers: static partition pruning (a filter on
  * the partition column must skip non-matching directories at the scan)
  * and dynamic partition pruning (a selective dim-side filter prunes
  * fact partitions at runtime). At 100 TB these are the difference
  * between scanning one partition and scanning the table. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val factDir = {
    val dir = Files.createTempDirectory("prune").toString + "/fact"
    (0 until 1000).map(i => (i.toLong, s"cat_${i % 5}", i * 1.5))
      .toDF("id", "category", "amount")
      .repartition(1) // one file per partition directory
      .write.partitionBy("category").parquet(dir)
    dir
  }

  /** Recursively gather fact-side scans — AQE query stages are leaf
    * nodes, so a plain collect() never reaches the scans inside them. */
  private def factScans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: AdaptiveSparkPlanExec => factScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        factScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        factScans(r.child)
      case f: FileSourceScanExec =>
        if (f.metadata("Location").contains("fact")) Seq(f) else Nil
      case other => other.children.flatMap(factScans)
    }

  private def factScanMetric(
      plan: org.apache.spark.sql.execution.SparkPlan,
      metric: String): Long =
    factScans(plan).map(_.metrics(metric).value).sum

  test("filter on the partition column prunes directories at the scan") {
    val q = spark.read.parquet(factDir).filter(col("category") === "cat_3")
    // collect() drives THIS DataFrame's queryExecution (count() would
    // spawn a separate execution and leave these metrics untouched)
    assert(q.collect().length == 200)
    val read = factScanMetric(q.queryExecution.executedPlan, "numFiles")
    assert(read == 1, s"expected only cat_3's file to be read, got $read of 5")
  }

  test("dynamic partition pruning from a selective dim filter") {
    val dimDir = Files.createTempDirectory("prune").toString + "/dim"
    Seq(("cat_2", "keep"), ("cat_0", "drop"), ("cat_1", "drop"),
      ("cat_3", "drop"), ("cat_4", "drop"))
      .toDF("category", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val q = spark.read.parquet(factDir).join(dim, Seq("category"))
    assert(q.collect().length == 200)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(1500)}")
    // runtime effect: only the keep-partition's file was actually read
    val read = factScanMetric(q.queryExecution.executedPlan, "numFiles")
    assert(read == 1, s"DPP should read 1 fact file, read $read")
  }
}
