package graft

import java.nio.file.Files

import graft.sinks.Compaction
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout operations a long-lived table needs: small-file
  * compaction and schema evolution across file generations. */
class StorageOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("compaction collapses a micro-batched table without losing rows") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // simulate 12 micro-batches -> 12+ small files
    (0 until 12).foreach { b =>
      Seq.tabulate(50)(i => (b * 50L + i, s"v$b-$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 12)
    val checksumBefore = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    val after = Compaction.compact(spark, dir)
    assert(after == 1, s"tiny table must compact to one file, got $after")
    val checksumAfter = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("id"))).collect()(0)
    assert(checksumBefore == checksumAfter, "compaction must preserve rows")
  }

  test("optimizeZOrder compacts AND re-clusters in one atomic swap") {
    val dir = Files.createTempDirectory("optz").toString + "/t"
    // fragmented ingest: 16 append batches of 2D points, each batch a
    // random-ish slice of BOTH dimensions — so before the rewrite every
    // file's y min/max spans the whole range and nothing can skip
    val n = 160000
    (0 until 16).foreach { b =>
      spark.range(b * (n / 16).toLong, (b + 1) * (n / 16).toLong)
        .select(
          (col("id") * 7919 % 1024).as("x"),
          (col("id") * 104729 % 1024).as("y"),
          col("id").as("payload"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 16)
    val checksumBefore = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("x")), sum(col("y")), sum(col("payload")))
      .collect()(0)

    // one maintenance op: compact the 16 fragments AND z-order (x, y).
    // tiny targetFileBytes keeps multiple output files so the row-group
    // skip claim below is about file/row-group stats, not one big file
    val after = Compaction.optimizeZOrder(spark, dir, Seq("x", "y"),
      bits = 10, targetFileBytes = 64L * 1024)
    assert(after < before, s"fragments must shrink: $before -> $after")
    assert(after > 4, s"need several files for the skip claim, got $after")

    val checksumAfter = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("x")), sum(col("y")), sum(col("payload")))
      .collect()(0)
    assert(checksumBefore == checksumAfter, "rewrite must preserve rows")

    // the ZOrderSpec claim on the COMPACTED output: a narrow band on
    // the SECOND z dimension reads a minority of rows via min/max skip
    val probe = spark.read.parquet(dir)
      .filter(col("y") >= 64L && col("y") <= 95L)
    val matched = probe.collect().length
    assert(matched > 0)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scanNodes = scans(probe.queryExecution.executedPlan)
    assert(scanNodes.nonEmpty, "probe plan must contain a parquet scan")
    val scanned = scanNodes.map(_.metrics("numOutputRows").value).sum
    assert(scanned > 0, "scan metrics must be populated")
    assert(scanned < n / 2,
      s"z-ordered compacted table must skip most rows: read $scanned of $n")
  }

  test("schema evolution: old files without the new column read as null") {
    val dir = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // generation 2 adds a column
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v", "score"))
    val rows = merged.orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.isNullAt(2)))
    assert(rows.toSeq == Seq((1L, true), (2L, true), (3L, false), (4L, false)))
  }
}
