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
