package graft

import java.nio.file.Files

import graft.sim.{IncrementalAnnIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF index: appending batches must equal a one-shot build
  * (same quantizer, same assignments, same top-k), replay must be a
  * no-op, and probes must read only the probed list partitions. */
class IncrementalAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Deterministic synthetic embeddings, dim 8. */
  private def vecs(ids: Range) = ids.map { i =>
    (i.toLong, (0 until 8).map(d =>
      (((i * 31 + d * 7) % 13) - 6).toFloat / 6f).toArray)
  }.toDF("vec_id", "embedding")

  test("incremental build equals the one-shot IVF build") {
    val store = Files.createTempDirectory("annidx").toString + "/store"
    val batch1 = vecs(0 until 120) // contains the 8 quantizer vectors
    val batch2 = vecs(120 until 200)
    IncrementalAnnIndex.init(batch1, store)
    IncrementalAnnIndex.appendBatch(batch2, store)

    val union = vecs(0 until 200)
    val nQueries = 10
    val k = 5
    val expected = Similarity.ivfTopK(union, nQueries, k)
    val queries = union.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = IncrementalAnnIndex.topK(queries, store, k)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      "incremental store must answer exactly like the one-shot index")
    assert(got.count() == nQueries.toLong * k)
  }

  test("replaying a batch is a no-op") {
    val store = Files.createTempDirectory("annidx").toString + "/store"
    IncrementalAnnIndex.init(vecs(0 until 100), store)
    val first = IncrementalAnnIndex.appendBatch(vecs(100 until 150), store)
    assert(first.appended == 50 && first.skippedRedelivered == 0)
    val replay = IncrementalAnnIndex.appendBatch(vecs(100 until 150), store)
    assert(replay.appended == 0 && replay.skippedRedelivered == 50)
    val stored = spark.read.parquet(s"$store/lists")
    assert(stored.count() == 150)
    assert(stored.select("vec_id").distinct().count() == 150)
  }

  test("streaming embedding batches append via foreachBatch") {
    val base = Files.createTempDirectory("annstream").toString
    val incoming = s"$base/incoming"
    val store = s"$base/store"
    val ckpt = s"$base/ckpt"
    vecs(0 until 100).write.mode("append").parquet(incoming)
    IncrementalAnnIndex.init(spark.read.parquet(incoming), store)

    vecs(100 until 160).write.mode("append").parquet(incoming)
    val q = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .parquet(incoming)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalAnnIndex.appendBatch(b, store); ()
      }
      .start()
    q.awaitTermination()
    // the first drain re-delivers batch 1 (ledger skips it) and appends
    // batch 2; the index then answers like a one-shot build over both
    assert(spark.read.parquet(s"$store/lists").count() == 160)
    val queries = vecs(0 until 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = IncrementalAnnIndex.topK(queries, store, 3)
    val expected = Similarity.ivfTopK(vecs(0 until 160), 5, 3)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  private def scans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case f: FileSourceScanExec =>
        if (f.metadata("Location").contains("lists")) Seq(f) else Nil
      case other => other.children.flatMap(scans)
    }

  test("probe reads only the probed list partitions") {
    val store = Files.createTempDirectory("annidx").toString + "/store"
    IncrementalAnnIndex.init(vecs(0 until 200), store)
    val nLists = spark.read.parquet(s"$store/lists")
      .select("cid").distinct().count()
    assert(nLists > Similarity.IvfProbes,
      s"need more lists than probes for the proof, got $nLists")
    // one query -> exactly IvfProbes partitions may be read
    val q = vecs(0 until 1).select(col("vec_id").as("qid"), col("embedding"))
    val res = IncrementalAnnIndex.topK(q, store, 3)
    assert(res.collect().nonEmpty)
    val filesRead = scans(res.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val totalFiles = scans(
      spark.read.parquet(s"$store/lists").queryExecution.executedPlan)
      .map(_.relation.location.inputFiles.length).sum
    assert(filesRead < totalFiles,
      s"probe must prune partitions: read $filesRead of $totalFiles")
    assert(filesRead > 0)
  }
}
