package graft

import graft.sinks.VersionedTable
import graft.streaming.MvMaintainJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream≡batch for CDC-driven view maintenance: two checkpointed
  * drains of chained delta files leave the view equal to a direct
  * aggregation of the final snapshot, idle re-drains apply nothing,
  * and wholesale redelivery (fresh checkpoint over an already-current
  * view) is skipped batch by batch via the version ledger. */
class MvMaintainJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.fileSource.log.compactInterval", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // snapshot chain: s0 --ch1--> s1 --ch2--> s2 (groups die, are born,
  // move, and update across the two deltas)
  private val s0 = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
  private val s1 = Seq((1L, 10L, 100L), (2L, 10L, 250L), (4L, 30L, 400L))
  private val s2 = Seq((1L, 40L, 100L), (2L, 10L, 250L), (4L, 30L, 400L),
    (5L, 30L, 50L))

  private val ch1 = Seq(
    (3L, 20L, 300L, "delete"),
    (2L, 10L, 200L, "update_preimage"),
    (2L, 10L, 250L, "update_postimage"),
    (4L, 30L, 400L, "insert"))
  private val ch2 = Seq(
    (1L, 10L, 100L, "update_preimage"), // moves group 10 -> 40
    (1L, 40L, 100L, "update_postimage"),
    (5L, 30L, 50L, "insert"))

  private def agg(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("k", "g", "v").groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  private def asMap(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def writeBatch(rows: Seq[(Long, Long, Long, String)], dir: String,
      vFrom: Long): Unit =
    rows.toDF("k", "g", "v", "change_type")
      .withColumn("v_from", lit(vFrom))
      .withColumn("v_to", lit(vFrom + 1))
      .coalesce(1).write.mode("append").parquet(dir)

  test("drains maintain the view to the final snapshot's aggregation") {
    val base = java.nio.file.Files.createTempDirectory("mvjob").toString
    val (cdc, root, ckpt) = (s"$base/cdc", s"$base/view", s"$base/ckpt")

    writeBatch(ch1, cdc, vFrom = 0L)
    val r1 = MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    assert(r1.applied == 1 && r1.skippedRedelivered == 0)
    assert(r1.finalVersion == 1L)
    assert(asMap(MvMaintainJob.view(spark, root)) == asMap(agg(s1)))

    // second drain picks up only the new delta file
    writeBatch(ch2, cdc, vFrom = 1L)
    val r2 = MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    assert(r2.applied == 1 && r2.finalVersion == 2L)
    assert(asMap(MvMaintainJob.view(spark, root)) == asMap(agg(s2)))

    // idle re-drain: nothing new, nothing applied, view unchanged
    val r3 = MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    assert(r3.batches == 0 && r3.finalVersion == 2L)

    // wholesale redelivery: a FRESH checkpoint replays both files
    // against the already-current view — the version ledger skips both
    val r4 = MvMaintainJob.runOnce(spark, cdc, root, s"$base/ckpt2",
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    assert(r4.batches == 2 && r4.applied == 0 && r4.skippedRedelivered == 2)
    assert(asMap(MvMaintainJob.view(spark, root)) == asMap(agg(s2)))

    // time travel still works underneath: v1 is s1's aggregation
    assert(asMap(VersionedTable.readVersion(spark, root, 1L)) ==
      asMap(agg(s1)))

    // ---- the quartet composed: CDC -> maintained view -> routed ----
    // Register the JOB-MAINTAINED view (its latest version directory)
    // as the summary for the final snapshot; a user aggregate over the
    // snapshot must route to the view SummaryRewrite never rebuilt.
    import graft.plans.SummaryRewrite
    import graft.plans.SummaryRewrite.MaterializedSummary
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val snapPath = s"$base/s2.parquet"
    s2.toDF("k", "g", "v").write.parquet(snapPath)
    val viewV2 = s"$root/v=2"
    SummaryRewrite.enable(spark)
    SummaryRewrite.register(MaterializedSummary(
      snapPath, viewV2, Seq("g"),
      Map(("count", "*") -> "n", ("sum", "v") -> "sv")))
    val routed = spark.read.parquet(snapPath).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val scans = routed.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath).toSeq
        case _ => Nil
      }
    }.flatten
    assert(scans == Seq(viewV2)) // reads the maintained view, not facts
    assert(asMap(routed) == asMap(agg(s2)))
    SummaryRewrite.deregister(snapPath)
  }

  test("serve() publishes the latest version; re-serving swaps it") {
    val base = java.nio.file.Files.createTempDirectory("mvserve").toString
    val (cdc, root, ckpt) = (s"$base/cdc", s"$base/view", s"$base/ckpt")
    import graft.plans.SummaryRewrite
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scans(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath).toSeq
          case _ => Nil
        }
      }.flatten

    writeBatch(ch1, cdc, vFrom = 0L)
    MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    val snapPath = s"$base/facts.parquet"
    s1.toDF("k", "g", "v").write.parquet(snapPath)
    SummaryRewrite.enable(spark)
    val aggCols = Map(("count", "*") -> "n", ("sum", "v") -> "sv")
    assert(MvMaintainJob.serve(
      spark, root, snapPath, Seq("g"), aggCols) == 1L)
    def routed = spark.read.parquet(snapPath).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    assert(scans(routed) == Seq(s"$root/v=1")) // zero-copy: v1's own dir
    assert(asMap(routed) == asMap(agg(s1)))

    // the facts advance, the drain catches the view up, and re-serving
    // swaps the registration to v=2 — the freshness loop closed
    writeBatch(ch2, cdc, vFrom = 1L)
    MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    s2.toDF("k", "g", "v").write.mode("overwrite").parquet(snapPath)
    assert(MvMaintainJob.serve(
      spark, root, snapPath, Seq("g"), aggCols) == 2L)
    assert(scans(routed) == Seq(s"$root/v=2"))
    assert(asMap(routed) == asMap(agg(s2)))
    SummaryRewrite.deregister(snapPath)
  }

  test("an out-of-order delta fails loudly instead of corrupting") {
    val base = java.nio.file.Files.createTempDirectory("mvjob_ooo").toString
    val (cdc, root, ckpt) = (s"$base/cdc", s"$base/view", s"$base/ckpt")
    // the v1->v2 delta lands FIRST: batch 0 would apply it against the
    // v0-seeded view — the exact reorder that resurrects dead groups
    writeBatch(ch2, cdc, vFrom = 1L)
    val ex = intercept[Exception] {
      MvMaintainJob.runOnce(spark, cdc, root, ckpt,
        Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("out of order")))
    // nothing was applied: the view is still just the seed
    assert(asMap(MvMaintainJob.view(spark, root)) == asMap(agg(s0)))
  }

  test("a reused checkpoint over a restored view fails BEFORE any commit") {
    val base = java.nio.file.Files.createTempDirectory("mvjob_lag").toString
    val (cdc, root, ckpt) = (s"$base/cdc", s"$base/view", s"$base/ckpt")
    writeBatch(ch1, cdc, vFrom = 0L)
    writeBatch(ch2, cdc, vFrom = 1L)
    MvMaintainJob.runOnce(spark, cdc, root, ckpt,
      Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    assert(VersionedTable.latestVersion(spark, root).contains(2L))

    // restore scenario: the view table rolls back to v1 (backup
    // restore) while the checkpoint keeps its batch numbering — the
    // next delta must fail against the lagging ledger with ZERO
    // commits, not durably commit a corrupt version first
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(rootP, "_commit_v2"), false)
    fs.delete(new org.apache.hadoop.fs.Path(rootP, "v=2"), true)
    writeBatch(Seq((2L, 10L, 250L, "delete")), cdc, vFrom = 2L)
    val ex = intercept[Exception] {
      MvMaintainJob.runOnce(spark, cdc, root, ckpt,
        Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("view ledger lags")))
    // zero corrupt commits: the view is exactly where the restore left it
    assert(VersionedTable.latestVersion(spark, root).contains(1L))
    assert(asMap(MvMaintainJob.view(spark, root)) == asMap(agg(s1)))
  }

  test("a feed file mixing two deltas fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("mvjob_mix").toString
    val (cdc, root, ckpt) = (s"$base/cdc", s"$base/view", s"$base/ckpt")
    (ch1.map(r => (r._1, r._2, r._3, r._4, 0L, 1L)) ++
        ch2.map(r => (r._1, r._2, r._3, r._4, 1L, 2L)))
      .toDF("k", "g", "v", "change_type", "v_from", "v_to")
      .coalesce(1).write.parquet(cdc)
    val ex = intercept[Exception] {
      MvMaintainJob.runOnce(spark, cdc, root, ckpt,
        Seq("g"), "n", Seq("v" -> "sv"), agg(s0))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("mixes deltas")))
  }
}
