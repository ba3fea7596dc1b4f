package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides bucketed on the join key means
  * the sort-merge join needs NO Exchange — the 100 TB lever for repeated
  * joins on the same key.
  *
  * NB: suites share one JVM-wide session (getOrCreate), so broadcast
  * suppression is applied as a runtime conf and restored afterwards. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join of two tables bucketed on the key plans with zero Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      // a previously-failed run can leave an orphaned location behind
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      Seq("li_b", "o_b").foreach { t =>
        val f = new java.io.File(wh, t)
        if (f.exists()) {
          java.nio.file.Files.walk(f.toPath)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => p.toFile.delete())
        }
      }
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          spark.table("li_b")("l_orderkey") === spark.table("o_b")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in plan:\n$plan")
      assert(joined.count() > 0)

      // sanity: the same join WITHOUT bucketing does shuffle
      val plain = spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
