package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfScratch2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $name")
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    time("warm_count")(docs.count())
    time("plain_scan_noop")(run(docs))
    val d = graft.relational.Scale.spreadIfNarrow(docs)
    time("spread_noop")(run(d))
    import graft.analysis.TextAnalysis._
    time("tokenCount_only")(run(d.select(tokenCount(col("text")).as("n"))))
    time("punct_only")(run(d.select(punctRatio(col("text")).as("p"))))
    time("stop_only")(run(d.select(stopwordRatio(col("text")).as("s"))))
    time("lang_only")(run(d.select(langId(col("text")).as("l"))))
    time("quality_only")(run(d.select(qualityScore(col("text")).as("q"))))
    time("qln_select")(run(d.select(col("doc_id"),
      qualityScore(col("text")).as("q"), langId(col("text")).as("l"),
      tokenCount(col("text")).as("n"))))
    time("qln_filtered")(run(d.select(col("doc_id"),
        qualityScore(col("text")).as("q"), langId(col("text")).as("l"),
        tokenCount(col("text")).as("n"))
      .filter(col("q") >= 0.5 && col("l") === "en" && col("n").between(50, 400))))
    time("qln_filtered_again")(run(d.select(col("doc_id"),
        qualityScore(col("text")).as("q"), langId(col("text")).as("l"),
        tokenCount(col("text")).as("n"))
      .filter(col("q") >= 0.5 && col("l") === "en" && col("n").between(50, 400))))
    spark.stop()
  }
}
