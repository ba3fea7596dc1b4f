package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition timer for slow bench queries (Test scope,
  * never shipped in the library jar). */
object PerfScratch {
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

    // warmup
    run(spark.read.parquet(s"$dir/documents.parquet"))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val d = graft.relational.Scale.spreadIfNarrow(docs)

    time("shingle_sets_checkpoint") {
      graft.dedup.Dedup.docShingleSets(d, "doc_id", "text").localCheckpoint()
    }
    time("lsh_pairs_full") {
      run(graft.dedup.Dedup.minhashLshPairs(d, "doc_id", "text"))
    }
    time("text_filters_only") {
      import graft.analysis.TextAnalysis
      run(d.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.langId(col("text")).as("l"),
          TextAnalysis.tokenCount(col("text")).as("n"))
        .filter(col("q") >= 0.5 && col("l") === "en" &&
          col("n").between(50, 400)))
    }
    time("corpus_select_full") {
      run(SparkEntry.queries("corpus_select")(spark, dir))
    }
    time("corpus_select_again") {
      run(SparkEntry.queries("corpus_select")(spark, dir))
    }
    time("dedup_components_full") {
      run(SparkEntry.queries("dedup_components")(spark, dir))
    }
    spark.stop()
  }
}
