package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfScratch3 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
    run(docs)
    time("simhash_sig_1")(run(graft.dedup.Dedup.simhash(docs, "doc_id", "text")))
    time("simhash_sig_2")(run(graft.dedup.Dedup.simhash(docs, "doc_id", "text")))
    time("simhash_pairs_1")(run(graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text")))
    time("simhash_pairs_2")(run(graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text")))
    spark.stop()
  }
}
