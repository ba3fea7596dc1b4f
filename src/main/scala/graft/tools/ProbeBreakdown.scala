package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{CmsSketchOps, FreqSketchOps, SkewProbe}
import graft.relational.Scale

/** Throwaway-style stage breakdown for the join_skew_probe cost —
  * kept under tools/ so perf attribution is reproducible next round.
  * Usage: runMain graft.tools.ProbeBreakdown [sfDir] */
object ProbeBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val li = Scale.spreadIfNarrow(
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val keys = li.select(col("l_partkey")).as[Long]
    keys.cache().count()
    (1 to 3).foreach { i =>
      time(s"scan only (pass $i)")(keys.write.format("noop")
        .mode("overwrite").save())
      time(s"cms alone (pass $i)")(CmsSketchOps.sketch(keys))
      time(s"mg alone lg15 (pass $i)")(FreqSketchOps.sketch(
        keys.map(_.toString), lgMaxMapSize = 15))
      time(s"sketchBoth (pass $i)")(SkewProbe.sketchBoth(keys,
        lgMaxMapSize = 15))
    }
    spark.stop()
  }
}
