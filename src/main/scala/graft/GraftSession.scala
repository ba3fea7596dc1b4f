package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local testing runs a single JVM (`local[N]`); the configuration is
  * nonetheless chosen for cluster scale: AQE handles runtime coalescing /
  * skew-join splitting, and the shuffle partition count tracks the core
  * count instead of Spark's default 200 (which would fragment small local
  * runs and under-partition large ones — on a real cluster AQE coalesces
  * from a higher initial number anyway).
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def local(appName: String = "graft", nCpus: Int = cpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$nCpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", nCpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
