package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.Window

/** Plan LINT over the whole `SparkEntry.queries` surface: walks each
  * query's optimized logical plan (and the physical plan string) and
  * reports the anti-patterns this engine's scale discipline forbids —
  * the checks every round's plan audit performs by hand, codified:
  *
  *  - PARTITIONLESS WINDOW (`OVER (ORDER BY ...)` with no PARTITION BY):
  *    funnels all rows through one task. Allowed only where the window
  *    input is bounded by construction and documented at the call site
  *    (one row per day/bucket), listed in [[allowedPartitionless]].
  *  - CARTESIAN PRODUCT: a non-broadcast cross join must never appear;
  *    deliberate cross joins against scalar/centroid relations plan as
  *    BroadcastNestedLoopJoin.
  *  - SCALA UDF: interpreted closures block codegen; only the
  *    SURVEY-prescribed domain functions (correctName, processPrice)
  *    may ride UDFs, listed in [[allowedUdf]].
  *
  * Run as a main (`runMain graft.PlanLint [sfDir]`) or through
  * PlanLintSpec, which fails the build on any unlisted violation. */
object PlanLint {

  /** Queries with a DOCUMENTED bounded-domain partitionless window. */
  val allowedPartitionless: Set[String] = Set(
    // one row per DAY reaches the window (documented at the call site)
    "q_cumulative_users")

  /** Queries allowed to carry the ONE sanctioned domain UDF
    * (correctName — trie+DP state is genuinely UDF-shaped; SURVEY
    * §2.6). The price family left this list in r8: ParsePrice /
    * ProcessPrice are native expressions now. */
  val allowedUdf: Set[String] = Set(
    "name_correct", "detected_items", "item_alerts")

  /** Queries deliberately NOT captured in PLANS.md. Since r7 the
    * capture section is generated over the WHOLE surface
    * (`runMain graft.Explain <sfDir> all`, spliced by
    * tools/regen_plans.sh), so nothing is exempt — the set exists so
    * any future exemption must be named here, visibly, instead of
    * becoming silent capture drift (the r4-r6 staleness class). */
  val captureExempt: Set[String] = Set.empty

  /** Capture-header names present in a PLANS.md body. */
  def capturedIn(plansMd: String): Set[String] =
    "(?m)^========== (\\S+) ==========$".r
      .findAllMatchIn(plansMd).map(_.group(1)).toSet

  /** Keys of SparkEntry.queries with no PLANS.md capture (minus the
    * explicit exemptions) plus captures for queries that no longer
    * exist — either direction fails PlanLintSpec. */
  def captureDiff(plansMd: String): (Seq[String], Seq[String]) = {
    val captured = capturedIn(plansMd)
    val keys = SparkEntry.queries.keySet
    val missing = (keys -- captured -- captureExempt).toSeq.sorted
    val stale = (captured -- keys).toSeq.sorted
    (missing, stale)
  }

  final case class Finding(query: String, kind: String, detail: String)

  def lint(spark: SparkSession, sfDir: String): Seq[Finding] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val lp = df.queryExecution.optimizedPlan
        val windows = lp.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        val udfs = lp.flatMap(p =>
          p.expressions.flatMap(_.collect { case u: ScalaUDF => u }))
        val physical = df.queryExecution.executedPlan.toString
        val cartesian = physical.contains("CartesianProduct")
        val fs = Seq.newBuilder[Finding]
        if (windows.nonEmpty && !allowedPartitionless(name))
          fs += Finding(name, "partitionless-window",
            s"${windows.size} window(s) with empty PARTITION BY")
        if (udfs.nonEmpty && !allowedUdf(name))
          fs += Finding(name, "scala-udf",
            udfs.map(_.udfName.getOrElse("<anon>")).distinct.mkString(","))
        if (cartesian)
          fs += Finding(name, "cartesian-product", "CartesianProduct in plan")
        fs.result()
      } catch {
        case e: Throwable =>
          Seq(Finding(name, "lint-error", String.valueOf(e.getMessage)))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-planlint", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val findings = lint(spark, sfDir)
    if (findings.isEmpty) println("PLANLINT: clean")
    else findings.foreach(f =>
      println(s"PLANLINT ${f.kind} ${f.query}: ${f.detail}"))
    spark.stop()
    if (findings.nonEmpty) sys.exit(1)
  }
}
