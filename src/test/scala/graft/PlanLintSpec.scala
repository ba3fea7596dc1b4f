package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The manual per-round plan audit, as a regression gate: no query may
  * introduce a partitionless window, a cartesian product, or a Scala
  * UDF outside the documented allowances (see PlanLint's scaladoc). */
class PlanLintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every query plan is free of scale anti-patterns") {
    val findings = PlanLint.lint(spark, "/root/testdata/sf0.001")
    assert(findings.isEmpty, findings.map(f =>
      s"${f.kind} ${f.query}: ${f.detail}").mkString("\n"))
  }
}
