package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() must produce rows on sf0.001. */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flagship entry query returns per-nation revenue rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.forall(r => r.getString(0).nonEmpty && !r.isNullAt(1)))
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
