package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.io.Source

/** Bundled fixture corpora (classpath resources) surfaced as DataFrames.
  *
  * The price corpus is the golden input set whose expected outputs were
  * produced by executing the reference implementation
  * (tools/gen_goldens.py); the corresponding oracle is a literal VALUES
  * table, so the driver's DuckDB compare checks our parsers against the
  * reference's exact behavior.
  */
object Fixtures {

  final case class PriceCase(id: Int, shop: String, class_id: String, text: String)
  final case class NameCase(id: Int, text: String)

  private def resourceLines(path: String): List[String] =
    graft.util.Resources.lines(path)

  def priceCases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = resourceLines("/graft/price_goldens.tsv").tail.zipWithIndex.map {
      case (line, i) =>
        val c = line.split("\t", -1)
        PriceCase(i, c(0), c(1), c(2))
    }
    rows.toDF()
  }

  def nameCases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = resourceLines("/graft/name_goldens.tsv").tail.zipWithIndex.map {
      case (line, i) =>
        val c = line.split("\t", -1)
        NameCase(i, c(0))
    }
    rows.toDF()
  }
}
