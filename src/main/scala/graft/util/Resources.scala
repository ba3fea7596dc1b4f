package graft.util

import scala.io.Source

/** Single classpath-resource reader for the bundled fixtures/oracles —
  * one place for the charset, missing-resource handling, and the TSV
  * header/split convention (previously re-implemented at five sites). */
object Resources {

  def text(path: String): String = withSource(path)(_.mkString)

  def lines(path: String): List[String] =
    withSource(path)(_.getLines().toList)

  /** Header-dropping TSV rows; empty trailing fields preserved. */
  def tsv(path: String): List[Array[String]] =
    withSource(path)(_.getLines().drop(1).map(_.split("\t", -1)).toList)

  private def withSource[A](path: String)(f: Source => A): A = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    val src = Source.fromInputStream(in, "UTF-8")
    try f(src) finally src.close()
  }
}
