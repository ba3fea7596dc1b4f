package graft

import graft.analysis.Dsir
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weights vs an independent in-memory reference. The
  * hash gate against DuckDB is `dsir_weights`. */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Same tokenize/featurize/hash contract, written independently with
    * plain collections. */
  private def refWeights(
      docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): Long = {
      val hex = md.digest((Dsir.Prefix + f).getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % Dsir.Buckets
    }
    def feats(t: String): Seq[String] = {
      val ws = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val perDoc: Map[Long, Map[Long, Long]] = docs.map { case (id, t) =>
      id -> feats(t).map(bucket)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    def tot(p: Long => Boolean): Map[Long, Long] =
      perDoc.filter(kv => p(kv._1)).values
        .flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = tot(_ % Dsir.TargetMod == 0)
    val cs = tot(_ % Dsir.TargetMod != 0)
    val (tt, ts) = (ct.values.sum, cs.values.sum)
    def lam(b: Long): Long = Math.round(
      (Math.log((ct.getOrElse(b, 0L) + 1.0) / (tt + Dsir.Buckets)) -
        Math.log((cs.getOrElse(b, 0L) + 1.0) / (ts + Dsir.Buckets))) * 1e6)
    perDoc.map { case (id, bs) =>
      id -> (bs.values.sum, bs.map { case (b, c) => c * lam(b) }.sum)
    }
  }

  private val docs = Seq(
    (0L, "the target corpus talks about science and method"),
    (5L, "science method and careful analysis of the data"),
    (1L, "buy cheap pills online now best offer"),
    (2L, "the method of science applied to data"),
    (3L, "random words that match no distribution much"),
    (4L, "click here to win a free prize today"))

  test("matches the independent reference exactly (integer micro-nats)") {
    val got = Dsir.weights(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("logw_micro")))
      .toMap
    assert(got == refWeights(docs))
  }

  test("target-like documents outweigh spam") {
    val got = Dsir.weights(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("logw_micro"))
      .toMap
    // doc 2 shares the target's vocabulary; docs 1 and 4 share none
    assert(got(2L) > got(1L) && got(2L) > got(4L))
  }
}
