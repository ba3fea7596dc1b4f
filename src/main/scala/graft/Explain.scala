package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the named queries
  * (default: a representative set; `all` = the ENTIRE SparkEntry.queries
  * surface, the form that regenerates PLANS.md's capture section) so
  * pushdown / broadcast / codegen can be inspected.
  * Usage: runMain graft.Explain [sfDir] [query ... | all]
  *
  * PLANS.md regeneration (PlanLintSpec fails the build if any query
  * key lacks a capture header there):
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 all" and splice
  *   stdout below PLANS.md's narrative — tools/regen_plans.sh does both.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1 && args(1) == "all")
        SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q6_selective", "q5_broadcast_dims", "q3_join_topk",
        "ann_topk_brute", "minhash_lsh_dups", "embedding_kmeans",
        "corpus_decontaminate", "q_grouped_running", "q_bloom_join")
    val spark = GraftSession.local("graft-explain", 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println("unknown query")
      }
    }
    spark.stop()
  }
}
