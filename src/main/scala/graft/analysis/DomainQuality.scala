package graft.analysis

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** DOMAIN-level quality gating (the FineWeb/RefinedWeb per-domain
  * signal): a document is dropped for the company it keeps. Spam and
  * boilerplate farms emit pages that pass per-document filters
  * individually; the aggregate noise statistics of their DOMAIN are
  * what gives them away, so the gate is a verdict on the domain applied
  * to every document in it.
  *
  * Exactness discipline: the signals are raw integer counts (punct
  * chars, total chars, tokens) summed in int64 and combined by
  * truncating integer division — never the composite quality score,
  * which is a rounded-double surface whose last-ulp behavior two
  * engines need not share.
  *
  * Scale shape: one narrow per-domain aggregate (three int64 sums over
  * (domain, counts) — map-side combined, bodies never shuffle), the
  * domain-stats relation broadcast back onto the corpus. Domains are
  * orders of magnitude fewer than documents, so the broadcast is always
  * the small side.
  */
object DomainQuality {

  /** Per-document verdict columns joined with the domain aggregate:
    * (id, domain, ntok, domain_punct_ppm, domain_mean_tok,
    * domain_pass). */
  def gate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      punctPpmCeiling: Long): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"),
      col(domainCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).as("ntok"),
      regexp_count(col(textCol), lit("[^A-Za-z0-9\\s]")).cast("long")
        .as("npunct"),
      length(col(textCol)).cast("long").as("nchars"))
    val dstats = scored.groupBy(col("source"))
      .agg(expr("sum(npunct) * 1000000 div sum(nchars)")
          .as("domain_punct_ppm"),
        expr("sum(ntok) div count(1)").as("domain_mean_tok"))
    scored.join(broadcast(dstats), Seq("source"))
      .select(col("doc_id"), col("source"), col("ntok"),
        col("domain_punct_ppm"), col("domain_mean_tok"),
        (col("domain_punct_ppm") < punctPpmCeiling).as("domain_pass"))
  }
}
