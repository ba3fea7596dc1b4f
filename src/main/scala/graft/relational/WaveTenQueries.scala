package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Decontaminate
import graft.relational.RelationalQueries.Q
import graft.text.PiiScrub

/** Tenth-wave surface: the two corpus-shipping gates every LLM
  * training pipeline runs last — PII scrubbing and benchmark
  * decontamination.
  *
  * The driver's synthetic document texts contain no PII by
  * construction, so `pii_scrub` derives a deterministic PII-bearing
  * augmentation from doc_id IDENTICALLY on both engines (the same
  * derive-the-fixture-from-driver-data pattern as `table_changes`'
  * snapshot derivations) — detection and redaction then run over text
  * whose PII placement, multiplicity, and surrounding context vary per
  * row, and the driver's hash gate pins both the counts and the full
  * redacted strings.
  */
object WaveTenQueries {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** doc_id-derived PII augmentation (Spark side; [[piiAugSql]] is the
    * character-identical DuckDB twin). Residues overlap (0 mod 7·5·11·13
    * carries all four classes) so multi-type rows exist at every SF. */
  private def piiAug(d: DataFrame): DataFrame =
    d.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" Contact agent"), col("doc_id").cast("string"),
          lit("@data-example.com now."))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" Call +1-202-555-"),
          lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0"),
          lit(" today."))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" Host 10."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit("."), ((col("doc_id") * 13) % 256).cast("string"),
          lit(" up."))).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" Card 4111 2222 3333 "),
          (lit(4000) + col("doc_id") % 1000).cast("string"),
          lit(" ok."))).otherwise(lit(""))))

  private val piiAugSql: String =
    s"""aug AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' Contact agent' ||
       |      CAST(doc_id AS VARCHAR) || '@data-example.com now.'
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' Call +1-202-555-' ||
       |      lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') ||
       |      ' today.' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' Host 10.' ||
       |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
       |      CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
       |      CAST((doc_id * 13) % 256 AS VARCHAR) || ' up.' ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0 THEN ' Card 4111 2222 3333 ' ||
       |      CAST(4000 + doc_id % 1000 AS VARCHAR) || ' ok.' ELSE '' END
       |    AS text2
       |  FROM documents)""".stripMargin

  val all: Seq[Q] = Seq(

    // PII scrub: per-type occurrence counts + fully redacted text for
    // every document carrying at least one PII hit. Row-local narrow
    // projection end to end (codegen'd regexp over the scan — the
    // 100 TB cost is exactly one pass over the text column).
    Q("pii_scrub", (s, dir) => {
      val aug = piiAug(s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text")))
      aug.select(col("doc_id"),
          PiiScrub.countOf(col("text2"), PiiScrub.EmailRe).as("n_email"),
          PiiScrub.countOf(col("text2"), PiiScrub.PhoneRe).as("n_phone"),
          PiiScrub.countOf(col("text2"), PiiScrub.Ipv4Re).as("n_ip"),
          PiiScrub.countOf(col("text2"), PiiScrub.CardRe).as("n_card"),
          PiiScrub.redact(col("text2")).as("redacted"))
        .filter(col("n_email") + col("n_phone") + col("n_ip") +
          col("n_card") > 0)
        .orderBy(col("doc_id"))
    }, Some(
      s"""WITH $piiAugSql,
         |det AS (
         |  SELECT doc_id,
         |    ${PiiScrub.countSql("text2", PiiScrub.EmailRe)} AS n_email,
         |    ${PiiScrub.countSql("text2", PiiScrub.PhoneRe)} AS n_phone,
         |    ${PiiScrub.countSql("text2", PiiScrub.Ipv4Re)} AS n_ip,
         |    ${PiiScrub.countSql("text2", PiiScrub.CardRe)} AS n_card,
         |    ${PiiScrub.redactSql("text2")} AS redacted
         |  FROM aug)
         |SELECT * FROM det
         |WHERE n_email + n_phone + n_ip + n_card > 0
         |ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: documents with doc_id ≡ 0 (mod 17)
    // stand in for the benchmark/eval set; every other document is
    // corpus. Flag corpus docs sharing >= 1 word 4-gram with the eval
    // set, with overlap counts and ratio. Eval grams broadcast (the
    // benchmark-vs-corpus size asymmetry), corpus side never shuffles
    // except the per-doc count rows.
    Q("decontaminate", (s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      Decontaminate.report(
          d.filter(col("doc_id") % 17 =!= 0),
          d.filter(col("doc_id") % 17 === 0))
        .orderBy(col("doc_id"))
    }, Some(Decontaminate.oracle("documents",
      "doc_id % 17 = 0", "doc_id % 17 <> 0"))),

    // Span-level twin of `decontaminate`: WHERE the eval overlap sits
    // — maximal covered token spans per corpus doc (hits merging when
    // coverage overlaps or touches). Same broadcast shape; the one new
    // exchange is a doc_id-partitioned window over hit rows only.
    Q("decontaminate_spans", (s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), col("text"))
      Decontaminate.reportSpans(
          d.filter(col("doc_id") % 17 =!= 0),
          d.filter(col("doc_id") % 17 === 0))
        .orderBy(col("doc_id"), col("span_start"))
    }, Some(Decontaminate.spansOracle("documents",
      "doc_id % 17 = 0", "doc_id % 17 <> 0"))),

    // Sequence packing: greedy next-fit of documents into 256-token
    // training sequences within 256-doc groups — the sequential unit
    // is bounded by construction (one hash exchange on grp, one
    // O(groupSize) scan per group), so the plan is corpus-size-free.
    Q("seq_pack", (s, dir) => {
      graft.analysis.SeqPack.pack(
          s.read.parquet(t(dir, "documents"))
            .select(col("doc_id"), col("text")),
          groupSize = 256, capacity = 256)
        .orderBy(col("grp"), col("seq_idx"))
    }, Some(graft.analysis.SeqPack.oracle("documents", 256, 256))),
  )
}
