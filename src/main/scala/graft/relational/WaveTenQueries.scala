package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{Decontaminate, SeqPack, TextAnalysis}
import graft.dedup.Dedup
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

  private def piiAugSql(rel: String): String =
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
       |  FROM $rel)""".stripMargin

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
      s"""WITH ${piiAugSql("documents")},
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

    // THE END-TO-END CORPUS-PUBLISH FUNNEL in one query — the last
    // thing a training-data pipeline runs before a corpus ships:
    // curate (quality / language / token-range gates, exact-dup min-id
    // winners, LSH near-dup losers dropped) → PII scrub (the doc_id-
    // derived augmentation, so the gate binds at every SF, then full
    // redaction) → benchmark decontamination of the SCRUBBED text
    // against the eval split (doc_id ≡ 0 mod 17 — excluded from the
    // corpus up front, its raw text the gram source) → sequence
    // packing of the survivors. Every stage is an already-gated
    // operator; this query proves their MUTUAL contracts compose: one
    // corpus checkpoint feeds curation and the eval side, one scrubbed
    // checkpoint feeds the gram projection, the contamination
    // anti-join, and the packer. Fixture: docsWithDups, so both dedup
    // gates bind (twins lose). Scale shape: each stage keeps its solo
    // plan — the eval gram set broadcasts, the pair generators stay
    // bucketed/capped, packing stays one bounded flatMapGroups — so
    // the funnel's cost is the SUM of its stages, never a product.
    Q("corpus_ship", (s, dir) => {
      val d = TrainingDataQueries.docsWithDups(s, dir)
        .localCheckpoint() // feeds curation gates AND the eval split
      val c = col("text")
      val evalPred = col("doc_id") % 17 === 0
      val exactWinners = d
        .groupBy(TextAnalysis.fingerprint(c).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val lshLosers = Dedup.minhashLshPairs(d, "doc_id", "text")
        .select(col("db").as("doc_id")).distinct()
      val curated = d.filter(!evalPred)
        .filter(TextAnalysis.qualityScore(c) >= 0.5 &&
          TextAnalysis.langId(c) === "en" &&
          TextAnalysis.tokenCount(c).between(50, 400))
        .join(exactWinners, Seq("doc_id"), "left_semi")
        .join(lshLosers, Seq("doc_id"), "left_anti")
      val scrubbed = piiAug(curated.select(col("doc_id"), col("text")))
        .select(col("doc_id"), PiiScrub.redact(col("text2")).as("text"))
        .localCheckpoint() // feeds grams, the anti-join, and the packer
      val contaminated = Decontaminate.report(scrubbed,
          d.filter(evalPred).select(col("doc_id"), col("text")))
        .select(col("doc_id"))
      val shipped = scrubbed.join(contaminated, Seq("doc_id"), "left_anti")
      SeqPack.pack(shipped, groupSize = 256, capacity = 256)
        .orderBy(col("grp"), col("seq_idx"))
    }, Some(
      s"""WITH RECURSIVE dd AS MATERIALIZED (
         |  SELECT * FROM ${TrainingDataQueries.docsWithDupsSql} __cs),
         |${Dedup.minhashLshCtes("dd", Dedup.JaccardThreshold)},
         |cs_exwin AS (
         |  SELECT min(doc_id) AS doc_id FROM dd
         |  GROUP BY ${TextAnalysis.fingerprintSql("text")}),
         |cs_losers AS (SELECT DISTINCT db AS doc_id FROM lshpairs),
         |curated AS MATERIALIZED (
         |  SELECT doc_id, text FROM dd
         |  WHERE doc_id % 17 <> 0
         |    AND ${TextAnalysis.qualityScoreSql("text")} >= 0.5
         |    AND ${TextAnalysis.langIdSql("text")} = 'en'
         |    AND ${TextAnalysis.tokenCountSql("text")} BETWEEN 50 AND 400
         |    AND doc_id IN (SELECT doc_id FROM cs_exwin)
         |    AND doc_id NOT IN (SELECT doc_id FROM cs_losers)),
         |${piiAugSql("curated")},
         |scrubbed AS MATERIALIZED (
         |  SELECT doc_id, ${PiiScrub.redactSql("text2")} AS text
         |  FROM aug),
         |cs_eval AS (SELECT doc_id, text FROM dd WHERE doc_id % 17 = 0),
         |${Decontaminate.contaminatedCtes("scrubbed", "cs_eval")},
         |shipped AS MATERIALIZED (
         |  SELECT doc_id, text FROM scrubbed
         |  WHERE doc_id NOT IN (SELECT doc_id FROM dc_cont)),
         |${SeqPack.oracleCtes("shipped", 256, 256)}
         |${SeqPack.oracleSelect(256)}""".stripMargin)),

    // Output sharding — what a publisher runs on the packed sequences:
    // a DETERMINISTIC shuffle (seeded md5 hash permutation, the same
    // engine-neutral primitive as q_hash_sample) assigns each sequence
    // to a shard and orders it within the shard, so neighboring
    // documents decorrelate across the training stream and a re-publish
    // of the same corpus is byte-identical. Plan: one hash exchange on
    // shard + per-shard local sort (window partitions by shard, never
    // partitionless); numShards is the 100 TB parallelism knob.
    Q("corpus_shard", (s, dir) => {
      graft.analysis.CorpusShard.assign(
          s.read.parquet(t(dir, "documents"))
            .select(col("doc_id"), col("text")),
          groupSize = 256, capacity = 256, numShards = 16)
        .orderBy(col("shard"), col("pos"))
    }, Some(graft.analysis.CorpusShard.assignOracle(
      "documents", 256, 256, 16))),

    // The manifest a training job consumes and resumes against: one
    // map-side-combined groupBy over the assignment.
    Q("corpus_shard_manifest", (s, dir) => {
      graft.analysis.CorpusShard.manifest(
          s.read.parquet(t(dir, "documents"))
            .select(col("doc_id"), col("text")),
          groupSize = 256, capacity = 256, numShards = 16)
        .orderBy(col("shard"))
    }, Some(graft.analysis.CorpusShard.manifestOracle(
      "documents", 256, 256, 16))),
  )
}
