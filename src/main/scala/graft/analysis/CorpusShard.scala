package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Output sharding — the step after [[SeqPack]] in a publish funnel:
  * deterministically SHUFFLE the packed training sequences (so
  * neighboring documents decorrelate across the training stream) and
  * split them into fixed-count output shards with a manifest a
  * training job can consume and resume against.
  *
  * The "shuffle" is a seeded hash permutation, not randomness: each
  * sequence hashes to a shard by the engine-neutral md5-derived 32-bit
  * hash ([[Dedup.md5Hash32]], the same primitive `q_hash_sample` and
  * the minhash family gate on), and orders within its shard by that
  * hash (ties broken by the natural key) — fully deterministic, so
  * re-publishing the same corpus yields byte-identical shards, and the
  * DuckDB twin reproduces the permutation exactly.
  *
  * Scale shape: one hash exchange on `shard` plus a per-shard local
  * sort (the window partitions by shard — never partitionless).
  * `numShards` is the parallelism knob a real publish sets to
  * O(thousands) at 100 TB so every shard fits an output file and the
  * per-shard sorts spread across executors; the gate uses a small
  * count so every shard is populated at every SF. The manifest is one
  * map-side-combined groupBy over the assignment.
  */
object CorpusShard {

  /** (shard, pos, grp, seq_idx, n_docs, n_tokens) per packed sequence:
    * `shard` = hash mod `numShards`, `pos` = 1-based position in the
    * shard's deterministic hash order. */
  def assign(docs: DataFrame, groupSize: Int, capacity: Int,
      numShards: Int): DataFrame = {
    val packed = SeqPack.pack(docs, groupSize, capacity)
    val h = Dedup.md5Hash32(
      concat_ws(":", col("grp").cast("string"),
        col("seq_idx").cast("string")), "shard:")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("grp"), col("seq_idx"))
    packed
      .withColumn("h", h)
      .withColumn("shard", col("h") % numShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("grp"), col("seq_idx"),
        col("n_docs"), col("n_tokens"))
  }

  /** Per-shard manifest: (shard, n_seqs, n_docs, n_tokens) — the
    * balance/accounting record a publisher writes next to the shards. */
  def manifest(docs: DataFrame, groupSize: Int, capacity: Int,
      numShards: Int): DataFrame =
    assign(docs, groupSize, capacity, numShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** Shared oracle CTE chain: [[SeqPack.oracleCtes]]' recursive packing
    * plus the sequence rollup and the hash/shard assignment; ends in
    * `shrd(shard, h, grp, seq_idx, n_docs, n_tokens)`. */
  private def shardCtes(docsRel: String, groupSize: Int, capacity: Int,
      numShards: Int): String =
    s"""${SeqPack.oracleCtes(docsRel, groupSize, capacity)},
       |sq AS (SELECT grp, CAST(seq_idx AS BIGINT) AS seq_idx,
       |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
       |  FROM pk GROUP BY grp, seq_idx),
       |shrd AS (SELECT h % $numShards AS shard, h, grp, seq_idx,
       |    n_docs, n_tokens
       |  FROM (SELECT *, ${Dedup.md5Hash32Sql(
             "(grp::VARCHAR || ':' || seq_idx::VARCHAR)", "shard:")} AS h
       |        FROM sq) __h)""".stripMargin

  /** DuckDB twin of [[assign]] (validated on a hand fixture against an
    * independent python next-fit + md5 mirror before wiring). */
  def assignOracle(docsRel: String, groupSize: Int, capacity: Int,
      numShards: Int): String =
    s"""WITH RECURSIVE ${shardCtes(docsRel, groupSize, capacity, numShards)}
       |SELECT shard,
       |  CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY h, grp, seq_idx) AS BIGINT) AS pos,
       |  grp, seq_idx, n_docs, n_tokens
       |FROM shrd ORDER BY shard, pos""".stripMargin

  /** DuckDB twin of [[manifest]]. */
  def manifestOracle(docsRel: String, groupSize: Int, capacity: Int,
      numShards: Int): String =
    s"""WITH RECURSIVE ${shardCtes(docsRel, groupSize, capacity, numShards)}
       |SELECT shard, count(*) AS n_seqs,
       |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM shrd GROUP BY shard ORDER BY shard""".stripMargin
}
