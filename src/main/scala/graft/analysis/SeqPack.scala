package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining-batch assembly step: greedy
  * next-fit of documents (in stable doc_id order) into fixed-capacity
  * training sequences, reported per sequence with doc count, token
  * count, and fill rate.
  *
  * Scale shape: packing is sequential by definition, so the operator
  * makes the sequential unit BOUNDED BY CONSTRUCTION — documents pack
  * within groups of `groupSize` consecutive doc_ids (grp = doc_id div
  * groupSize). Group size is a constant, group COUNT grows with the
  * corpus, so the plan is one hash exchange on grp plus an
  * O(groupSize) in-memory sort+scan per group inside a single
  * flatMapGroups (the same bounded-sequential-per-group pattern as MMR
  * in [[graft.search.HybridSearch]]) — no driver state, no global
  * sort, no cross-group dependency at any corpus size.
  *
  * A document longer than `capacity` gets its own over-length
  * sequence (next-fit never splits); real packers then truncate or
  * chunk downstream — span-splitting is a row-local map and not part
  * of this operator's contract.
  *
  * Fill rate is reported in basis points as an EXACT integer
  * (`floor(n_tokens * 10000 / capacity)`) — capacity is a power of
  * two here, so a `round(x, 4)` double would hit structural
  * half-way ties, exactly the cross-engine rounding hazard the repo
  * rule warns about.
  */
object SeqPack {

  /** (grp, seq_idx, n_docs, n_tokens, fill_bp) per packed sequence;
    * token count = whitespace word count of `text`. */
  def pack(docs: DataFrame, groupSize: Int, capacity: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = graft.relational.Scale.spreadIfNarrow(docs)
      .select((col("doc_id") / groupSize).cast("long").as("grp"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[(Long, Long, Long)]
    toks.groupByKey(_._1)
      .flatMapGroups { (grp: Long, it: Iterator[(Long, Long, Long)]) =>
        val ds = it.toArray.sortBy(_._2)
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        var seq = 0L; var fill = 0L; var nDocs = 0L
        def flush(): Unit =
          if (nDocs > 0) out += ((grp, seq, nDocs, fill))
        for ((_, _, tok) <- ds) {
          if (nDocs == 0L || fill + tok > capacity) {
            flush(); seq += 1; fill = tok; nDocs = 1
          } else { fill += tok; nDocs += 1 }
        }
        flush()
        out.result()
      }
      .toDF("grp", "seq_idx", "n_docs", "n_tokens")
      .withColumn("fill_bp",
        floor(col("n_tokens") * 10000.0 / capacity).cast("long"))
  }

  /** Per-document packing ASSIGNMENT — [[pack]]'s greedy loop emitting
    * (grp, seq_idx, doc_id, tok) per input row instead of the
    * per-sequence rollup, for funnels whose manifest must audit
    * row-level provenance (e.g. which packed rows are epoch-repetition
    * copies in `corpus_ship_epochs`). Same bounded-sequential-per-group
    * scale shape: one hash exchange, O(groupSize) per group. Invariant
    * (pinned by SeqPackSpec, so the two emissions of the same greedy
    * loop can never drift): this output rolled up per sequence must
    * equal [[pack]]. */
  def packDocs(docs: DataFrame, groupSize: Int, capacity: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = graft.relational.Scale.spreadIfNarrow(docs)
      .select((col("doc_id") / groupSize).cast("long").as("grp"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[(Long, Long, Long)]
    toks.groupByKey(_._1)
      .flatMapGroups { (grp: Long, it: Iterator[(Long, Long, Long)]) =>
        val ds = it.toArray.sortBy(_._2)
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        var seq = 0L; var fill = 0L; var nDocs = 0L
        for ((_, id, tok) <- ds) {
          if (nDocs == 0L || fill + tok > capacity) {
            seq += 1; fill = tok; nDocs = 1
          } else { fill += tok; nDocs += 1 }
          out += ((grp, seq, id, tok))
        }
        out.result()
      }
      .toDF("grp", "seq_idx", "doc_id", "tok")
  }

  /** The packing CTE chain alone (goes after a `WITH RECURSIVE`, so it
    * composes inside a larger WITH — corpus_ship appends it to the
    * funnel chain). `docsRel` is any relation carrying (doc_id, text).
    * `docs_o` is MATERIALIZED — it is read by the anchor, every
    * recursive round, and nothing else should re-run the tokenize.
    * Ends in `pk`; [[oracleSelect]] is the matching final SELECT. */
  def oracleCtes(docsRel: String, groupSize: Int, capacity: Int): String =
    s"""docs_o AS MATERIALIZED (
       |  SELECT doc_id, doc_id // $groupSize AS grp,
       |    len(string_split(text, ' ')) AS tok,
       |    row_number() OVER (PARTITION BY doc_id // $groupSize
       |                       ORDER BY doc_id) AS rn
       |  FROM $docsRel),
       |pk AS (
       |  SELECT grp, rn, tok, 1 AS seq_idx, tok AS fill
       |  FROM docs_o WHERE rn = 1
       |  UNION ALL
       |  SELECT d.grp, d.rn, d.tok,
       |    CASE WHEN p.fill + d.tok <= $capacity THEN p.seq_idx
       |         ELSE p.seq_idx + 1 END,
       |    CASE WHEN p.fill + d.tok <= $capacity THEN p.fill + d.tok
       |         ELSE d.tok END
       |  FROM pk p JOIN docs_o d ON d.grp = p.grp AND d.rn = p.rn + 1)"""
      .stripMargin

  def oracleSelect(capacity: Int): String =
    s"""SELECT grp, CAST(seq_idx AS BIGINT) AS seq_idx,
       |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
       |  CAST(floor(sum(tok) * 10000.0 / $capacity) AS BIGINT) AS fill_bp
       |FROM pk GROUP BY grp, seq_idx
       |ORDER BY grp, seq_idx""".stripMargin

  /** DuckDB twin: the same greedy next-fit as a recursive CTE that
    * advances every group one document per round (depth = groupSize,
    * a constant). */
  def oracle(docsRel: String, groupSize: Int, capacity: Int): String =
    s"""WITH RECURSIVE ${oracleCtes(docsRel, groupSize, capacity)}
       |${oracleSelect(capacity)}""".stripMargin
}
