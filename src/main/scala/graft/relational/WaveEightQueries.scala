package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.relational.RelationalQueries.Q

/** Eighth-wave surface: retrieval-quality evaluation and fusion — the
  * operators a corpus team runs to CHOOSE and COMBINE the engines built
  * in earlier waves (LSH config acceptance, hybrid lexical+dense
  * ranking, result diversification, graph communities).
  */
object WaveEightQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Label-propagation rounds — fixed, like the Hits/PageRank loops:
    * enough for communities to form on the corpus link graph while the
    * unrolled oracle stays linear in rounds. (Declared BEFORE `all`:
    * object-init order would otherwise read 0.) */
  val LpaIters = 3

  val all: Seq[Q] = Seq(

    // MinHash-LSH acceptance gate — the dedup analog of
    // ann_recall_eval: THIS band configuration's candidate recall and
    // precision against the exact inverted-index Jaccard ground truth,
    // both on exact integer ppm grids (div, not float division). One
    // shingle-set checkpoint feeds truth, signatures and candidates;
    // the quadratic ground-truth side is the once-per-config price the
    // published LSH tuning loop pays, not a per-build cost.
    Q("lsh_recall_eval", (s, dir) => {
      Dedup.lshRecallEval(docs(s, dir), "doc_id", "text")
    }, Some(Dedup.lshRecallEvalOracle("documents",
      Dedup.JaccardThreshold))),

    // Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of the BM25
    // lexical list and a dense list seeded by pseudo-relevance
    // feedback (the dense query = the top-1 lexical hit's embedding)
    // — the standard hybrid-retrieval composition over bm25_search +
    // the ann family. Fusion scores are pure integer rank arithmetic;
    // both lists rank via the range-partitioned global row number and
    // truncate BEFORE the fusion join.
    Q("search_rrf_hybrid", (s, dir) => {
      graft.search.HybridSearch.rrf(docs(s, dir), emb(s, dir),
        TrainingDataQueries.Bm25Terms)
    }, Some(graft.search.HybridSearch.rrfOracle("documents",
      "embeddings", TrainingDataQueries.Bm25Terms))),

    // Maximal-marginal-relevance diversification (Carbonell &
    // Goldstein, SIGIR 1998): greedy relevance-vs-redundancy selection
    // over each query's ANN candidate list, all queries advancing
    // together — per round ONE qid-keyed join + group-max + struct
    // argmax on list-sized integer relations. Oracle unrolls the
    // greedy loop to MmrK CTE rounds (the LPA/Hits discipline).
    Q("search_mmr_diversify", (s, dir) => {
      graft.search.HybridSearch.mmr(emb(s, dir),
          TrainingDataQueries.AnnQueries)
        .orderBy(col("qid"), col("mrank"))
    }, Some(graft.search.HybridSearch.mmrOracle("embeddings",
      TrainingDataQueries.AnnQueries))),

    // nDCG@k of the int8-quantized ANN ranking against the exact
    // float-cosine truth (Järvelin & Kekäläinen 2002) — the graded
    // sibling of ann_recall_eval: recall counts hits, nDCG weighs
    // where they landed. Per-position gains on the Bm25 integer
    // micro-grid, final ratio exact ppm.
    Q("ann_ndcg_int8", (s, dir) => {
      graft.search.RankEval.ndcgInt8(emb(s, dir),
        TrainingDataQueries.AnnQueries, TrainingDataQueries.AnnK)
    }, Some(graft.search.RankEval.ndcgInt8Oracle("embeddings",
      TrainingDataQueries.AnnQueries, TrainingDataQueries.AnnK))),

    // Synchronous label propagation (Raghavan et al. 2007) over the
    // parse-derived intra-corpus link graph — community detection, the
    // FREQUENCY-based sibling of dedup_components' min-propagation
    // (most-frequent neighbor label wins, ties to the smallest label;
    // isolated nodes keep their own). Fixed LpaIters rounds vs the
    // unrolled-CTE oracle, the Hits/PageRank discipline. Per round:
    // one key-partitioned join + one (node, label) count + one argmax
    // — only narrow longs shuffle, labels localCheckpoint per round so
    // lineage stays flat.
    Q("graph_label_prop", (s, dir) => {
      // pin column ORDER before the positional union (linkEdges leads
      // with its semi-join key), then symmetrize
      val edges = WaveSevenQueries.linkEdges(s, dir)
        .select(col("src"), col("dst"))
      val und = edges
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
      var labels = docs(s, dir)
        .select(col("doc_id").as("node"), col("doc_id").as("label"))
      for (_ <- 1 to LpaIters) {
        val votes = und
          .join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("c"))
        // max count then min label via one struct max: (c, -label)
        val picked = votes.groupBy(col("node"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("plabel"))
        labels = labels.join(picked, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("plabel"), col("label")).as("label"))
          .localCheckpoint()
      }
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("members"))
      labels.join(sizes, Seq("label"))
        .select(col("node"), col("label"), col("members"))
        .orderBy(col("node"))
    }, Some {
      val rounds = (1 to LpaIters).map { i =>
        s"""v$i AS (
           |  SELECT u.dst AS node, l.label, count(*) AS c
           |  FROM und u JOIN l${i - 1} l ON l.node = u.src
           |  GROUP BY 1, 2),
           |p$i AS (
           |  SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label) AS rn
           |    FROM v$i) __p$i WHERE rn = 1),
           |l$i AS MATERIALIZED (
           |  SELECT l.node, coalesce(p.label, l.label) AS label
           |  FROM l${i - 1} l LEFT JOIN p$i p ON p.node = l.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ${WaveSevenQueries.linkGraphCtes},
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges
         |    UNION ALL SELECT dst AS src, src AS dst FROM edges) __u),
         |l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
         |$rounds,
         |sz AS (
         |  SELECT label, count(*) AS members FROM l$LpaIters
         |  GROUP BY label)
         |SELECT l.node, l.label, s.members
         |FROM l$LpaIters l JOIN sz s ON s.label = l.label
         |ORDER BY l.node""".stripMargin
    }),
  )
}
