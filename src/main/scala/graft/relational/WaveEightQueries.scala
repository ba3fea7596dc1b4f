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

  /** Bigram collocation admission floor and report depth. */
  val MinColloc = 3
  val CollocTop = 25

  /** k-core peel target and fixed round count (the LPA/Hits bounded-
    * iteration discipline — each round is one degree count + two
    * semi-joins; R rounds approximate the fixpoint from above). */
  val CoreK = 2
  val CoreRounds = 3

  /** BFS hop bound — recursion rounds are jobs, so depth is the cost. */
  val BfsDepth = 3

  val all: Seq[Q] = Seq(

    // Node-local triangle counts + clustering coefficient over the
    // parse-derived link graph, DEGREE-ORIENTED (Schank & Wagner 2005;
    // the MapReduce shape is Suri & Vassilvitskii, WWW 2011): each
    // undirected edge orients from lower to higher (degree, id) rank,
    // so every triangle is counted exactly once and the wedge join is
    // bounded by sum(outdeg²) with outdeg = O(sqrt(m)) on any graph —
    // the skew guard a raw 3-way self-join lacks (a hub of degree d
    // would otherwise contribute d² wedges; oriented, high-degree
    // nodes get LOW out-degree). Only narrow (long, long) edges
    // shuffle; cc lands on an exact ppm grid.
    Q("graph_triangles", (s, dir) => {
      graft.operators.GraphOps.triangleStats(
          graft.operators.GraphOps.undirected(
            WaveSevenQueries.linkEdges(s, dir)))
        .orderBy(col("node"))
    }, Some(
      s"""WITH ${WaveSevenQueries.linkGraphCtes},
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM edges),
         |dg AS MATERIALIZED (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT a AS node FROM und
         |    UNION ALL SELECT b FROM und) __d
         |  GROUP BY node),
         |rk AS (SELECT node, deg * 4294967296 + node AS rk FROM dg),
         |ord AS MATERIALIZED (
         |  SELECT CASE WHEN ra.rk < rb.rk THEN u.a ELSE u.b END AS u,
         |    CASE WHEN ra.rk < rb.rk THEN u.b ELSE u.a END AS v,
         |    greatest(ra.rk, rb.rk) AS rv
         |  FROM und u
         |  JOIN rk ra ON ra.node = u.a
         |  JOIN rk rb ON rb.node = u.b),
         |tri3 AS (
         |  SELECT x.u AS n1, x.v AS n2, y.v AS n3
         |  FROM ord x JOIN ord y ON y.u = x.u AND x.rv < y.rv
         |  SEMI JOIN ord z ON z.u = x.v AND z.v = y.v),
         |pt AS (
         |  SELECT node, count(*) AS tri FROM (
         |    SELECT n1 AS node FROM tri3
         |    UNION ALL SELECT n2 FROM tri3
         |    UNION ALL SELECT n3 FROM tri3) __t
         |  GROUP BY node)
         |SELECT d.node, d.deg, CAST(coalesce(p.tri, 0) AS BIGINT) AS tri,
         |  CAST(CASE WHEN d.deg >= 2 THEN
         |      coalesce(p.tri, 0) * 2000000 // (d.deg * (d.deg - 1))
         |    ELSE 0 END AS BIGINT) AS cc_ppm
         |FROM dg d LEFT JOIN pt p ON p.node = d.node
         |ORDER BY d.node""".stripMargin)),

    // k-core peeling (Seidman 1983; distributed peeling à la
    // Montresor et al. 2013) — CoreRounds rounds of "drop nodes with
    // degree < k, restrict edges to survivors" over the undirected
    // link graph: the dense-subgraph extractor next to the community
    // (graph_label_prop) and triangle (graph_triangles) views. Each
    // round shuffles only (long, long) edges + (node, deg) counts;
    // the oracle unrolls the peel. Output: nodes still carrying
    // edges after the last round, with their within-subgraph degree.
    Q("graph_kcore", (s, dir) => {
      graft.operators.GraphOps.kcore(
          graft.operators.GraphOps.undirected(
            WaveSevenQueries.linkEdges(s, dir)),
          CoreK, CoreRounds)
        .orderBy(col("node"))
    }, Some {
      val rounds = (1 to CoreRounds).map { i =>
        s"""k$i AS (
           |  SELECT node FROM (
           |    SELECT node, count(*) AS deg FROM (
           |      SELECT a AS node FROM e${i - 1}
           |      UNION ALL SELECT b FROM e${i - 1}) __d$i
           |    GROUP BY node) __k$i WHERE deg >= $CoreK),
           |e$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM e${i - 1} e
           |  SEMI JOIN k$i x ON x.node = e.a
           |  SEMI JOIN k$i y ON y.node = e.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${WaveSevenQueries.linkGraphCtes},
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM edges),
         |$rounds
         |SELECT node, count(*) AS deg FROM (
         |  SELECT a AS node FROM e$CoreRounds
         |  UNION ALL SELECT b FROM e$CoreRounds) __f
         |GROUP BY node ORDER BY node""".stripMargin
    }),

    // DATA-DRIVEN recursive CTE: BFS reachability (min depth + path
    // counts, ≤ BfsDepth hops) from the smallest linking doc over the
    // parse-derived link graph — the production sibling of
    // q_recursive_closure's synthetic lattice, SQL:1999 recursion over
    // a REAL edge relation in both engines. The edge relation is
    // localCheckpointed BEFORE the recursion: each UnionLoop round
    // re-executes the step query, and an un-pinned edges subplan would
    // re-run the whole HTML parse chain per round. Depth bounds the
    // rounds; COALESCE(1) keeps the tiny per-round exchange narrow.
    Q("graph_bfs_reach", (s, dir) => {
      WaveSevenQueries.linkEdges(s, dir).localCheckpoint()
        .createOrReplaceTempView("graft_edges")
      s.sql(
        s"""WITH RECURSIVE bfs(node, d) AS (
           |  SELECT CAST((SELECT min(src) FROM graft_edges) AS BIGINT),
           |    0
           |  UNION ALL
           |  SELECT /*+ COALESCE(1) */ e.dst, b.d + 1
           |  FROM bfs b JOIN graft_edges e ON e.src = b.node
           |  WHERE b.d < $BfsDepth
           |)
           |SELECT node, CAST(min(d) AS BIGINT) AS depth,
           |  CAST(count(*) AS BIGINT) AS n_paths
           |FROM bfs GROUP BY node ORDER BY node""".stripMargin)
    }, Some(
      s"""WITH RECURSIVE ${WaveSevenQueries.linkGraphCtes},
         |sd AS (SELECT min(src) AS s FROM edges),
         |bfs(node, d) AS (
         |  SELECT s, 0 FROM sd
         |  UNION ALL
         |  SELECT e.dst, b.d + 1
         |  FROM bfs b JOIN edges e ON e.src = b.node
         |  WHERE b.d < $BfsDepth
         |)
         |SELECT node, CAST(min(d) AS BIGINT) AS depth,
         |  CAST(count(*) AS BIGINT) AS n_paths
         |FROM bfs GROUP BY node ORDER BY node""".stripMargin)),

    // Bigram collocation extraction by pointwise mutual information
    // (Church & Hanks 1990) — the lexical-association diagnostic next
    // to corpus_zipf/corpus_vocab_growth: high-PMI pairs are the
    // multiword units a tokenizer should not split. Bigrams are
    // ROW-LOCAL (zip_with over the token array — no positional join);
    // only (word, word, count) triples shuffle; the two corpus totals
    // ride a broadcast one-row relation; PMI lands on the integer
    // micro-nat grid before ranking, so the float ln hash-checks.
    Q("corpus_collocations", (s, dir) => {
      val toks = docs(s, dir).select(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
            .as("t"))
        .localCheckpoint() // consumers: unigrams + bigrams
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // consumers: total + two count joins
      val tn = uni.agg(sum(col("c")).as("tn"))
      val biCounts = toks.filter(size(col("t")) >= 2)
        .select(explode(expr(
          "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
            " (x, y) -> struct(x, y))")).as("p"))
        .select(col("p.x").as("w1"), col("p.y").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
        .localCheckpoint() // consumers: total + admitted pairs
      val bn = biCounts.agg(sum(col("cab")).as("bn"))
      biCounts.filter(col("cab") >= MinColloc)
        .join(uni.select(col("w").as("w1"), col("c").as("ca")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("cb")), "w2")
        .crossJoin(broadcast(tn.crossJoin(bn)))
        .select(col("w1"), col("w2"), col("cab"),
          round(lit(1e6) * log((col("cab") / col("bn")) /
            ((col("ca") / col("tn")) * (col("cb") / col("tn")))))
            .cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(CollocTop)
    }, Some(
      s"""WITH tok AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z]+') AS t
         |  FROM documents),
         |uni AS (
         |  SELECT w, count(*) AS c FROM (
         |    SELECT unnest(t) AS w FROM tok) __u
         |  GROUP BY w),
         |st AS (SELECT CAST(sum(c) AS BIGINT) AS tn FROM uni),
         |bc AS (
         |  SELECT w1, w2, count(*) AS cab FROM (
         |    SELECT t[i] AS w1, t[i + 1] AS w2
         |    FROM tok, unnest(range(1, len(t))) AS u(i)) __b
         |  GROUP BY w1, w2),
         |bst AS (SELECT CAST(sum(cab) AS BIGINT) AS bn FROM bc)
         |SELECT b.w1, b.w2, b.cab,
         |  CAST(round(1e6 * ln((b.cab / s2.bn) /
         |    ((a.c / s.tn) * (c2.c / s.tn)))) AS BIGINT) AS pmi_micro
         |FROM bc b
         |JOIN uni a ON a.w = b.w1
         |JOIN uni c2 ON c2.w = b.w2
         |CROSS JOIN st s CROSS JOIN bst s2
         |WHERE b.cab >= $MinColloc
         |ORDER BY pmi_micro DESC, w1, w2 LIMIT $CollocTop""".stripMargin)),

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
      graft.operators.GraphOps.labelPropagate(
          docs(s, dir).select(col("doc_id").as("node")),
          WaveSevenQueries.linkEdges(s, dir), LpaIters)
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
