package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg, "Authoritative Sources in a
  * Hyperlinked Environment", JACM 1999) in EXACT integer arithmetic
  * over a DIRECTED edge list — the second classic link-analysis signal
  * next to [[PageRank]], and the one that separates PORTAL pages (good
  * hubs: they link to authorities) from CONTENT pages (good
  * authorities: hubs link to them); crawl frontier scoring and
  * anchor-text retrieval both consume it.
  *
  * Exactness discipline (the [[PageRank]] pattern): hubs start at
  * [[Mass]]/n integer units; each half-iteration is the mutual
  * reinforcement sum (auth = Σ hub over in-edges, hub = Σ auth over
  * out-edges) followed by an integer RESCALE in place of the paper's
  * L2 normalization: shrink = max(1, Σx div [[Grid]]), x' = x div
  * shrink — multiply-free, so no overflow at any graph size, and both
  * engines' truncating division agrees bit for bit. Normalization
  * choice changes only the scale, never the ORDER of scores — ranking
  * is what the signal consumer reads. A FIXED number of iterations
  * hash-checks against an unrolled-CTE oracle.
  *
  * Overflow headroom: after a rescale Σx ≈ [[Grid]] = 1e8, so the next
  * raw sums satisfy Σ ≤ max_degree × [[Grid]] — safe in int64 up to
  * ~9×10^10 total weighted degree, far past a 100 TB host graph. The
  * first iteration's Σ ≤ avg_degree × [[Mass]] has the same slack.
  *
  * Scale shape: per half-iteration one edges⋈scores join (both sides
  * hash-partitioned on the node key) + one groupBy sum + one broadcast
  * one-row cross join (the shrink scalar) — no driver collect;
  * localCheckpoint per iteration so iteration N never replays 1..N-1.
  */
object Hits {

  /** Initial total hub mass (integer units). */
  val Mass = 1000000000000L

  /** Rescale target: after each half-iteration the score vector sums
    * to ~Grid units (1e8 — enough resolution for ranking, small
    * enough that max_degree × Grid never nears int64). */
  val Grid = 100000000L

  /** (node, hub, auth) after `iters` exact-integer iterations.
    * @param nodes one long column `node` — every scored entity;
    *              nodes with no in-edges score auth 0, no out-edges
    *              hub 0
    * @param edges DIRECTED pairs (srcCol → dstCol) */
  def run(
      nodes: DataFrame,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val n = nodes.count() // the one driver scalar
    require(n > 0, "empty node set")
    var hub = nodes.select(col("node"), lit(Mass / n).as("x"))
      .localCheckpoint()
    var auth = hub // overwritten in the first half-iteration
    def rescale(raw: DataFrame): DataFrame = {
      val shrink = raw.agg(
        greatest(lit(1L), expr(s"sum(x) div ${Grid}L")).as("__s"))
      raw.crossJoin(broadcast(shrink))
        .select(col("node"), expr("x div __s").as("x"))
    }
    for (i <- 1 to iters) {
      // only the loop state (hub) checkpoints each iteration — auth
      // feeds hub lazily (lineage depth stays bounded at 2 levels) and
      // is materialized once, on the final iteration, for the output
      auth = rescale(
        e.join(hub, e("src") === hub("node"))
          .groupBy(e("dst").as("node")).agg(sum(col("x")).as("x")))
      if (i == iters) auth = auth.localCheckpoint()
      hub = rescale(
        e.join(auth, e("dst") === auth("node"))
          .groupBy(e("src").as("node")).agg(sum(col("x")).as("x")))
        .localCheckpoint()
    }
    nodes.select(col("node"))
      .join(hub.withColumnRenamed("x", "hub"), Seq("node"), "left")
      .join(auth.withColumnRenamed("x", "auth"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** DuckDB twin: unrolled CTEs over `nodesRel(node)` and
    * `edgesRel(src, dst)`. Emits `h0` and per-iteration
    * `ar$i/a$i/hr$i/h$i`; consume hub/auth from `h$iters`/`a$iters`
    * (missing nodes = 0, the caller coalesces). */
  def oracleCtes(nodesRel: String, edgesRel: String, iters: Int): String = {
    val base =
      s"""h0 AS MATERIALIZED (
         |  SELECT node, $Mass // (SELECT count(*) FROM $nodesRel) AS x
         |  FROM $nodesRel)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(sum(h.x) AS BIGINT) AS x
         |  FROM $edgesRel e JOIN h${i - 1} h ON h.node = e.src
         |  GROUP BY e.dst),
         |a$i AS MATERIALIZED (
         |  SELECT node, CAST(x // (SELECT greatest(1, sum(x) // $Grid)
         |    FROM ar$i) AS BIGINT) AS x
         |  FROM ar$i),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS node, CAST(sum(a.x) AS BIGINT) AS x
         |  FROM $edgesRel e JOIN a$i a ON a.node = e.dst
         |  GROUP BY e.src),
         |h$i AS MATERIALIZED (
         |  SELECT node, CAST(x // (SELECT greatest(1, sum(x) // $Grid)
         |    FROM hr$i) AS BIGINT) AS x
         |  FROM hr$i)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Final SELECT over [[oracleCtes]]'s last CTEs. */
  def oracleSelect(nodesRel: String, iters: Int): String =
    s"""SELECT n.node AS node,
       |  CAST(coalesce(h.x, 0) AS BIGINT) AS hub,
       |  CAST(coalesce(a.x, 0) AS BIGINT) AS auth
       |FROM $nodesRel n
       |LEFT JOIN h$iters h ON h.node = n.node
       |LEFT JOIN a$iters a ON a.node = n.node
       |ORDER BY node""".stripMargin
}
