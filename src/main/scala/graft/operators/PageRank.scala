package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in EXACT integer arithmetic over an undirected edge list —
  * graph centrality as a corpus-quality prior (Common Crawl publishes
  * exactly this family of signals — harmonic/PageRank centrality over
  * the host graph — and public curation recipes rank fetches by them;
  * here the same operator runs over any doc-pair graph, e.g. the
  * near-dup LSH pairs).
  *
  * Exactness discipline (the [[graft.sim.KMeans]] pattern): total mass
  * starts as [[Mass]] integer units; every update is int64
  * multiply-then-truncating-divide on strictly positive values, so
  * Spark `div` and DuckDB `//` agree bit for bit and a FIXED number of
  * power iterations hash-checks against an unrolled-CTE oracle.
  * Variant pinned (and documented): dangling/isolated nodes KEEP the
  * teleport base but their mass is not redistributed — total mass is
  * not conserved, ranking order is what the signal consumer reads.
  * Damping is the classic 0.85 as the integer ratio 85/100.
  *
  * Scale shape: one edges⋈rank join (both sides hash-partitioned on
  * `node` — the degree join rides the same partitioning) plus one
  * groupBy(peer) sum per iteration — the standard dataflow PageRank;
  * every iteration localCheckpoints so iteration N's plan never
  * replays 1..N-1 (same lineage discipline as ConnectedComponents).
  * Driver state is one scalar (the node count). GraphX's Pregel form
  * saves the per-iteration shuffle via vertex replication; the
  * dataflow shape here keeps the whole loop inside Catalyst and is the
  * published-benchmark-standard alternative.
  */
object PageRank {

  /** Total starting mass in integer units (10^12: room for 10^9 nodes
    * while per-node contributions stay >= 10^3 units). */
  val Mass = 1000000000000L

  /** Damping 0.85 as an integer ratio. */
  val DampNum = 85L
  val DampDen = 100L

  /** (node, pr) after `iters` exact-integer power iterations.
    * @param nodes one long column `node` — every ranked entity,
    *              including isolated ones (they score the base term)
    * @param edges undirected pairs in (srcCol, dstCol) */
  def run(
      nodes: DataFrame,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val sym = edges
      .select(col(srcCol).as("node"), col(dstCol).as("peer"))
      .unionAll(edges.select(col(dstCol).as("node"), col(srcCol).as("peer")))
    val deg = sym.groupBy(col("node")).agg(count(lit(1)).as("d"))
    // per-edge contribution source, checkpointed once: every iteration
    // re-joins ranks against it on `node`
    val edgeDeg = sym.join(deg, Seq("node")).localCheckpoint()
    val n = nodes.count() // the one driver scalar
    require(n > 0, "empty node set")
    val base = ((Mass * (DampDen - DampNum)) / DampDen) / n // ints: floor
    var pr = nodes.select(col("node"), lit(Mass / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val inc = pr.join(edgeDeg, Seq("node"))
        .select(col("peer"),
          expr(s"((pr * $DampNum) div $DampDen) div d").as("c"))
        .groupBy(col("peer")).agg(sum(col("c")).as("s"))
        .withColumnRenamed("peer", "node")
      pr = nodes.select(col("node"))
        .join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** DuckDB twin: the same unrolled power iterations. `nodesRel` must
    * expose `node`; `pairsRel` must expose (da, db). Ends in
    * `pr$iters(node, pr)`. */
  def oracleCtes(nodesRel: String, pairsRel: String, iters: Int): String = {
    val base =
      s"""prnodes AS (SELECT node FROM $nodesRel),
         |predges AS (
         |  SELECT da AS node, db AS peer FROM $pairsRel
         |  UNION ALL SELECT db, da FROM $pairsRel),
         |prdeg AS (SELECT node, count(*) AS d FROM predges GROUP BY node),
         |prn AS (SELECT count(*) AS n FROM prnodes),
         |prbase AS (
         |  SELECT CAST((($Mass * ${DampDen - DampNum}) // $DampDen) // n
         |    AS BIGINT) AS b FROM prn),
         |pr0 AS (
         |  SELECT node, CAST($Mass // n AS BIGINT) AS pr
         |  FROM prnodes, prn)""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"pr${i - 1}"
      s"""princ$i AS (
         |  SELECT e.peer AS node,
         |    sum(((p.pr * $DampNum) // $DampDen) // dg.d) AS s
         |  FROM $prev p
         |  JOIN prdeg dg ON p.node = dg.node
         |  JOIN predges e ON p.node = e.node
         |  GROUP BY e.peer),
         |pr$i AS (
         |  SELECT nd.node,
         |    CAST(prbase.b + coalesce(i$i.s, 0) AS BIGINT) AS pr
         |  FROM prnodes nd CROSS JOIN prbase
         |  LEFT JOIN princ$i i$i ON nd.node = i$i.node)""".stripMargin
    }
    s"""$base,
       |${steps.mkString(",\n")}""".stripMargin
  }
}
