package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the operator that
  * turns pairwise near-duplicate PAIRS into duplicate GROUPS (keep one
  * document per component: the standard last step of corpus dedup).
  *
  * Spark-native iterative min-label propagation: every node repeatedly
  * adopts the minimum label among itself and its neighbors until a round
  * changes nothing. Each round is one shuffle (join on node id) +
  * aggregation; `localCheckpoint` truncates the growing lineage so round
  * N's plan does not replay rounds 1..N-1. Rounds needed = component
  * diameter — near-dup clusters are shallow (stars/cliques), so this
  * converges in 2-3 rounds; a pathological chain of length D costs D
  * rounds, and `maxIter` bounds the worst case. For deep graphs,
  * [[runLogStar]] is the alternating large-star/small-star variant
  * (Kiveris et al. 2014) converging in O(log^2 n) rounds regardless of
  * diameter.
  *
  * Determinism: min() is order-insensitive, so the result is exact and
  * engine-independent — the DuckDB oracle walks the same closure with a
  * recursive CTE.
  */
object ConnectedComponents {

  /** Max symmetrized edge rows resolved driver-side (~16 bytes/edge →
    * tens of MB); larger graphs run the distributed label rounds. */
  val DriverEdgeCap: Long = 2L * 1000 * 1000

  // localCheckpoint-with-tracking: Dataset.unpersist does NOT free a
  // checkpointed Dataset's blocks (it only clears CacheManager
  // entries), so each round's snapshot is tracked by the RDD id that
  // backs its LogicalRDD plan — read directly off the plan, never by
  // diffing getPersistentRDDs, which would misattribute (and later
  // force-unpersist) RDDs persisted concurrently by other jobs
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val out = df.localCheckpoint()
    (out,
      org.apache.spark.sql.graftbridge.ColumnBridge
        .checkpointRddId(out).toSet)
  }

  private def free(
      sc: org.apache.spark.SparkContext, ids: Set[Int]): Unit =
    ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

  /** @param edges two long columns (srcCol, dstCol), undirected pairs
    * @return (node, component) — component is the min node id reachable;
    *         every node that appears in any edge gets a row */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50,
      driverEdgeCap: Long = DriverEdgeCap): DataFrame = {
    val sc = edges.sparkSession.sparkContext

    val (sym, symIds) = checkpointTracked(
      edges
        .select(col(srcCol).as("node"), col(dstCol).as("peer"))
        .unionAll(edges.select(col(dstCol).as("node"), col(srcCol).as("peer")))
        .distinct())

    // Bounded driver fast path: below DriverEdgeCap the whole edge list
    // fits comfortably on the driver, and path-compressed union-find
    // resolves it in microseconds — versus one full join+agg round trip
    // per diameter step. Near-dup graphs at corpus scale are SPARSE
    // relative to the corpus (edges ~ duplicates, not documents), so
    // this path serves most real batches; bigger graphs take the
    // distributed rounds below. Results are identical: min reachable id.
    val edgeCount = sym.count()
    if (edgeCount <= driverEdgeCap) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      sym.select(col("node"), col("peer")).collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // min-id root so the representative IS the min reachable id
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = parent.keys.toSeq.sorted.map(n => (n, find(n)))
      free(sc, symIds)
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toDF("node", "component")
    }

    var (labels, labelIds) = checkpointTracked(
      sym.select(col("node")).distinct()
        .withColumn("component", col("node")))

    // convergence probe: labels only ever DECREASE, so the label sum is
    // strictly monotone until the fixpoint — comparing sums per round
    // costs one aggregation over the checkpointed result instead of a
    // join against the previous round's labels. Empty graph -> ZERO
    // (sum over no rows is null), which converges on the first round.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)

    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over own label and all neighbors' labels
      val (neighborLabels, newIds) = checkpointTracked(
        sym
          .join(labels.withColumnRenamed("node", "peer"), "peer")
          .select(col("node"), col("component"))
          .unionAll(labels)
          .groupBy(col("node"))
          .agg(min(col("component")).as("component")))
      val newSum = labelSum(neighborLabels)
      labels = neighborLabels
      free(sc, labelIds)
      labelIds = newIds
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    free(sc, symIds)
    // a silent partial result would split duplicate groups undetectably —
    // refuse instead (a diameter above maxIter means the caller should
    // raise it, or switch to a log-rounds large-star/small-star variant)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          "(component diameter exceeds maxIter)")
    labels
  }

  /** Alternating large-star / small-star rounds — Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond" (Algorithms 3-4):
    * the deep-graph complement to [[run]]. Large-star connects every
    * neighbor LARGER than a node to the minimum of its closed
    * neighborhood; small-star connects the smaller ones. Both emit only
    * (bigger, smaller) edges against component minima, the edge set's
    * total order decreases monotonically, and the fixed point is one
    * rooted star per component centered at its minimum — reached in
    * O(log^2 n) alternations regardless of diameter (vs diameter rounds
    * for min-label), each alternation a constant number of shuffles on
    * the CURRENT edge set. Same exact min-id semantics as [[run]], same
    * recursive-CTE oracle; the fixed point is detected by an exact
    * edge-set comparison (count + inner-join count — never a hash
    * probe, which could false-converge), and `maxIter` still refuses a
    * silent partial answer.
    *
    * @param edges two long columns (srcCol, dstCol), undirected pairs
    * @return (node, component), every node appearing in any edge */
  def runLogStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 40): DataFrame = {
    val sc = edges.sparkSession.sparkContext

    // node set from the RAW input — a node whose only edge is a
    // self-loop still appears in the output (as its own component),
    // exactly like [[run]] and the recursive-CTE oracle
    val (nodes, nodeIds) = checkpointTracked(
      edges.select(col(srcCol).as("node"))
        .unionAll(edges.select(col(dstCol).as("node")))
        .distinct())
    // canonical working form: (u, v) with u > v, deduplicated —
    // self-loops carry no connectivity and are dropped from the EDGE set
    val (e0, e0Ids) = checkpointTracked(
      edges.select(
          greatest(col(srcCol), col(dstCol)).as("u"),
          least(col(srcCol), col(dstCol)).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())

    var e = e0
    var eIds = e0Ids
    var converged = e.isEmpty // no edges: every node is its own star
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: symmetrize, m(u) = min of closed neighborhood,
      // emit (neighbor > u) -> m(u). Output edges always point larger
      // -> smaller (v > u >= m), so they are already canonical.
      val nbrs = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = nbrs.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR: per node, link the SMALLER neighbors (and itself)
      // to the minimum of the closed neighborhood. Edges are (u, v<u),
      // so min(v) IS that minimum.
      val mins2 = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val (next, nextIds) = checkpointTracked(
        large.join(mins2, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(mins2.select(col("u"), col("m").as("v")))
          .where(col("u") =!= col("v"))
          .distinct())
      // exact fixed-point probe: canonical distinct sets are equal iff
      // same size and full overlap (one count + one join-count)
      val nNext = next.count()
      converged = nNext == e.count() &&
        next.join(e, Seq("u", "v"), "inner").count() == nNext
      free(sc, eIds)
      e = next
      eIds = nextIds
      iter += 1
    }
    if (!converged) {
      free(sc, eIds); free(sc, e0Ids); free(sc, nodeIds)
      throw new IllegalStateException(
        s"large-star/small-star did not converge within $maxIter rounds")
    }
    // fixed point = stars: non-centers appear as u (pointing at their
    // component min), centers only as v (or not at all, if isolated
    // after self-loop drop — impossible here since e0 has no
    // self-loops, but the left join keeps them labeled anyway)
    val out = nodes
      .join(e.withColumnRenamed("u", "node"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("v"), col("node")).as("component"))
    val result = out.localCheckpoint()
    free(sc, eIds); free(sc, e0Ids); free(sc, nodeIds)
    result
  }

  /** DuckDB oracle: min reachable id via recursive closure. `pairsRel`
    * must expose (da, db) columns. */
  def oracleSql(pairsRel: String): String =
    s"""edges AS (
       |  SELECT da AS node, db AS peer FROM $pairsRel
       |  UNION SELECT db, da FROM $pairsRel),
       |reach(node, r) AS (
       |  SELECT node, node FROM edges
       |  UNION
       |  SELECT e.node, re.r FROM edges e JOIN reach re ON re.node = e.peer),
       |components AS (
       |  SELECT node, min(r) AS component FROM reach GROUP BY node)""".stripMargin
}
