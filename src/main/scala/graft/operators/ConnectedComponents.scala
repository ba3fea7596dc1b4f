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
  * rounds, and `maxIter` bounds the worst case. (GraphX/GraphFrames ship
  * alternating large-star/small-star for O(log D) — out of scope here;
  * the dataflow below is the same shape.)
  *
  * Determinism: min() is order-insensitive, so the result is exact and
  * engine-independent — the DuckDB oracle walks the same closure with a
  * recursive CTE.
  */
object ConnectedComponents {

  /** Max symmetrized edge rows resolved driver-side (~16 bytes/edge →
    * tens of MB); larger graphs run the distributed label rounds. */
  val DriverEdgeCap: Long = 2L * 1000 * 1000

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

    // localCheckpoint-with-tracking: Dataset.unpersist does NOT free a
    // checkpointed Dataset's blocks (it only clears CacheManager
    // entries), so each round's snapshot is tracked by the RDD id that
    // backs its LogicalRDD plan — read directly off the plan, never by
    // diffing getPersistentRDDs, which would misattribute (and later
    // force-unpersist) RDDs persisted concurrently by other jobs
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val out = df.localCheckpoint()
      (out,
        org.apache.spark.sql.graftbridge.ColumnBridge
          .checkpointRddId(out).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

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
      free(symIds)
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
      free(labelIds)
      labelIds = newIds
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    free(symIds)
    // a silent partial result would split duplicate groups undetectably —
    // refuse instead (a diameter above maxIter means the caller should
    // raise it, or switch to a log-rounds large-star/small-star variant)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          "(component diameter exceeds maxIter)")
    labels
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
