package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-relation graph operators shared by the `graph_*` queries and
  * spec-testable on constructed graphs. All take narrow (long, long)
  * edge DataFrames — at scale only ids and counts ever shuffle.
  *
  * The corpus queries feed these the parse-derived link graph
  * (WaveSevenQueries.linkEdges); GraphOpsSpec feeds literal graphs
  * with hand-computable truth (K4, pendant triangle, 2-cycle path).
  */
object GraphOps {

  /** Distinct undirected edge set `(a, b), a < b` from directed
    * `(src, dst)` rows; checkpointed (every consumer reads it at
    * least twice). */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()

  private def degrees(und: DataFrame): DataFrame = und
    .select(explode(array(col("a"), col("b"))).as("node"))
    .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Node triangle counts + clustering coefficient, DEGREE-ORIENTED
    * (Schank & Wagner 2005 / Suri & Vassilvitskii 2011): each edge
    * orients from lower to higher (degree, id) rank, so every
    * triangle counts exactly once and wedge fan-out is bounded by the
    * graph's arboricity — the hub-skew guard a raw 3-way self-join
    * lacks. Output (node, deg, tri, cc_ppm) for nodes with deg >= 1,
    * cc on an exact ppm grid. */
  def triangleStats(und: DataFrame): DataFrame = {
    val deg = degrees(und)
      .localCheckpoint() // consumers: rank keys + final cc join
    // distinct total-order rank key: degree-major, id tiebreak
    val rk = deg.select(col("node"),
      (col("deg") * lit(4294967296L) + col("node")).as("rk"))
    val ord = und
      .join(rk.select(col("node").as("a"), col("rk").as("ra")), "a")
      .join(rk.select(col("node").as("b"), col("rk").as("rb")), "b")
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b"))
          .as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a"))
          .as("v"),
        greatest(col("ra"), col("rb")).as("rv"))
      .localCheckpoint() // consumers: both wedge sides + closing
    val wedges = ord.as("x")
      .join(ord.as("y"),
        col("x.u") === col("y.u") && col("x.rv") < col("y.rv"))
      .select(col("x.u").as("n1"), col("x.v").as("n2"),
        col("y.v").as("n3"))
    val tris = wedges.join(
      ord.select(col("u").as("n2"), col("v").as("n3")),
      Seq("n2", "n3"), "left_semi")
    val perNode = tris
      .select(explode(array(col("n1"), col("n2"), col("n3")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .select(col("node"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr("tri * 2000000L div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
  }

  /** Bounded-round k-core peel (Seidman 1983; distributed peeling à
    * la Montresor et al. 2013): `rounds` × (degree count + two
    * semi-joins). Output (node, deg) over the surviving subgraph —
    * the fixpoint approximated from above. */
  def kcore(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = und
    for (_ <- 1 to rounds) {
      val keep = degrees(edges).filter(col("deg") >= k)
        .select(col("node"))
      edges = edges
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    degrees(edges)
  }

  /** Synchronous label propagation (Raghavan et al. 2007): directed
    * edges are symmetrized, every node starts as its own label,
    * each round the most-frequent neighbor label wins (ties to the
    * smallest); isolated nodes keep their own. Per round: one
    * key-partitioned join + one (node, label) count + one struct-max
    * argmax — only narrow longs shuffle, labels localCheckpoint per
    * round so lineage stays flat. Output (node, label, members). */
  def labelPropagate(nodes: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    // pin column ORDER before the positional union (callers may lead
    // with either column), then symmetrize
    val e0 = edges.select(col("src"), col("dst"))
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = nodes
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
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
  }
}
