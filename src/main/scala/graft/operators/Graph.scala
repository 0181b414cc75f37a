package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge lists (beyond the connected-components
  * pass in [[Dedup]]): fixed-iteration PageRank.
  *
  * Scale design: each iteration is one keyed join (ranks ⋈ edges on src)
  * plus one aggregate (sum of contributions by dst) — the standard
  * Pregel-as-DataFrame shape. Iterations only grow the logical plan (no
  * driver-side data); for deep iteration counts callers should
  * `localCheckpoint` between rounds like the CC loop does. Ranks are
  * re-quantized to integers at every round so float summation order cannot
  * drift between partitionings or engines (the repo's integer-cents rule).
  */
object Graph {

  /** Quantization scale for rank values (shared with the oracle SQL). */
  val RankScale: Double = 1e12

  private def q(c: org.apache.spark.sql.Column) =
    floor(c * lit(RankScale) + lit(0.5)).cast("long") / lit(RankScale)

  /** Fixed-iteration PageRank over a directed edge list `(src, dst)`.
    *
    * r₀ = 1/N; rᵢ₊₁(v) = (1−d)/N + d·Σ_{u→v} rᵢ(u)/outdeg(u). Nodes are
    * the union of both endpoints; nodes without in-edges keep the teleport
    * term. The caller guarantees every node has at least one out-edge
    * (e.g. by symmetrizing a bipartite relation) — so no dangling-mass
    * redistribution is needed and the oracle stays a mechanical unroll.
    *
    * Everything stays declarative: N rides along via a broadcast scalar
    * crossJoin, never a driver-side collect. */
  def pagerank(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    // out-degree denormalized onto each edge ONCE — each round is then a
    // single ranks ⋈ edges join instead of ranks ⋈ outdeg ⋈ edges
    val eod = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"), col("outdeg")).localCheckpoint()

    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), q(lit(1.0) / col("n_nodes")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks.as("rk")
        .join(eod.as("eg"), col("rk.node") === col("eg.src"))
        .select(col("eg.dst").as("dst"),
          floor(col("rk.rank") / col("eg.outdeg") * lit(RankScale) + lit(0.5))
            .cast("long").as("cq"))
        .groupBy(col("dst")).agg(sum(col("cq")).as("sumq"))
      ranks = nodes.as("nd").crossJoin(broadcast(n))
        .join(contrib.as("ct"), col("nd.node") === col("ct.dst"), "left")
        .select(col("nd.node").as("node"),
          q(lit(1 - d) / col("n_nodes") +
            lit(d) * (coalesce(col("sumq"), lit(0L)) / lit(RankScale))).as("rank"))
    }
    ranks
  }
}
