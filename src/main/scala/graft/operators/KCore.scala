package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling (Seidman 1983's k-core, bounded-round
  * variant) — the DENSITY-FLOOR primitive beside connected components
  * ([[ConnectedComponents]]), PageRank ([[PageRank]]), triangle
  * counting ([[TriangleCount]]) and label propagation
  * ([[LabelPropagation]]): repeatedly delete every vertex whose degree
  * among the still-alive vertices is below k. What survives is (after
  * convergence) the maximal subgraph of minimum degree ≥ k — the
  * "everyone here has at least k independent witnesses" core that
  * separates genuinely dense near-dup families from the chains and
  * pendants LSH banding hangs off them. The PEEL ROUND (the iteration
  * a vertex was deleted in) is the onion-decomposition depth: round-1
  * casualties are pendants, later rounds sat behind layers of support
  * — a per-vertex centrality feature that costs nothing extra.
  *
  * Determinism contract (the [[LabelPropagation]] discipline): rounds
  * are SYNCHRONOUS — round i's degrees are computed entirely against
  * round i−1's alive set, so the result is a pure function of
  * (edges, k, rounds) with no arrival-order dependence; everything is
  * integer counts and set membership, so a fixed-round run replays
  * exactly as unrolled SQL (per round: alive-filtered degree count →
  * threshold). Fixed rounds rather than peel-to-fixpoint is part of
  * the contract: convergence needs an unbounded data-dependent loop
  * (the [[ConnectedComponents]] checkpoint problem) while R rounds of
  * peeling already remove every vertex of onion depth ≤ R — on
  * band-capped candidate graphs the peel settles in a handful of
  * rounds, and the `in_core` flag is explicitly "survived R rounds",
  * exactly like fixed-k PageRank's "rank after k iterations".
  *
  * Scale shape: each round is one partitioned equi-join of the edge
  * list onto the alive set (O(|E|) shuffled pairs, the PageRank
  * iteration cost), one partial-agg degree count, and one semi/anti
  * join pair against the alive set; the alive set only ever SHRINKS,
  * so round cost is non-increasing. The fixed small round count
  * chains into ONE declarative action sized end-to-end by AQE (see
  * [[PageRank.CheckpointInterval]] for why bounded loops skip the
  * unbounded-CC checkpoint discipline).
  */
object KCore {

  /** Peel a SYMMETRIC edge list (`src`, `dst` — both directions
    * present) for `rounds` synchronous rounds at threshold `k`.
    * Returns one row per vertex: (`id`, `degree` — the round-0 degree,
    * `peel_round` — the 1-based round the vertex was deleted in, NULL
    * if it survived all rounds, `in_core` — survived all rounds).
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    val deg0 = e.groupBy(col("dst").as("v"))
      .agg(count(lit(1)).as("degree"))
    var alive = deg0.filter(col("degree") >= k).select(col("v"))
    // round-1 casualties fall out of deg0 directly (degree < k)
    var peeled = deg0.filter(col("degree") < k)
      .select(col("v"), lit(1L).as("peel_round"))
    var i = 2
    while (i <= rounds) {
      // degree within the alive subgraph: an edge contributes to dst
      // iff BOTH endpoints are alive (src via the equi-join, dst via
      // the closing semi-join against the alive set)
      val survivors = e
        .join(alive.withColumnRenamed("v", "src"), Seq("src"))
        .groupBy(col("dst").as("v")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("v"))
        .join(alive, Seq("v"), "left_semi")
      val removed = alive.join(survivors, Seq("v"), "left_anti")
        .select(col("v"), lit(i.toLong).as("peel_round"))
      peeled = peeled.union(removed)
      alive = survivors
      i += 1
    }
    deg0
      .join(peeled, Seq("v"), "left")
      .select(col("v").as("id"), col("degree"), col("peel_round"),
        col("peel_round").isNull.as("in_core"))
  }
}
