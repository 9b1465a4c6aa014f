package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA, Raghavan et al. 2007) — the
  * COMMUNITY-DETECTION primitive beside connected components
  * ([[ConnectedComponents]]), PageRank ([[PageRank]]) and triangle
  * counting ([[TriangleCount]]): each vertex starts labeled with its
  * own id and, for a FIXED number of synchronous rounds, adopts the
  * label most frequent among its neighbors. Where CC merges everything
  * reachable (one bridge edge fuses two mirror families), LPA keeps
  * densely-connected groups apart — the right granularity when an LSH
  * chaining artifact links two otherwise-unrelated dup families.
  *
  * Determinism contract: updates are SYNCHRONOUS (round k reads only
  * round k−1 labels — the asynchronous variant is arrival-order
  * dependent and could never hash-gate), the frequency argmax breaks
  * ties by MINIMUM label, and labels are integers end-to-end, so a
  * fixed-round run is a pure function of the edge set and replays
  * exactly as unrolled SQL (per-round: neighbor-label counts →
  * row_number argmax). Fixed rounds rather than run-to-convergence is
  * itself part of the contract: plain LPA can oscillate between two
  * labelings on bipartite-ish regions (the known two-coloring cycle),
  * so "until stable" is not well-defined without damping — production
  * systems run a bounded round count exactly like fixed-k PageRank.
  *
  * Scale shape: each round is one partitioned equi-join (labels onto
  * edge sources) and two partial-agg exchanges (count by (dst, label),
  * then argmax by dst via `max(struct(cnt, -label))` — O(1) agg state,
  * no per-vertex window sort). Per-round cost is O(|E|) shuffled pairs
  * — the PageRank iteration shape — and the fixed small round count
  * chains into ONE declarative action sized end-to-end by AQE (see
  * [[PageRank.CheckpointInterval]] for why fixed-k loops do not need
  * the unbounded-CC checkpoint discipline).
  */
object LabelPropagation {

  /** Run `iters` synchronous rounds over a SYMMETRIC edge list
    * (`src`, `dst` — both directions present, as the near-dup
    * candidate graph provides). Every vertex in the edge list has ≥ 1
    * neighbor by construction, so no keep-own-label fallback row is
    * needed. Returns (`id`, `community`).
    */
  def run(edges: DataFrame, iters: Int): DataFrame =
    runWeighted(edges.select(col("src"), col("dst"))
      .withColumn("weight", lit(1L)), iters)

  /** Weighted majority vote: a neighbor's label counts with its edge
    * WEIGHT (positive longs — e.g. verified Jaccard in fixed point),
    * so a 0.95-similarity neighbor outvotes three 0.01 hash-collision
    * neighbors — the similarity-strength refinement [[graft.operators.PageRank.runWeighted]]
    * applies to ranking, applied to community membership. `run` IS
    * this at weight 1 (`count ≡ sum(1)` term-for-term), so the
    * unweighted path keeps its replay contract while sharing one
    * implementation. Ties still break to the minimum label; integer
    * weight sums keep every round order-free and SQL-replayable.
    */
  def runWeighted(edges: DataFrame, iters: Int): DataFrame = {
    require(iters > 0, "iters must be positive")
    val e = edges.select(col("src"), col("dst"),
        col("weight").cast("long"))
      .filter(col("weight") > 0L)
    var labels = e.select(col("dst").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    var i = 0
    while (i < iters) {
      val nbr = e
        .join(labels.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), col("lbl"), col("weight"))
      labels = nbr.groupBy("v", "lbl").agg(sum(col("weight")).as("c"))
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("b"))
        .select(col("v"), (-col("b.neg")).as("lbl"))
      i += 1
    }
    labels.select(col("v").as("id"), col("lbl").as("community"))
  }
}
