package graft.operators

import graft.Materialize.Ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-node triangle counting over an ID-ORDERED edge list —
  * the third graph primitive beside [[ConnectedComponents]] (which
  * groups) and [[PageRank]] (which ranks): triangles measure local
  * DENSITY, separating clique-like families from chains.
  *
  * Input contract: one row per undirected edge as `(a, b)` with
  * `a < b` and no duplicates (exactly the shape LSH candidate pairs
  * arrive in). Under that orientation a triangle `x < y < z` appears
  * exactly once as `xy ⋈ yz ⋈ xz` — the classic "forward" algorithm:
  * no orientation pass, no double counting, and the join work is
  * bounded by Σ d⁺(v)² over out-degrees of the ID ordering rather
  * than raw degrees (a hub's edges split between in- and out-side).
  *
  * Scale shape: two shuffles for the self-joins (both on edge
  * endpoints — co-partitionable), one partial-agg count; the edge
  * frame is checkpointed once for its three consumers. All counts are
  * exact longs — hash-gateable like every graph op here.
  */
object TriangleCount {

  /** Per-node triangle participation: one row per node appearing in
    * `edges` (`a`/`b` long columns, a < b), `(id, n_triangles)` with
    * zero for triangle-free nodes.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("long"), col("b").cast("long"))
      .materialize() // three self-join consumers + the node list
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"),
        col("ab.a") === col("ac.a") && col("bc.b") === col("ac.b"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("bc.b").as("z"))
      .materialize() // each triangle feeds three per-node counts
    val perNodeCounts = tri.select(col("x").as("id"))
      .union(tri.select(col("y").as("id")))
      .union(tri.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .distinct()
      .join(perNodeCounts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
