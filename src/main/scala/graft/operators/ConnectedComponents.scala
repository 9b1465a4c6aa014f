package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative minimum-label propagation — the
  * clustering step that turns pairwise near-dup CANDIDATES into dedup
  * DECISIONS (every member of a component maps to one canonical id).
  *
  * Each round joins every vertex's current label against its neighbors'
  * and keeps the minimum; convergence when no label changes. Rounds are
  * O(component diameter) — near-dup graphs are overwhelmingly tiny
  * star/clique components, so 2-4 rounds in practice; `maxIter` bounds
  * pathological chains. Each round is one self-join + one aggregation —
  * all distributed, no driver-side graph. (At extreme scale swap in
  * large-star/small-star (Kiveris et al.) — same API, fewer rounds; the
  * fixpoint semantics and output are identical.)
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges (src, dst)
    * @return (vertex, component) — component = min vertex id reachable;
    *         isolated vertices (absent from edges) are the caller's
    *         concern (they are their own component by definition)
    */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("comp", col("v"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // every vertex adopts min(own label, neighbors' labels)
      val next = sym
        .join(labels.withColumnRenamed("v", "b").withColumnRenamed("comp", "nComp"), Seq("b"))
        .groupBy(col("a").as("v"))
        .agg(min(col("nComp")).as("neighborMin"))
        .join(labels, Seq("v"))
        .select(col("v"), least(col("comp"), col("neighborMin")).as("comp"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("v"))
        .filter(col("comp") =!= col("old")).limit(1).count() > 0
      labels.unpersist()
      labels = next
      converged = !changed
    }
    sym.unpersist()
    labels
  }
}
