package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative minimum-label propagation — the
  * clustering step that turns pairwise near-dup CANDIDATES into dedup
  * DECISIONS (every member of a component maps to one canonical id).
  *
  * Each round (a) takes the minimum over every vertex's neighbors'
  * labels and (b) SHORTCUTS: adopts the label of the current label
  * (pointer doubling). The shortcut makes convergence O(log diameter)
  * instead of O(diameter) — measured 4 rounds instead of the 20-round
  * cap on sf0.1's chain-heavy LSH graph. Convergence when no label
  * changes; everything is joins + aggregations, no driver-side graph.
  * (At extreme scale swap in large-star/small-star (Kiveris et al.) —
  * same fixpoint, same output, better skew behavior on giant stars.)
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
      // (a) every vertex adopts min(own label, neighbors' labels)
      val prop = sym
        .join(labels.withColumnRenamed("v", "b").withColumnRenamed("comp", "nComp"), Seq("b"))
        .groupBy(col("a").as("v"))
        .agg(min(col("nComp")).as("neighborMin"))
        .join(labels, Seq("v"))
        .select(col("v"), least(col("comp"), col("neighborMin")).as("comp"))
      // (b) shortcut: follow the label pointer one hop (comp := label's
      // own label when smaller) — pointer doubling
      val next = prop.alias("x")
        .join(prop.select(col("v").as("cv"), col("comp").as("ccomp")).alias("y"),
          col("x.comp") === col("cv"), "left")
        .select(col("x.v").as("v"),
          least(col("x.comp"), coalesce(col("ccomp"), col("x.comp"))).as("comp"))
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
