package graft.operators

import graft.Materialize.Ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Connected components by iterative minimum-label propagation — the
  * clustering step that turns pairwise near-dup CANDIDATES into dedup
  * DECISIONS (every member of a component maps to one canonical id).
  *
  * Each round (a) takes the minimum over every vertex's neighbors'
  * labels and (b) SHORTCUTS: adopts the label of the current label
  * (pointer doubling). The shortcut makes convergence O(log diameter)
  * instead of O(diameter) — measured 4 rounds instead of the 20-round
  * cap on sf0.1's chain-heavy LSH graph.
  *
  * Scale shape (the two things an iterative DataFrame loop MUST do):
  *  - materializing ([[graft.Materialize]]) every round truncates lineage, so round N's
  *    plan is two joins over round N−1's materialized blocks — not a
  *    2^N-deep nest that Catalyst re-analyzes and re-executes. Without
  *    it this loop was 45 s at sf0.1; with it, the per-round cost is
  *    the joins themselves.
  *  - convergence detection rides the SAME job that materializes the
  *    round (a `LongAccumulator` bumped while the checkpoint job runs),
  *    so each round is exactly one Spark job — no separate
  *    `filter(...).count()` pass. Accumulators in transformations can
  *    only over-count (task retry), never under-count, so "0 changes"
  *    is a safe convergence signal; an over-count just buys one extra
  *    (idempotent) round.
  *
  * (At extreme scale swap in large-star/small-star (Kiveris et al.) —
  * same fixpoint, same output, better skew behavior on giant stars.)
  */
object ConnectedComponents {

  /** Hash-bucket count for the [[degreeSketch]]. */
  private val SketchBuckets = 4096

  /** Max-degree fraction above which [[auto]] switches to the
    * skew-robust star variant: one vertex touching ≥ this fraction of
    * all edge endpoints means label propagation would funnel a
    * comparable fraction of the graph through one reduce key every
    * round.
    */
  private[graft] val SkewFraction = 0.10

  /** Cheap degree-skew sketch: hash every edge endpoint into
    * [[SketchBuckets]] buckets and take the largest bucket's share of
    * all endpoints — an UPPER bound on the max-degree share (collisions
    * only inflate it). One partial-agg shuffle of ≤ [[SketchBuckets]]
    * rows regardless of graph size; compare with an exact
    * `groupBy(vertex).count()`, which shuffles every edge and is the
    * very skewed aggregation the sketch is trying to detect.
    */
  private[graft] def degreeSketch(edges: DataFrame,
                                  src: String, dst: String): Double = {
    val ends = edges.select(col(src).as("v"))
      .union(edges.select(col(dst).as("v")))
    val top = ends
      .groupBy(pmod(hash(col("v")), lit(SketchBuckets)).as("b"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("total"))
      .head()
    if (top.isNullAt(0) || top.getLong(1) == 0L) 0.0
    else top.getLong(0).toDouble / top.getLong(1).toDouble
  }

  /** The single CC entry point: picks the variant from the degree
    * sketch — pointer doubling ([[run]]) on low-skew graphs (fewest
    * rounds: 4 on the LSH graph, ~17 at 100k diameter — SCALE.md §2),
    * large-star/small-star ([[runAlternating]]) when one hub dominates
    * (a boilerplate near-dup cluster spanning half the corpus), where
    * propagation would re-shuffle the giant star whole every round but
    * the star rewrite shrinks it. Both produce identical labels
    * (OperatorsSpec), so the choice is pure performance; StressSpec
    * pins the selection on both adversarial graphs.
    */
  def auto(edges: DataFrame, src: String, dst: String,
           maxIter: Int = 30): DataFrame =
    if (degreeSketch(edges, src, dst) >= SkewFraction)
      runAlternating(edges, src, dst, maxIter)
    else run(edges, src, dst, maxIter)

  /** @param edges two-column DataFrame of undirected edges (src, dst)
    * @return (vertex, component) — component = min vertex id reachable;
    *         isolated vertices (absent from edges) are the caller's
    *         concern (they are their own component by definition).
    *         The result is backed by local-checkpoint blocks: they are
    *         released by Spark's ContextCleaner once the frame becomes
    *         unreachable (no `unpersist` needed, and none would be safe
    *         — the checkpoint IS the data, there is no lineage left to
    *         recompute from).
    */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    // Symmetrized edges are re-read every round: checkpoint once.
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .materialize()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("comp", col("v"))
      .materialize()
    val outSchema = labels.schema
    val outEnc = Encoders.row(outSchema)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val changed = sc.longAccumulator(s"cc_changed_$iter")
      // (a) every vertex adopts min(own label, neighbors' labels);
      // carry the old label through for the change count
      val prop = sym
        .join(labels.withColumnRenamed("v", "b").withColumnRenamed("comp", "nComp"), Seq("b"))
        .groupBy(col("a").as("v"))
        .agg(min(col("nComp")).as("neighborMin"))
        .join(labels, Seq("v"))
        .select(col("v"), least(col("comp"), col("neighborMin")).as("comp"),
          col("comp").as("old"))
      // (b) shortcut: follow the label pointer one hop (comp := label's
      // own label when smaller) — pointer doubling
      val next = prop.alias("x")
        .join(prop.select(col("v").as("cv"), col("comp").as("ccomp")).alias("y"),
          col("x.comp") === col("cv"), "left")
        .select(col("x.v").as("v"),
          least(col("x.comp"), coalesce(col("ccomp"), col("x.comp"))).as("comp"),
          col("x.old").as("old"))
        .map { r =>
          if (r.get(1) != r.get(2)) changed.add(1L)
          Row(r.get(0), r.get(1))
        }(outEnc)
        .materialize() // eager: runs the round's one job, fills `changed`
      // previous round's checkpoint blocks are never read again; they
      // are reclaimed by the ContextCleaner once the old Dataset is
      // GC'd (Dataset.unpersist would be a no-op here — checkpoint
      // blocks are RDD-level storage, not CacheManager entries)
      labels = next
      converged = changed.value == 0L
    }
    labels
  }

  /** Large-star / small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SOCC'14) — the
    * same fixpoint as [[run]] with a different per-round shape: instead
    * of propagating labels along every edge (where one giant star makes
    * one reduce key carry the whole component), each round REWRITES the
    * edge set —
    *
    *  - large-star: every node links its larger neighbors to its
    *    minimum neighborhood member — long chains contract toward small
    *    ids without growing any node's degree unboundedly;
    *  - small-star: every node links its smaller-or-equal neighbors
    *    (its parents, post-large-star) to their collective minimum —
    *    flattening multi-level trees into stars.
    *
    * Edges strictly shrink toward the star fixpoint, so the heavy key's
    * payload shrinks every round instead of being re-shuffled whole —
    * the skew-robust choice when one component dominates (e.g. a
    * boilerplate near-dup cluster spanning half the corpus). Output is
    * identical to [[run]] (OperatorsSpec pins equivalence on random
    * graphs); q48 uses [[run]] (fewer rounds on the LSH graph's small
    * components), this variant is the declared swap-in for giant-star
    * corpora.
    */
  def runAlternating(edges: DataFrame, src: String, dst: String,
                     maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // canonical child→parent orientation: (c, p) with p < c
    def canon(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("c"),
        least(col("u"), col("v")).as("p"))
      .distinct()
    var e = canon(edges.select(col(src).as("u"), col(dst).as("v")))
      .materialize()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // large-star: per node u over its full neighborhood, attach every
      // LARGER neighbor to min(N(u) ∪ {u})
      val sym = e.select(col("c").as("u"), col("p").as("v"))
        .union(e.select(col("p").as("u"), col("c").as("v")))
      val minN = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = canon(sym.filter(col("v") > col("u"))
        .join(minN, "u")
        .select(col("v").as("u"), col("m").as("v")))
        .materialize()
      // small-star: per node c over its parents, attach them (and c) to
      // the collective minimum
      val minP = large.groupBy("c").agg(min(col("p")).as("m"))
      val small = canon(
        large.join(minP, "c").select(col("p").as("u"), col("m").as("v"))
          .union(minP.select(col("c").as("u"), col("m").as("v"))))
        .materialize()
      // fixpoint: the rewritten edge set is unchanged (cheap: both
      // sides are checkpointed in-memory blocks). Old rounds' blocks
      // are reclaimed by the ContextCleaner on GC.
      converged = small.exceptAll(e).isEmpty && e.exceptAll(small).isEmpty
      e = small
    }
    // stars: children point at their component min; every other vertex
    // of the INPUT (roots, and vertices whose only edges were
    // self-loops, which canon dropped) labels itself — same vertex set
    // as [[run]]'s symmetrized edge list
    val vertices = edges.select(col(src).as("v"))
      .union(edges.select(col(dst).as("v"))).distinct()
    val children = e.select(col("c").as("v"), col("p").as("comp"))
    vertices.join(children, Seq("v"), "left")
      .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
  }
}
