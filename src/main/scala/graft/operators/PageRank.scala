package graft.operators

import graft.Materialize.Ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT integer fixed-point arithmetic —
  * the second iterative graph primitive beyond
  * [[ConnectedComponents]]: where CC answers "which near-dups form one
  * group", PageRank ranks WITHIN the graph (e.g. the most-linked
  * canonical page in a dup cluster, or authority weighting for
  * survivor selection over a link graph).
  *
  * Integer discipline (the q102 rule applied to an iterative
  * algorithm): floating-point PageRank is NOT cross-engine
  * reproducible, because each iteration sums per-edge double
  * contributions in partition order — a different engine (or a
  * different partitioning of the SAME engine) adds them in a different
  * order and drifts in the last ulps, compounding per iteration. Here
  * every rank is a non-negative long in units of `scale⁻¹` total mass:
  *  - initial rank: `scale div N` per node (identical everywhere);
  *  - damped share: `(r · DampNum) div DampDen`, then `div outdeg`
  *    per out-edge — floor divisions on non-negative longs, where
  *    floor = truncation, so Spark `div` and any SQL engine's integer
  *    division agree;
  *  - new rank: `base + Σ contributions` — a sum of LONGS, which is
  *    order-free, so partitioning cannot change the result.
  * Floor division leaks ≤ 1 unit of mass per division (the classic
  * fixed-point PageRank formulation); at scale = 10¹² the relative
  * error per iteration is ≤ (N + E)/10¹² — negligible for ranking, and
  * EXACTLY REPRODUCED by any engine running the same formula, which is
  * the point: the whole iteration is hash-gateable against a SQL
  * oracle.
  *
  * Scale shape: per iteration, ONE shuffle (the `groupBy(dst)` partial
  * aggregation — map-side combine keeps per-reducer traffic at
  * distinct-dst cardinality) plus a broadcast-or-sort-merge join of
  * ranks against edges on `src`. Ranks are materialized ([[graft.Materialize]]) every
  * round (the [[ConnectedComponents]] lineage lesson: round N's plan
  * must be one join over round N−1's blocks, not a 2^N nest).
  * Iterations are FIXED (no convergence test): training-data ranking
  * wants deterministic cost and deterministic output, and k≈5 is
  * within a few percent of the fixpoint for damping 0.85 on the
  * short-diameter graphs dedup candidates produce. Dangling nodes
  * (outdeg 0) simply leak their damped mass by default — the standard
  * "no-redistribution" variant, chosen because it keeps the oracle
  * replay trivial; callers ranking undirected graphs never see it
  * (every undirected edge yields an out-edge both ways). Directed
  * link graphs with real sinks should pass
  * `redistributeDangling = true`: each round the sinks' damped mass is
  * summed (one broadcast-scalar frame — no driver round-trip, the
  * k-iteration plan stays ONE action) and every node receives
  * `danglingMass div N`, the textbook redistribution in the same
  * floor-division discipline (≤ N extra units leaked per round).
  *
  * [[runWeighted]] generalizes the edge walk to positive integer edge
  * weights: a source's damped mass splits proportionally,
  * `(damped · w) div Σw`, instead of uniformly. `run` IS
  * `runWeighted` at weight 1 — `(damped · 1) div outdeg` ≡
  * `damped div outdeg` term-for-term, so the unweighted path keeps
  * its bit-exact oracle while sharing one implementation. Weights must
  * keep `scale · maxWeight < 2⁶³` (at the default scale that allows
  * weights up to ~9·10⁶ — a similarity in 10⁻⁶ fixed point fits).
  */
object PageRank {

  /** Damping factor 0.85 as an exact rational — integer arithmetic
    * only ever multiplies by the numerator and floor-divides by the
    * denominator, so the "double" 0.85 never appears.
    */
  val DampNum = 85L
  val DampDen = 100L

  /** Default total-mass scale: ranks are longs in units of 10⁻¹². */
  val DefaultScale = 1000000000000L

  /** Rank `edges` (directed `src` → `dst` long columns; callers with
    * undirected graphs union both directions first) for `iters`
    * rounds. Returns one row per node appearing as EITHER endpoint:
    * `(id, rank, outdeg)` with `rank` in `scale⁻¹` units.
    */
  /** Checkpoint the rank frame every this-many iterations. Unlike
    * [[ConnectedComponents]] — an UNBOUNDED loop whose convergence
    * check must materialize every round anyway — a fixed-k PageRank is
    * best left as one declarative multi-shuffle plan: chaining k
    * iterations into a single action lets AQE size every exchange and
    * costs one job instead of k. The interval only exists to bound
    * lineage depth/analysis cost for LARGE k (k ≳ 8 nests enough joins
    * that Catalyst re-analysis dominates); at the default it never
    * fires for the q104-style k = 5.
    */
  val CheckpointInterval = 8

  def run(edges: DataFrame, iters: Int,
          scale: Long = DefaultScale,
          redistributeDangling: Boolean = false): DataFrame =
    runWeighted(
      edges.select(col("src"), col("dst")).withColumn("weight", lit(1L)),
      iters, scale, redistributeDangling)

  /** Weighted rank: `edges` carries `(src, dst, weight)` with positive
    * long weights (zero/negative-weight edges are dropped — a zero
    * edge is no edge). Returns `(id, rank, outdeg)` where `outdeg` is
    * the node's TOTAL OUT-WEIGHT (= out-edge count at weight 1, so
    * [[run]]'s column contract is unchanged).
    */
  def runWeighted(edges: DataFrame, iters: Int,
                  scale: Long = DefaultScale,
                  redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("weight").cast("long"))
      .filter(col("weight") > 0L)
      .materialize() // consumed every iteration + for nodes/outdeg
    val nodes = edges.select(col("src").cast("long").as("id"))
      .union(edges.select(col("dst").cast("long").as("id"))).distinct()
      .materialize()
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(sum(col("weight")).as("outdeg"))
    // nodes ⟕ outdeg: sinks keep outdeg 0 and contribute nothing
    // (a node whose edges ALL have weight 0 is a sink by construction)
    val base0 = nodes.join(outdeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .materialize()
    val n = base0.count()
    val init = scale / n
    val teleport = ((scale / n) * (DampDen - DampNum)) / DampDen
    var ranks = base0.select(col("id"), lit(init).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outdeg.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr(s"(((rank * $DampNum) div $DampDen) * weight) div outdeg")
            .as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_mass"))
      val withMass = base0.select(col("id"))
        .join(contrib, Seq("id"), "left")
      ranks =
        if (!redistributeDangling)
          withMass.select(col("id"),
            (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("rank"))
        else {
          // one-row damped-sink-mass frame, broadcast into every row:
          // the redistribution stays inside the single declarative plan
          // (no per-iteration driver action)
          val dang = ranks
            .join(base0.filter(col("outdeg") === 0L).select("id"), "id")
            .agg(coalesce(sum(expr(s"(rank * $DampNum) div $DampDen")),
              lit(0L)).as("dmass"))
          withMass.crossJoin(broadcast(dang))
            .select(col("id"),
              (lit(teleport) + coalesce(col("in_mass"), lit(0L)) +
                expr(s"dmass div ${n}L")).as("rank"))
        }
      i += 1
      if (i % CheckpointInterval == 0 && i < iters)
        ranks = ranks.materialize()
    }
    ranks.join(base0.select(col("id"), col("outdeg")), "id")
  }

  /** PERSONALIZED PageRank: teleport mass returns to a SEED SET
    * instead of uniformly — the random surfer restarts at the seeds,
    * so ranks measure graph PROXIMITY TO THE SEEDS rather than global
    * authority ("documents most connected to this document through
    * the near-dup graph"). Same integer discipline as [[run]]:
    * seeds start with `scale div nS` each (others 0), every round each
    * seed receives `((scale div nS) · (1−d)) div 1` teleport units and
    * non-seeds receive none; walk mass flows exactly as in the
    * unweighted walk. Seeds outside the graph are ignored; `nS` is the
    * count of seeds that intersect it (hard-fails at zero — a PPR of
    * nothing is a bug, not an empty frame).
    *
    * Scale shape: identical to [[run]] (one partial-agg shuffle per
    * round), plus one broadcast-sized seed marker join at setup.
    * Returns `(id, rank, outdeg, is_seed)`.
    */
  def runPersonalized(edges: DataFrame, iters: Int, seeds: DataFrame,
                      scale: Long = DefaultScale): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .materialize()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    val seedIds = seeds.select(col("id").cast("long")).distinct()
      .withColumn("is_seed", lit(true))
    val base0 = nodes.join(outdeg, Seq("id"), "left")
      .join(seedIds, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .materialize()
    val nS = base0.filter(col("is_seed")).count()
    require(nS > 0, "no seed intersects the graph")
    val init = scale / nS
    val tele = ((scale / nS) * (DampDen - DampNum)) / DampDen
    var ranks = base0.select(col("id"),
      when(col("is_seed"), lit(init)).otherwise(lit(0L)).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outdeg.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr(s"((rank * $DampNum) div $DampDen) div outdeg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_mass"))
      ranks = base0.select(col("id"), col("is_seed"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(tele)).otherwise(lit(0L)) +
            coalesce(col("in_mass"), lit(0L))).as("rank"))
      i += 1
      if (i % CheckpointInterval == 0 && i < iters)
        ranks = ranks.materialize()
    }
    ranks.join(base0.select(col("id"), col("outdeg"), col("is_seed")), "id")
  }
}
