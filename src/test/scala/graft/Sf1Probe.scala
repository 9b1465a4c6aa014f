package graft

import graft.queries.{DedupQueries, RelationalQueries, TimeseriesQueries}
import org.apache.spark.sql.functions._

/** Independent sf1 verification of the four queries whose DuckDB
  * replays are super-linear (r11 verdict item 2: q141/q81/q108/q199
  * had engine results at sf1 but no independent check — their
  * unrolled/recursive SQL oracles need 70–80 GB and CPU-hours at
  * sf0.5 and were never attempted at sf1). Each gets a check that
  * shares NO code with the distributed path it verifies:
  *
  *  - **q141 HITS — replica-decomposition oracle.** The sf1 lake is
  *    10 disjoint key-shifted copies of the sf0.1 lake
  *    ([[ScaleUpData]]: every purchase-graph key shifts by its owning
  *    table's id span, so the bipartite graph is exactly 10
  *    non-interacting copies). HITS' max-normalization is
  *    scale-invariant across identical copies (the max over the union
  *    IS each copy's max), so q141(sf1) must equal the DuckDB-verified
  *    q141(sf0.1) replicated 10× with hub ids shifted by the customer
  *    span and authority ids by the part span — EXACTLY, score for
  *    score. Any scale-dependent defect (overflow past 10× mass,
  *    wrong global aggregate, partition-sensitive ordering) breaks
  *    the equality.
  *  - **q81/q108 clustering + survivors — driver union-find replay.**
  *    The near-dup partition is recomputed from the engine's
  *    (non-iterative, oracle-verified-at-sf0.01) collapsed inputs —
  *    exact-dup mapping ∪ rep-level candidate pairs — by a plain
  *    array-based union-find on the driver: a different algorithm,
  *    different execution model, no Spark iteration. Cluster ids must
  *    equal the component minimum; survivors must equal a driver
  *    argmax replay of (quality,−id) / (rank,−id) per component.
  *  - **q104 PageRank (q108's rank input) — driver integer replay.**
  *    The exact fixed-point recurrence (the q104 oracle's formula,
  *    same one PageRankSpec pins at toy scale) over the collected sf1
  *    candidate edge list, in driver-local Long maps.
  *  - **q199 hotspots** — the probe dumps the engine frame to parquet;
  *    `scripts/check_sf1_q199.py` rebuilds it from the raw events
  *    parquet via DuckDB (linear rollup) + a Python union-find over
  *    the ≤360·180 dense-cell grid and compares row sets (the
  *    recursive-CTE-free replay of the q199 oracle).
  *
  * Run: `Test/runMain graft.Sf1Probe <baseDir> <bigDir> <factor> <outDir>`
  * (SCALE.md §25 records results).
  */
object Sf1Probe {

  /** Exact integer PageRank recurrence — mirrors the q104 oracle
    * formula (teleport + damped mass split by outdegree, floor
    * division at every step), independent of
    * [[graft.operators.PageRank]]'s DataFrame loop.
    */
  private def replayPageRank(edges: Array[(Long, Long)], iters: Int,
                             scale: Long): Map[Long, (Long, Long)] = {
    import graft.operators.PageRank.{DampDen, DampNum}
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val n = nodes.length.toLong
    val teleport = ((scale / n) * (DampDen - DampNum)) / DampDen
    var r = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val mass = edges
        .map { case (s, d) => d -> ((r(s) * DampNum) / DampDen) / out(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (teleport + mass.getOrElse(v, 0L))).toMap
    }
    nodes.map(v => v -> (r(v), out.getOrElse(v, 0L))).toMap
  }

  /** Array-backed union-find with path halving — the independent CC. */
  private final class UnionFind(ids: Array[Long]) {
    private val index = ids.zipWithIndex.toMap
    private val parent = Array.tabulate(ids.length)(identity)
    private def find(i: Int): Int = {
      var x = i
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(index(a)); val rb = find(index(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    /** Component label = MIN member id (the oracle's convention). */
    def labels(): Map[Long, Long] = {
      val minOf = new java.util.HashMap[Int, Long]()
      ids.indices.foreach { i =>
        val r = find(i)
        val cur = minOf.getOrDefault(r, Long.MaxValue)
        if (ids(i) < cur) minOf.put(r, ids(i)): Unit
      }
      ids.indices.map(i => ids(i) -> minOf.get(find(i))).toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/sf1-r12"
    val factor = if (args.length > 2) args(2).toInt else 10
    val outDir = if (args.length > 3) args(3) else "/tmp/sf1probe"
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    var failed = List.empty[String]
    def check(name: String)(ok: => Boolean): Unit = {
      val t0 = System.nanoTime()
      val pass = ok
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${if (pass) "PASS" else "FAIL"}  $name%-70s ${sec}%6.1f s")
      if (!pass) failed ::= name
    }

    // ---- q141: replica-decomposition oracle --------------------------
    def span(table: String, key: String): Long =
      Tables.load(spark, base, table).agg(max(col(key))).head().getLong(0) + 1L
    val custSpan = span("customer", "c_custkey")
    val partSpan = span("part", "p_partkey")
    val baseHits = RelationalQueries.q141(spark, base)
      .as[(String, Long, Long)].collect()
    val predicted = (for {
      (side, id, score) <- baseHits.iterator
      i <- 0 until factor
    } yield (side, id + i * (if (side == "hub") custSpan else partSpan),
        score)).toSet
    val bigHits = RelationalQueries.q141(spark, big)
      .as[(String, Long, Long)].collect().toSet
    check(s"q141(sf1) == $factor shifted copies of the verified q141(sf0.1)") {
      bigHits == predicted
    }

    // ---- clustering partition: driver union-find over the collapsed
    //      inputs (exact-dup mapping ∪ rep-level candidates) ----------
    val (mappingDf, repCandDf) = DedupQueries.collapsedLshInputs(spark, big)
    val mapping = mappingDf.select(col("doc_id"), col("rep_id"))
      .as[(Long, Long)].collect()
    val repCand = repCandDf.select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect()
    val allDocs = Tables.load(spark, big, "documents")
      .select(col("doc_id")).as[Long].collect()
    val uf = new UnionFind(allDocs.sorted)
    mapping.foreach { case (d, r) => uf.union(d, r) }
    repCand.foreach { case (a, b) => uf.union(a, b) }
    val ufLabels = uf.labels()

    val engineLabels = DedupQueries.clusterLabels(spark, big)
      .as[(Long, Long)].collect().toMap
    check("q48 labels(sf1) == driver union-find over collapsed inputs " +
      s"(${allDocs.length} docs, ${repCand.length} rep pairs)") {
      engineLabels.size == allDocs.length &&
        allDocs.forall(d => engineLabels(d) == ufLabels(d))
    }

    // ---- q81: survivor argmax replay over the union-find partition ---
    val q81rows = DedupQueries.q81(spark, big)
      .select(col("doc_id"), col("quality"), col("cluster_id"),
        col("survivor_id"), col("is_survivor"))
      .as[(Long, Double, Long, Long, Boolean)].collect()
    check("q81(sf1) clusters + survivors == (quality, -id) argmax replay") {
      val byCluster = q81rows.groupBy(_._3)
      q81rows.length == allDocs.length &&
        q81rows.forall { case (d, _, c, _, _) => c == ufLabels(d) } &&
        byCluster.forall { case (_, rs) =>
          val exp = rs.maxBy { case (d, q, _, _, _) => (q, -d) }._1
          rs.forall { case (d, _, _, sv, isv) =>
            sv == exp && isv == (d == exp)
          }
        }
    }

    // ---- q104: exact integer replay on the collected edge list ------
    val pairs = DedupQueries.candidatePairs(spark, big)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
    val edges = pairs.flatMap(p => Array(p, p.swap))
    val replayed = replayPageRank(edges, DedupQueries.PageRankIters,
      graft.operators.PageRank.DefaultScale)
    val engineRanks = DedupQueries.pageRankRanks(spark, big)
      .as[(Long, Long, Long)].collect()
    check(s"q104(sf1) == driver integer PageRank replay " +
      s"(${pairs.length} pairs, ${replayed.size} nodes)") {
      engineRanks.length == replayed.size &&
        engineRanks.forall { case (id, rank, deg) =>
          replayed.get(id).contains((rank, deg))
        }
    }

    // ---- q108: authority survivor replay over the same partition ----
    val ranksByDoc = engineRanks.map(r => r._1 -> r._2).toMap
    val q108rows = DedupQueries.q108(spark, big)
      .select(col("doc_id"), col("cluster_id"), col("survivor_id"),
        col("is_survivor"))
      .as[(Long, Long, Long, Boolean)].collect()
    check("q108(sf1) survivors == (replayed rank, -id) argmax replay") {
      val byCluster = q108rows.groupBy(_._2)
      q108rows.length == allDocs.length &&
        q108rows.forall { case (d, c, _, _) => c == ufLabels(d) } &&
        byCluster.forall { case (_, rs) =>
          val exp = rs.maxBy { case (d, _, _, _) =>
            (replayed.get(d).map(_._1).getOrElse(-1L), -d)
          }._1
          rs.forall { case (d, _, sv, isv) => sv == exp && isv == (d == exp) }
        }
    }

    // ---- q199: dump for the DuckDB + python union-find replay -------
    TimeseriesQueries.q199(spark, big).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/q199")
    println(s"q199(sf1) written to $outDir/q199 — " +
      "run scripts/check_sf1_q199.py next")

    if (failed.nonEmpty) {
      println(s"FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("ALL PASS")
    spark.stop()
  }
}
