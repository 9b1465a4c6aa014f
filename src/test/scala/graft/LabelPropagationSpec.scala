package graft

import graft.operators.{ConnectedComponents, LabelPropagation}

/** [[graft.operators.LabelPropagation]] — the synchronous fixed-round
  * contract: the distributed loop must equal a driver-side replay of
  * the same majority-vote recurrence EXACTLY (that replay is what the
  * q117 DuckDB oracle unrolls), stay deterministic under edge order
  * and repartitioning, and actually separate dense communities a
  * single bridge edge would fuse under connected components.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the synchronous recurrence: per round each
    * vertex takes the most frequent neighbor label, ties to the
    * minimum label. Edges must be symmetric, like the operator input.
    */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nbrs = edges.groupBy(_._2).view
      .mapValues(_.map(_._1)).toMap // dst -> incoming srcs
    var lbl = nbrs.keys.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      lbl = nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(lbl).view.mapValues(_.size).toMap
        val bestC = counts.values.max
        v -> counts.collect { case (l, c) if c == bestC => l }.min
      }
    }
    lbl
  }

  private def sym(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  private def runOp(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("two 4-cliques joined by one bridge: LPA keeps two communities " +
    "where CC fuses them into one component") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val bridged = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L))
    val edges = sym(bridged)
    val lpa = runOp(edges, 3)
    assert(lpa.values.toSet.size == 2, s"expected 2 communities: $lpa")
    assert(Set(1L, 2L, 3L, 4L).map(lpa) == Set(1L))
    assert(Set(10L, 11L, 12L, 13L).map(lpa) == Set(10L))
    val cc = ConnectedComponents
      .run(bridged.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1) // the bridge fuses everything
  }

  test("distributed LPA equals the driver replay on assorted topologies " +
    "and is invariant to edge order and partitioning") {
    val path = sym((1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq)
    val star = sym((2L to 9L).map(i => (1L, i)))
    val twoTri = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L), (3L, 7L)))
    val cases = Seq(("path", path), ("star", star), ("twoTri", twoTri))
    cases.foreach { case (name, edges) =>
      (1 to 3).foreach { iters =>
        assert(runOp(edges, iters) == replay(edges, iters),
          s"$name iters=$iters")
      }
      val jumbled = new scala.util.Random(13).shuffle(edges.toVector)
      val repart = jumbled.toDF("src", "dst").repartition(7)
      val again = LabelPropagation.run(repart, 3)
        .as[(Long, Long)].collect().toMap
      assert(again == replay(edges, 3), s"$name under shuffle/repartition")
    }
  }

  test("ring of 12 bridged 5-cliques: LPA recovers every clique as its " +
    "own community; CC sees one blob") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val k = 12; val sz = 5
    val cliques = (0 until k).map(c =>
      ((c * sz + 1).toLong to ((c + 1) * sz).toLong).toSeq)
    val bridges = (0 until k).map { c =>
      (cliques(c).last, cliques((c + 1) % k).head) // one edge to the next
    }
    val edges = sym(cliques.flatMap(clique) ++ bridges)
    val lpa = runOp(edges, 3)
    // every clique collapses to one label, and no two cliques share one
    val labelsPerClique = cliques.map(_.map(lpa).toSet)
    assert(labelsPerClique.forall(_.size == 1),
      s"clique not uniform: $labelsPerClique")
    assert(labelsPerClique.flatten.toSet.size == k,
      s"cliques merged: ${labelsPerClique.flatten.toSet.size} of $k labels")
    val cc = ConnectedComponents
      .run(edges.filter(e => e._1 < e._2).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1) // the ring is one component
  }

  test("weighted vote: one high-similarity edge outvotes several " +
    "minimum-weight collision edges; weight 1 degenerates to unweighted") {
    import graft.operators.LabelPropagation
    // vertex 5: two weight-1 edges into {1,2} vs one weight-10 edge to 9
    val base = Seq((1L, 5L, 1L), (2L, 5L, 1L), (9L, 5L, 10L), (1L, 2L, 1L))
    val wEdges = (base ++ base.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "weight")
    val w1 = LabelPropagation.runWeighted(wEdges, 1)
      .as[(Long, Long)].collect().toMap
    assert(w1(5L) == 9L, s"heavy edge should win the vote: $w1")
    // unweighted: three tied single votes -> min label 1
    val u1 = LabelPropagation.run(
        wEdges.select($"src", $"dst"), 1)
      .as[(Long, Long)].collect().toMap
    assert(u1(5L) == 1L)
    // weight-1 weighted run IS the unweighted run
    val allOnes = LabelPropagation.runWeighted(
        wEdges.withColumn("weight", org.apache.spark.sql.functions.lit(1L)), 3)
      .as[(Long, Long)].collect().toMap
    val plain = LabelPropagation.run(wEdges.select($"src", $"dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(allOnes == plain)
  }

  test("LPA equals the replay on seeded random graphs (property sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 12 + rnd.nextInt(8)
      val base = (for {
        a <- 1L to n.toLong
        b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      if (base.nonEmpty) {
        val edges = sym(base)
        assert(runOp(edges, 3) == replay(edges, 3), s"trial $trial n=$n")
      }
    }
  }
}
