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
