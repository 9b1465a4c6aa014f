package graft

import graft.operators.Hits

/** [[graft.operators.Hits]] — the integer fixed-point contract: the
  * distributed loop must equal a driver-side replay of the same
  * recurrence exactly (the q141 oracle's unrolled SQL), and known
  * topologies must produce their closed-form rankings.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact recurrence: uniform hubs, then
    * per round sum-normalize each side by its max in integer floor
    * arithmetic.
    */
  private def replay(edges: Seq[(Long, Long)],
                     iters: Int): (Map[Long, Long], Map[Long, Long]) = {
    var hubs = edges.map(_._1).distinct.map(_ -> Hits.Scale).toMap
    var auths = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> (v * Hits.Scale) / mx }
    }
    (1 to iters).foreach { _ =>
      auths = norm(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hubs(e._1)).sum
      })
      hubs = norm(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auths(e._2)).sum
      })
    }
    (hubs, auths)
  }

  private def run(es: Seq[(Long, Long)],
                  iters: Int): (Map[Long, Long], Map[Long, Long]) = {
    val rows = Hits.run(es.toDF("src", "dst"), iters)
      .as[(String, Long, Long)].collect()
    (rows.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap,
      rows.filter(_._1 == "auth").map(r => r._2 -> r._3).toMap)
  }

  test("distributed HITS equals the driver-side integer replay exactly") {
    // two buyer tiers: 1 buys everything, 2/3 buy one part each; one
    // part (10) bought by all — asymmetric degrees on both sides
    val es = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (3L, 10L), (3L, 12L))
    Seq(1, 3).foreach { it =>
      assert(run(es, it) == replay(es, it), s"iters=$it")
    }
  }

  test("complete bipartite graph: every score is exactly Scale") {
    val es = for (c <- 1L to 3L; p <- 10L to 13L) yield (c, p)
    val (h, a) = run(es, 3)
    assert(h.values.toSet == Set(Hits.Scale) && h.size == 3)
    assert(a.values.toSet == Set(Hits.Scale) && a.size == 4)
  }

  test("the wide-reaching buyer out-hubs the single-part buyer; " +
    "the universally-bought part out-ranks the niche part") {
    val es = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 10L))
    val (h, a) = run(es, 3)
    assert(h(1L) == Hits.Scale && h(1L) > h(2L))
    assert(a(10L) == Hits.Scale && a(10L) > a(11L))
    // symmetric singles tie
    assert(h(2L) == h(3L) && a(11L) == a(12L))
  }
}
