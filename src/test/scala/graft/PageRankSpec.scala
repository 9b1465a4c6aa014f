package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** [[graft.operators.PageRank]] — the integer fixed-point contract:
  * the distributed loop must equal a driver-side replay of the same
  * formula EXACTLY (that replay is what the q104 DuckDB oracle runs),
  * stay deterministic under any repartitioning (the property floating
  * PageRank cannot offer), and behave sanely on known topologies.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence. */
  private def replay(edges: Seq[(Long, Long)], iters: Int,
                     scale: Long): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport =
      ((scale / n) * (PageRank.DampDen - PageRank.DampNum)) / PageRank.DampDen
    var r = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val mass = edges
        .map { case (s, d) =>
          d -> ((r(s) * PageRank.DampNum) / PageRank.DampDen) / out(s)
        }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (teleport + mass.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap(p => Seq(p, p.swap))

  test("distributed ranks equal the driver-side integer replay exactly") {
    // two components: a triangle+tail and a 4-star — mixed degrees
    val es = undirected((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L))
    val got = PageRank.run(es.toDF("src", "dst"), iters = 5)
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    assert(got == replay(es, 5, PageRank.DefaultScale))
  }

  test("ranks are bit-identical under adversarial repartitioning") {
    val es = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (1L, 3L), (2L, 5L))
    val a = PageRank.run(es.toDF("src", "dst"), iters = 5)
      .select($"id", $"rank").as[(Long, Long)].collect().toSet
    val b = PageRank.run(es.toDF("src", "dst").repartition(17), iters = 5)
      .select($"id", $"rank").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("star center outranks leaves; mass is conserved within floor leak") {
    val es = undirected((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val r = PageRank.run(es.toDF("src", "dst"), iters = 5)
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    val leaves = (2L to 6L).map(r)
    assert(leaves.forall(_ < r(1L)))
    assert(leaves.toSet.size == 1) // symmetric leaves rank identically
    // exact floor-leak budget, no slack: init floors scale/N (< N units
    // across nodes); per iteration each node's teleport floors twice
    // (scale/N once at setup, the damp-factor division — < 2N), each
    // source's damp floors once (< N) and its out-division loses
    // < outdeg across its edges (< E total) → init + iters·(3N + E).
    // Measured leak on this star is 36 of the 146-unit budget.
    val total = r.values.sum
    val n = 6L
    val leakBound = n + 5L * (3 * n + es.size)
    assert(total <= PageRank.DefaultScale)
    assert(total >= PageRank.DefaultScale - leakBound,
      s"leak ${PageRank.DefaultScale - total} exceeds bound $leakBound")
  }

  test("directed sink leaks its damped mass (documented variant)") {
    // 1 -> 2: node 2 has no out-edges; its damped share vanishes
    val es = Seq((1L, 2L))
    val got = PageRank.run(es.toDF("src", "dst"), iters = 3)
      .select($"id", $"rank", $"outdeg").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(2L)._2 == 0L) // sink outdeg recorded as 0
    assert(got == replay(es, 3, PageRank.DefaultScale).map {
      case (id, rk) => id -> ((rk, if (id == 1L) 1L else 0L))
    })
  }
}
