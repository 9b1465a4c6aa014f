package graft

import graft.operators.KCore

/** [[graft.operators.KCore]] — the fixed-round synchronous-peel
  * contract: the distributed loop must equal a driver-side replay of
  * the same peel EXACTLY (that replay is what the q131 DuckDB oracle
  * unrolls), converge to the true k-core when rounds suffice, and
  * assign peel rounds matching the onion decomposition on known
  * topologies.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side synchronous peel: returns (degree0, peelRound) per
    * vertex, peelRound None = survived all rounds.
    */
  private def replay(edges: Seq[(Long, Long)], k: Int,
                     rounds: Int): Map[Long, (Long, Option[Long])] = {
    val deg0 = edges.groupBy(_._2).map { case (v, es) => v -> es.size.toLong }
    var alive = deg0.keySet
    var peeled = Map.empty[Long, Long]
    (1 to rounds).foreach { i =>
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._2).map { case (v, es) => v -> es.size }
      val survivors = alive.filter(v => deg.getOrElse(v, 0) >= k)
      peeled ++= (alive -- survivors).map(_ -> i.toLong)
      alive = survivors
    }
    deg0.map { case (v, d) => v -> (d, peeled.get(v)) }
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap(p => Seq(p, p.swap))

  private def run(es: Seq[(Long, Long)], k: Int,
                  rounds: Int): Map[Long, (Long, Option[Long])] =
    KCore.peel(es.toDF("src", "dst"), k, rounds)
      .select($"id", $"degree", $"peel_round")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (v, d, p) => v -> (d, p) }.toMap

  test("distributed peel equals the driver-side synchronous replay") {
    // triangle with a 2-chain tail + a 4-star + an isolated edge:
    // mixed onion depths, multi-round cascade (tail end → tail → star)
    val es = undirected((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
    val got = run(es, k = 2, rounds = 4)
    assert(got == replay(es, 2, 4))
    // topology facts: the triangle IS the 2-core; the chain peels
    // outside-in (5 in round 1, 4 in round 2); star leaves round 1,
    // then the hub (20/21 likewise)
    assert(got(1L)._2.isEmpty && got(2L)._2.isEmpty && got(3L)._2.isEmpty)
    assert(got(5L)._2.contains(1L) && got(4L)._2.contains(2L))
    assert(got(11L)._2.contains(1L) && got(10L)._2.contains(2L))
  }

  test("a long chain peels exactly rounds-deep — fixed rounds bound onion depth") {
    // path 1-2-...-8: true 2-core is empty, but each round only
    // removes the current endpoints, so after R rounds exactly the
    // outer R layers are gone
    val es = undirected((1L to 7L).map(i => (i, i + 1)): _*)
    val got = run(es, k = 2, rounds = 3)
    assert(got == replay(es, 2, 3))
    assert(got(1L)._2.contains(1L) && got(8L)._2.contains(1L))
    assert(got(2L)._2.contains(2L) && got(7L)._2.contains(2L))
    assert(got(3L)._2.contains(3L) && got(6L)._2.contains(3L))
    // the middle survives the bounded peel (in_core = "survived R rounds")
    assert(got(4L)._2.isEmpty && got(5L)._2.isEmpty)
  }

  test("seeded random graphs: distributed equals replay for k=2 and k=3") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 30
      val pairs = (1 to 60).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val es = undirected(pairs: _*)
      Seq(2, 3).foreach { k =>
        assert(run(es, k, rounds = 4) == replay(es, k, 4), s"k=$k es=$pairs")
      }
    }
  }
}
