package graft

import graft.queries.SamplingQueries

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hash sample is deterministic and near the target rate") {
    val a = SamplingQueries.q43(spark, sf)
    val b = SamplingQueries.q43(spark, sf)
    assert(a.collect().toSet == b.collect().toSet) // reproducible
    val total = Tables.lineitem(spark, sf).count().toDouble
    val rate = a.count() / total
    assert(rate > 0.07 && rate < 0.13) // ~10%
  }

  test("heavy hitters emits at most 3 ranked sources per language") {
    val rows = SamplingQueries.q44(spark, sf)
      .select($"lang", $"rank").as[(String, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length))
    }
  }

  test("approx distinct stays within the configured HLL error") {
    val rows = SamplingQueries.q46Detail(spark, sf)
      .select($"rel_err").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(_ < 0.05)) // rsd 0.02, headroom 2.5x
  }
}
