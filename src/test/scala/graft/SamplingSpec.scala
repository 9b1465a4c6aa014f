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

  test("KMV estimate is accurate on a 50k-value deterministic universe " +
    "and exact below k") {
    import graft.functions.DedupFunctions
    import graft.operators.KmvSketch
    val k = SamplingQueries.KmvK
    // md5 hashes are fixed, so this is a deterministic accuracy pin,
    // not a statistical one: KMV's expected rel-err at k=256 is
    // ~1/sqrt(k-2) ≈ 6%; 15% is ~2.4 sigma of fixed headroom
    val hashes = (1 to 50000).map(i => DedupFunctions.md5Hash32Jvm(s"w$i"))
    val distinct = hashes.distinct
    val mins = distinct.sorted.take(k).toList
    val est = KmvSketch.estimate(mins, k, SamplingQueries.KmvSpace)
    val err = math.abs(est.toDouble - distinct.size) / distinct.size
    assert(err < 0.15, s"KMV err $err (est $est vs ${distinct.size})")
    // below k the sketch IS the exact set
    val small = (1 to 100).map(i => DedupFunctions.md5Hash32Jvm(s"s$i"))
      .distinct.sorted.toList
    assert(KmvSketch.estimate(small, k, SamplingQueries.KmvSpace) ==
      small.length.toLong)
    // and the q114 row at sf0.001 carries a sub-15% error end-to-end
    val rows = SamplingQueries.q114(spark, sf)
      .select($"rel_err").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(_ < 0.15))
  }

  test("CMS grid equals direct bucket counting, split-merge invariant, " +
    "and estimates are one-sided (est >= exact, exact when collision-free)") {
    import graft.operators.CountMinSketch
    import graft.streaming.StreamingSketch.bucketJvm
    val d = SamplingQueries.CmsDepth
    val w = SamplingQueries.CmsWidth
    def enc1 = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()
    def enc2 = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[Long]]()
    // deterministic zipf-ish multiset: token t_i appears ~1000/i times
    val toks = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"tok$i"))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // direct counting = the sketch definition applied naively
    val direct = new Array[Long](d * w)
    toks.foreach { t =>
      (0 until d).foreach(dd => direct(dd * w + bucketJvm(dd, t)) += 1L)
    }
    // aggregator fold, split into three uneven partial grids + merge
    val agg = CountMinSketch.aggregator(d, w, enc1, enc2)
    val parts = Seq(toks.take(17), toks.slice(17, 18), toks.drop(18))
    val merged = parts
      .map(_.foldLeft(agg.zero) { (g, t) =>
        agg.reduce(g, (0 until d).map(bucketJvm(_, t)))
      })
      .reduceLeft(agg.merge)
    assert(agg.finish(merged) == direct.toSeq)
    // weighted fold over (DISTINCT token, count) == per-occurrence fold
    // — the multiset-additivity identity the r17 q116 counts-driven
    // grid rides (grid cells are sums)
    val wAgg = CountMinSketch.weightedAggregator(d, w, enc1, enc2)
    val weighted = exact.toSeq.sortBy(_._1)
      .foldLeft(wAgg.zero) { case (g, (t, n)) =>
        wAgg.reduce(g, ((0 until d).map(bucketJvm(_, t)), n))
      }
    assert(wAgg.finish(weighted) == direct.toSeq)
    // one-sided error, and equality whenever some depth row is
    // collision-free for the token
    exact.foreach { case (t, c) =>
      val est = CountMinSketch.estimate(direct.toSeq, w,
        (0 until d).map(bucketJvm(_, t)))
      assert(est >= c, s"CMS under-counted $t: $est < $c")
    }
    // the q116 rows at sf0.001: ranks 1..k, overcount >= 0 everywhere
    val rows = SamplingQueries.q116(spark, sf)
      .select($"rank", $"overcount").as[(Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      (1L to math.min(SamplingQueries.CmsTopK, rows.length)))
    assert(rows.forall(_._2 >= 0L))
  }
}
