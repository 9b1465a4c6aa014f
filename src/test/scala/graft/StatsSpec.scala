package graft

import graft.jobs.StatsCollect
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dailyCounts covers every entity and sums to the table counts") {
    val stats = StatsCollect.dailyCounts(spark, sf)
    val byEntity = stats.groupBy("entity").agg(sum("n_rows").as("total"))
      .as[(String, Long)].collect().toMap
    assert(byEntity.keySet == Set("events", "orders", "lineitem"))
    assert(byEntity("events") ==
      Tables.events(spark, sf).filter($"ts".isNotNull).count())
    assert(byEntity("orders") == Tables.orders(spark, sf).count())
  }

  test("q162 column profile: counts, distincts, and min/max match direct " +
    "aggregates") {
    val got = graft.queries.RelationalQueries.q162(spark, sf)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    val o = Tables.orders(spark, sf)
    val n = o.count()
    assert(got.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    got.values.foreach { r => assert(r._2 == n && r._3 == 0L) }
    assert(got("o_orderkey")._4 == n) // the key is unique
    assert(got("o_custkey")._4 ==
      o.select(countDistinct($"o_custkey")).as[Long].head())
    val (mn, mx) = o.agg(min($"o_totalprice"), max($"o_totalprice"))
      .as[(Double, Double)].head()
    // native-type min/max canonicalized at the end — NOT lexicographic
    assert(got("o_totalprice")._5 == mn.toString)
    assert(got("o_totalprice")._6 == mx.toString)
  }

  test("q164 MAD outliers: matches a brute-force median/MAD fence per type") {
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * 0.5
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt) // the (n-1)·p interpolation
    }
    val evs = Tables.events(spark, sf)
      .filter($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val got = graft.queries.TimeseriesQueries.q164(spark, sf)
      .as[(String, Long, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    val groups = evs.groupBy(_._1)
    assert(got.keySet == groups.keySet)
    for ((t, g) <- groups) {
      val vs = g.map(_._2)
      val med = medianOf(vs)
      val ads = vs.map(v => math.abs(v - med))
      val mad = medianOf(ads)
      assert(got(t)._2 == vs.length)
      assert(math.abs(got(t)._3 - med) < 1e-6)
      assert(got(t)._5 == ads.count(_ > 3 * 1.4826 * mad))
    }
  }

  test("q167 bootstrap: replica means, order-statistic CI, and point " +
    "estimate all match a JVM-side replay of the hash weights") {
    import graft.queries.RelationalQueries.{BootB, BootLoRank, BootHiRank}
    val ltv = {
      val orders = Tables.orders(spark, sf)
        .select($"o_custkey", expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("cents")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
        .as[(Long, String)].collect()
        .map { case (k, seg) => (seg, k, orders.getOrElse(k, 0L)) }
    }
    val exp = ltv.groupBy(_._1).map { case (seg, cs) =>
      val means = (0 until BootB).map { b =>
        val ws = cs.map { case (_, k, cents) =>
          val u = (graft.functions.DedupFunctions.md5Hash32Jvm(s"bb-$k-$b")
            + 1L).toDouble / 4294967296.0
          val w4 = BigDecimal(-math.log(u) * 10000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          (w4, w4 * cents)
        }
        (b.toLong, ws.map(_._2).sum / ws.map(_._1).sum)
      }
      val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
      seg -> ((cs.length.toLong, cs.map(_._3).sum / cs.length,
        sorted(BootLoRank - 1), sorted(BootHiRank - 1)))
    }
    val got = graft.queries.RelationalQueries.q167(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == exp)
    got.values.foreach { case (_, mean, lo, hi) =>
      assert(lo <= hi && lo <= mean && mean <= hi)
    }
  }

  test("q172/q173/q174 invariants: kernel sums dominate own counts, " +
    "peaks dominate the uniform rate, shortlists are ranked and bounded") {
    val grid = graft.queries.TimeseriesQueries.q172(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(grid.length == graft.queries.TimeseriesQueries.GridTopK)
    grid.foreach { case (_, _, own, sm) => assert(sm >= own && own >= 0) }
    assert(grid.map(_._4).toSeq == grid.map(_._4).sortBy(-_).toSeq)

    val prof = graft.queries.TimeseriesQueries.q173(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    prof.foreach { case (_, total, hours, how, peak, conc) =>
      assert(how >= 0 && how < 168 && hours <= 168)
      assert(peak * hours >= total)    // peak >= average over active hours
      assert(conc >= 1000000 - 168)    // >= the uniform rate (div floor)
    }

    val rec = graft.queries.RelationalQueries.q174(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    rec.groupBy(_._1).foreach { case (part, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      assert(sorted.length <= graft.queries.RelationalQueries.AlsoBoughtK)
      // ranks respect (count desc, partner asc) and never self-recommend
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
      assert(rows.forall(_._3 != part))
    }
  }

  test("q188 CUSUM: the stationary lake never alarms; a planted 5x rate " +
    "jump fires on the jump day itself, control series stays quiet") {
    val flat = graft.queries.TimeseriesQueries.q188(spark, sf)
      .as[(String, Long, Long, Long, Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(flat.nonEmpty && flat.forall(r => !r._6 && r._5.isEmpty))

    def day(d: Int): java.sql.Timestamp =
      new java.sql.Timestamp(d.toLong * 86400000L + 43200000L)
    val planted =
      (for (d <- 0 until 21; i <- 0 until (if (d < 14) 10 else 50))
        yield ("jumpy", day(d), i)) ++
      (for (d <- 0 until 21; i <- 0 until 10) yield ("flat", day(d), i))
    val got = graft.queries.TimeseriesQueries.cusumOf(
      planted.toDF("event_type", "ts", "i"))
      .as[(String, Long, Long, Long, Option[java.sql.Timestamp], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(!got("flat")._6 && got("flat")._5.isEmpty)
    assert(got("jumpy")._6)
    // k=1000, slack 100: day 14 accrues 50*100-1100=3900 over a prefix
    // min of -1400 -> S=3900 > 3*k=3000 — the jump day itself alarms
    assert(got("jumpy")._5.map(_.getTime) ==
      Some(14L * 86400000L), s"got ${got("jumpy")._5}")
  }

  test("freshness gate passes near the data epoch and fails far after") {
    val (fresh, newest) = StatsCollect.validateFreshness(
      spark, sf, "2024-02-01 00:00:00", maxAgeHours = 72)
    assert(fresh && newest != null)
    val (stale, _) = StatsCollect.validateFreshness(
      spark, sf, "2024-06-01 00:00:00", maxAgeHours = 1)
    assert(!stale)
  }
}
