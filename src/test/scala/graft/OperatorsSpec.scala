package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.{ArgMinMax, BandJoin, UpdateInPlace}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- BandJoin (J7, §7.4) ----

  private val signups = Seq(
    (1L, 10L, ts("2024-01-01 12:00:00")), // nearest purchase: 101 (+30m)
    (2L, 10L, ts("2024-01-02 12:00:00")), // boundary: exactly +12h excluded (open band)
    (3L, 11L, ts("2024-01-03 12:00:00")), // tie ±1h → smaller id wins
    (4L, 12L, ts("2024-01-04 12:00:00"))  // only candidate is 12h1s away → no match
  ).toDF("signup_id", "user_id", "ts")

  private val purchases = Seq(
    (101L, 10L, ts("2024-01-01 12:30:00")),
    (102L, 10L, ts("2024-01-01 10:00:00")),
    (103L, 10L, ts("2024-01-03 00:00:00")), // exactly +12h from signup 2
    (104L, 11L, ts("2024-01-03 11:00:00")),
    (105L, 11L, ts("2024-01-03 13:00:00")),
    (106L, 12L, ts("2024-01-05 00:00:01"))
  ).toDF("purchase_id", "user_id", "ts")

  test("BandJoin picks the nearest match within the band") {
    val out = BandJoin.nearestWithin(signups, purchases,
      Seq("user_id"), "ts", "ts", 12 * 3600, "signup_id", "purchase_id")
      .select($"signup_id", $"purchase_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 101L)
  }

  test("BandJoin band is open: exact-boundary and beyond-band rows drop out") {
    // reference semantics: > start - n AND < start + n (strict), so a
    // row exactly AT ±tolerance is not a match
    val out = BandJoin.nearestWithin(signups, purchases,
      Seq("user_id"), "ts", "ts", 12 * 3600, "signup_id", "purchase_id")
      .select($"signup_id", $"purchase_id").as[(Long, Long)].collect().toMap
    assert(!out.contains(2L))    // exactly 12h: excluded
    assert(!out.contains(4L))    // 12h + 1s: excluded
  }

  test("BandJoin ties break on the right-side id (deterministic)") {
    val out = BandJoin.nearestWithin(signups, purchases,
      Seq("user_id"), "ts", "ts", 12 * 3600, "signup_id", "purchase_id")
      .select($"signup_id", $"purchase_id").as[(Long, Long)].collect().toMap
    assert(out(3L) == 104L)      // 104 and 105 both 1h away → min id
  }

  // ---- AsOfJoin ----

  test("asof join: latest at-or-before per key, equal-ts inclusive, null before first") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")), // between rights → latest before
      (2L, 7L, ts("2024-01-01 09:30:00")), // exactly at a right ts → included
      (3L, 7L, ts("2024-01-01 08:00:00")), // before any right → null
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other key: its own timeline
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 7L, ts("2024-01-01 09:00:00"), 10.0),
      (102L, 7L, ts("2024-01-01 09:30:00"), 20.0),
      (103L, 7L, ts("2024-01-01 09:30:00"), 30.0), // ts tie → latest id wins
      (104L, 8L, ts("2024-01-01 09:59:00"), 40.0)
    ).toDF("rid", "k", "ts", "v")
    val out = graft.operators.AsOfJoin.latestAtOrBefore(
      left, right, "k", "ts", "ts", "v", "rid")
      .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(30.0))
    assert(out(2L).contains(30.0))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(40.0))
  }

  // ---- ArgMinMax (A5/O1) ----

  test("firstLastBy drops null-ordered rows and is tie-deterministic") {
    val df = Seq(
      (10L, Some(ts("2024-01-01 00:00:00")), 1L),
      (10L, Some(ts("2024-01-03 00:00:00")), 2L),
      (10L, None, 3L),                              // NULLS LAST: never wins
      (11L, Some(ts("2024-01-02 00:00:00")), 4L),
      (11L, Some(ts("2024-01-02 00:00:00")), 5L)    // tie → id order decides
    ).toDF("ride_id", "t", "id")
    val out = ArgMinMax.firstLastBy(df, Seq("ride_id"), "t", "id", Seq.empty)
      .select($"ride_id", $"_first.id", $"_last.id", $"n_rows")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(10L) == ((10L, 1L, 2L, 2L))) // null row excluded from count too
    assert(out(11L) == ((11L, 4L, 5L, 2L)))
  }

  // ---- ConnectedComponents ----

  test("connected components: chains, cliques, and singleton pairs converge to min label") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), // chain {1,2,3,4} → 1
      (10L, 11L), (11L, 10L),       // duplicate/reversed pair {10,11} → 10
      (20L, 21L), (21L, 22L), (20L, 22L) // triangle {20,21,22} → 20
    ).toDF("src", "dst")
    val comp = graft.operators.ConnectedComponents.run(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: star-contraction variant matches label propagation") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 30
      // self-loops INCLUDED: both variants must emit a (v, v) label for
      // a vertex whose only edge is (v, v)
      val edges = (1 to 40)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("a", "b")
      val byProp = graft.operators.ConnectedComponents.run(edges, "a", "b")
        .as[(Long, Long)].collect().toSet
      val byStar = graft.operators.ConnectedComponents.runAlternating(edges, "a", "b")
        .as[(Long, Long)].collect().toSet
      assert(byProp == byStar)
    }
  }

  test("connected components: star contraction handles a giant-star component") {
    // hub 0 with 200 leaves plus a chain hanging off one leaf — the
    // skew shape the alternating algorithm exists for
    val star = ((1 to 200).map(i => (0L, i.toLong)) ++
      (200 to 210).map(i => (i.toLong, i + 1L))).toDF("a", "b")
    val labels = graft.operators.ConnectedComponents.runAlternating(star, "a", "b")
      .as[(Long, Long)].collect()
    assert(labels.length == 212 && labels.forall(_._2 == 0L))
  }

  // ---- UpdateInPlace (J12 → §7.3) ----

  test("UpdateInPlace coalesces new over old and preserves row count") {
    val target = Seq(
      (1L, Some(10L), "a"),
      (2L, None, "b"),
      (3L, Some(30L), "c")
    ).toDF("id", "v", "tag")
    val enrichment = Seq(
      (2L, 20L), (3L, 31L)
    ).toDF("id", "new_v")
    val out = UpdateInPlace(target, enrichment, Seq("id"))
    assert(out.count() == 3)
    val m = out.select($"id", $"v").as[(Long, Option[Long])].collect().toMap
    assert(m(1L).contains(10L)) // unmatched keeps old value
    assert(m(2L).contains(20L)) // null filled
    assert(m(3L).contains(31L)) // overwritten
    assert(out.columns.toSet == Set("id", "v", "tag"))
  }

  test("TopKPerGroup matches the window-sort recipe and bounds its buffer") {
    import graft.operators.TopKPerGroup
    // skewed groups: group "a" has 1000 rows, "b" has 2, "c" has k ties
    val rows = (1 to 1000).map(i => ("a", i.toDouble % 97, i.toLong)) ++
      Seq(("b", 5.0, 1L), ("b", 7.0, 2L)) ++
      (1 to 5).map(i => ("c", 42.0, i.toLong))
    val ds = rows.toDF("g", "score", "id").as[(String, Double, Long)]
    val agg = TopKPerGroup.topK[(Double, Long)](
      3, Ordering.by { case (s, id) => (-s, id) })
    val got = ds.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (g, top) => top.map { case (s, id) => (g, s, id) } }
      .collect().toSet
    // oracle: full sort per group, take 3, same total order
    val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }
        .take(3).map { case (s, id) => (g, s, id) }
    }.toSet
    assert(got == exp)
    // the aggregator's reduce path never holds more than k elements
    val a = TopKPerGroup.topK[(Double, Long)](2, Ordering.by(identity))
    val buf = (1 to 100).foldLeft(List.empty[(Double, Long)])(
      (b, i) => a.reduce(b, (i.toDouble, i.toLong)))
    assert(buf == List((1.0, 1L), (2.0, 2L)))
    assert(a.merge(List((1.0, 1L), (3.0, 3L)), List((2.0, 2L), (4.0, 4L)))
      == List((1.0, 1L), (2.0, 2L)))
  }

  // ---- SequencePacking (q57 / CorpusPrepare scale shape) ----

  test("sequence packing matches the per-key window cumsum bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      (i.toLong, s"src${rnd.nextInt(4)}", (rnd.nextInt(900) + 1).toLong)
    }.toDF("doc_id", "source", "n_tokens")
    val got = graft.operators.SequencePacking
      .withBins(df, Seq("source"), "doc_id", "n_tokens", 1000L, numPartitions = 8)
      .select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val exp = df
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin_id",
        floor(($"cum_tokens" - $"n_tokens") / 1000L).cast("long"))
      .select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == exp)
  }

  test("sequence packing: one hot key spans every partition, no single-task key") {
    // 2000 rows, ONE source — the shape where the window form collapses
    // to one task; the two-pass form must keep all 8 partitions live
    val df = (1 to 2000).map(i => (i.toLong, "web", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val out = graft.operators.SequencePacking
      .withBins(df, Seq("source"), "doc_id", "n_tokens", 100L, numPartitions = 8)
    assert(out.rdd.getNumPartitions == 8)
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.max < 2000 && sizes.count(_ > 0) >= 4)
    val cums = out.select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(cums(1L) == ((10L, 0L)))
    assert(cums(2000L) == ((20000L, 199L)))
    assert(cums(11L) == ((110L, 1L))) // crosses the 100-token budget
  }

  test("sequence packing survives a downstream coalesce(1) — hot key " +
    "spanning every partition, consumer task ids aliased") {
    // Regression for the r04 q57 failure: pass-2 offsets were keyed by
    // TaskContext.getPartitionId(), so a consumer coalesce (Verify's
    // exact shape) evaluated every parent split in one task (pid 0),
    // missed every broadcast offset, and restarted cum_tokens at each
    // range boundary. The offsets must be keyed by the materialized
    // RDD's own split index, immune to the consumer's physical plan.
    val rnd = new scala.util.Random(11)
    val df = (1 to 600).map { i =>
      (i.toLong, s"src${rnd.nextInt(3)}", (rnd.nextInt(90) + 1).toLong)
    }.toDF("doc_id", "source", "n_tokens")
    val packed = graft.operators.SequencePacking
      .withBins(df, Seq("source"), "doc_id", "n_tokens", 500L,
        numPartitions = 8)
    val got = packed
      .coalesce(1) // one task evaluates all 8 parent splits
      .select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val exp = df
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin_id",
        floor(($"cum_tokens" - $"n_tokens") / 500L).cast("long"))
      .select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == exp)
  }

  test("sequence packing: composite keys restart bins per (source, split)") {
    val df = Seq(
      (1L, "a", "train", 60L), (2L, "a", "train", 60L),
      (3L, "a", "val", 60L), (4L, "b", "train", 60L)
    ).toDF("doc_id", "source", "split", "n_tokens")
    val got = graft.operators.SequencePacking
      .withBins(df, Seq("source", "split"), "doc_id", "n_tokens", 100L,
        numPartitions = 3)
      .select($"doc_id", $"cum_tokens", $"bin_id")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == Map(
      1L -> ((60L, 0L)), 2L -> ((120L, 0L)),
      3L -> ((60L, 0L)), 4L -> ((60L, 0L))))
  }

  test("overwritePartitions only rewrites touched partitions") {
    val dir = Files.createTempDirectory("graft_dyn_overwrite").toString
    val v1 = Seq((1L, "2024-01-01", 100L), (2L, "2024-01-02", 200L))
      .toDF("id", "day", "v")
    UpdateInPlace.overwritePartitions(v1, dir, Seq("day"))
    // second write touches only day=2024-01-02
    val v2 = Seq((2L, "2024-01-02", 999L)).toDF("id", "day", "v")
    UpdateInPlace.overwritePartitions(v2, dir, Seq("day"))
    val back = spark.read.parquet(dir)
      .select($"id", $"day", $"v").as[(Long, String, Long)].collect().toSet
    assert(back == Set((1L, "2024-01-01", 100L), (2L, "2024-01-02", 999L)))
  }

  test("TriangleCount: shared-edge triangles counted once each, chains " +
    "and isolated edges count zero") {
    import graft.operators.TriangleCount
    // triangles (1,2,3) and (1,2,4) share edge (1,2); 5-6-7 is a chain
    // (6 has two neighbours but NO closing edge); (8,9) is isolated
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (5L, 6L), (6L, 7L), (8L, 9L)).toDF("a", "b")
    val got = TriangleCount.perNode(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 0L))
  }

  test("q110 funnel: strict-after step progression, same-micros ties do " +
    "not advance, pre-step noise ignored, greedy earliest times") {
    val dir = Files.createTempDirectory("graft_funnel").toString
    def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")
    Seq(
      // user 1: click at the SAME micros as the view — not "after", so
      // the funnel stalls at step 1 even though a purchase follows
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(0)),
      (3L, 1L, "purchase", ts(5)),
      // user 2: clean 3-step funnel
      (4L, 2L, "view", ts(0)), (5L, 2L, "click", ts(1)),
      (6L, 2L, "purchase", ts(2)),
      // user 3: a click BEFORE any view is noise; the later pair counts,
      // and the earliest qualifying times are reported
      (7L, 3L, "click", ts(0)), (8L, 3L, "view", ts(1)),
      (9L, 3L, "click", ts(2)), (10L, 3L, "click", ts(3)),
      (11L, 3L, "purchase", ts(4)),
      // user 4: non-funnel types alone -> excluded entirely
      (12L, 4L, "error", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    def us(sec: Int) = Some(ts(sec).getTime * 1000L)
    val got = graft.queries.TimeseriesQueries.q110(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, 1L, us(0), None, None)))
    assert(got(2L) == ((2L, 3L, us(0), us(1), us(2))))
    assert(got(3L) == ((3L, 3L, us(1), us(2), us(4))))
  }

  test("q163 skyline: exactly the non-dominated users (brute force), " +
    "salt pruning lossless") {
    val sfd = "/root/testdata/sf0.001"
    val users = Tables.events(spark, sfd).filter($"user_id".isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        coalesce(expr("sum(CAST(round(value * 100) AS BIGINT))"), lit(0L))
          .as("y"))
      .as[(Long, Long, Long)].collect()
    val sky = users.filter { case (_, x, y) =>
      !users.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.map(_._1).toSet
    val got = graft.queries.TimeseriesQueries.q163(spark, sfd)
      .select("user_id").as[Long].collect().toSet
    assert(got == sky && got.nonEmpty)
  }

  test("q165 attribution: equals a per-purchase brute-force latest-touch " +
    "scan (window honored, ties on event_id, absent touch -> none)") {
    val sfd = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sfd)
      .filter($"ts".isNotNull && $"user_id".isNotNull &&
        $"event_type".isin("click", "view", "purchase"))
      .select($"user_id", expr("unix_micros(ts)").as("tus"), $"event_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Option[Double])].collect()
    val credit = scala.collection.mutable.Map[String, (Long, Long)]()
    for ((_, us) <- evs.groupBy(_._1)) {
      val sorted = us.sortBy(e => (e._2, e._3))
      for (i <- sorted.indices if sorted(i)._4 == "purchase") {
        val p = sorted(i)
        val t = sorted.take(i).reverse.find(_._4 != "purchase") match {
          case Some(tc) if tc._2 >= p._2 -
            graft.queries.TimeseriesQueries.AttributionWindowUs => tc._4
          case _ => "none"
        }
        val cents = p._5.map(v => math.round(v * 100)).getOrElse(0L)
        val (n, c) = credit.getOrElse(t, (0L, 0L))
        credit(t) = (n + 1, c + cents)
      }
    }
    val got = graft.queries.TimeseriesQueries.q165(spark, sfd)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, math.round(r._3 * 100)))).toMap
    assert(got == credit.toMap && got.contains("none"))
  }
}
