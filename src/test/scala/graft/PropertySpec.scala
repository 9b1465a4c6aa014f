package graft

import graft.operators.{BandJoin, UpdateInPlace}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the invariants SURVEY.md §5.3 calls out: the
  * update-in-place rewrite must never lose/duplicate rows and must be
  * idempotent; band-join arbitration must be total. Case counts are kept
  * small — every case runs real Spark jobs.
  */
class PropertySpec extends Properties("graft") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val kvGen: Gen[List[(Long, Option[Long])]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 19L), Gen.option(Gen.choose(0L, 99L))))
      .map(_.distinctBy(_._1))

  property("UpdateInPlace preserves count and unmatched rows") =
    Prop.forAll(kvGen, kvGen) { (targetRows, enrichRows) =>
      val target = targetRows.toDF("id", "v")
      val enrichment = enrichRows.toDF("id", "new_v")
      val out = UpdateInPlace(target, enrichment, Seq("id"))
      val got = out.select($"id", $"v").as[(Long, Option[Long])].collect().toMap
      val enrich = enrichRows.toMap
      val expected = targetRows.map { case (k, old) =>
        k -> enrich.get(k).flatten.orElse(old)
      }.toMap
      got == expected && out.count() == targetRows.size.toLong
    }

  property("UpdateInPlace is idempotent") =
    Prop.forAll(kvGen, kvGen) { (targetRows, enrichRows) =>
      val target = targetRows.toDF("id", "v")
      val enrichment = enrichRows.toDF("id", "new_v")
      val once = UpdateInPlace(target, enrichment, Seq("id"))
      val twice = UpdateInPlace(once, enrichment, Seq("id"))
      val a = once.as[(Long, Option[Long])].collect().toSet
      val b = twice.as[(Long, Option[Long])].collect().toSet
      a == b
    }

  private val tsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(10, Gen.zip(Gen.choose(0L, 999L), Gen.choose(0L, 100000L)))
      .map(_.distinctBy(_._1))

  property("BandJoin emits at most one in-band match per left row") =
    Prop.forAll(tsGen, tsGen) { (ls, rs) =>
      val tol = 5000L // seconds
      val left = ls.map { case (id, s) => (id, 1L, new java.sql.Timestamp(s * 1000)) }
        .toDF("lid", "k", "ts")
      val right = rs.map { case (id, s) => (id, 1L, new java.sql.Timestamp(s * 1000)) }
        .toDF("rid", "k", "ts")
      val out = BandJoin.nearestWithin(left, right, Seq("k"), "ts", "ts",
        tol, "lid", "rid")
        .select($"lid", $"rid", $"_diff_us").as[(Long, Long, Long)].collect()
      val perLeft = out.groupBy(_._1).forall(_._2.length == 1)
      val inBand = out.forall(_._3 < tol * 1000000L) // open band (strict)
      // nearest: no right row is strictly closer than the chosen one
      val rightUs = rs.map(_._2 * 1000000L)
      val nearest = out.forall { case (lid, _, diff) =>
        val lt = ls.toMap.apply(lid) * 1000000L
        rightUs.forall(rt => math.abs(rt - lt) >= diff)
      }
      perLeft && inBand && nearest
    }

  private val groupedGen: Gen[List[(String, Double, Long)]] =
    Gen.listOfN(25, Gen.zip(
      Gen.oneOf("a", "b", "c"),
      Gen.choose(0, 9).map(_.toDouble),  // few distinct scores → many ties
      Gen.choose(0L, 1000L)))
      .map(_.distinctBy(_._3))

  property("TopKPerGroup equals sort-take per group for any k") =
    Prop.forAll(groupedGen, Gen.choose(1, 5)) { (rows, k) =>
      val ord = Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, id)
      }
      val agg = graft.operators.TopKPerGroup.topK[(Double, Long)](k, ord)
      val got = rows.toDF("g", "s", "id").as[(String, Double, Long)]
        .groupByKey(_._1).mapValues(r => (r._2, r._3))
        .agg(agg.toColumn.name("top"))
        .collect().map { case (g, top) => g -> top.toList }.toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted(ord).take(k)
      }
      got == expected
    }

  private val memberGen: Gen[List[(Long, Double, Long)]] =
    Gen.listOfN(20, Gen.zip(
      Gen.choose(0L, 999L),
      Gen.choose(0, 5).map(_.toDouble), // few scores → quality ties
      Gen.choose(0L, 3L)))              // few clusters → big clusters
      .map(_.distinctBy(_._1))

  property("survivorSelect picks max quality, min id among ties, one per cluster") =
    Prop.forAll(memberGen) { rows =>
      rows.isEmpty || {
        val got = graft.queries.DedupQueries.survivorSelect(
            rows.toDF("doc_id", "quality", "cluster_id"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
        val expected = rows.groupBy(_._3).view.mapValues { ms =>
          ms.map(m => (-m._2, m._1)).min._2 // max quality, then min id
        }.toMap
        val rightSurvivor = got.forall { case (_, c, surv, _) =>
          surv == expected(c)
        }
        val flags = got.forall { case (id, _, surv, isS) => isS == (id == surv) }
        rightSurvivor && flags && got.length == rows.length
      }
    }

  private val matrixGen: Gen[List[(String, Long)]] =
    Gen.listOfN(24, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 2L)))

  property("sourceDupMatrix totals equal the per-cluster pair closed form") =
    Prop.forAll(matrixGen) { rows =>
      rows.isEmpty || {
        val got = graft.queries.DedupQueries.sourceDupMatrix(
            rows.toDF("source", "cluster_id"))
          .collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
        // every within/cross pair count re-derived by brute force
        val byCluster = rows.zipWithIndex.groupBy(_._1._2)
        val brute = scala.collection.mutable.Map.empty[(String, String), Long]
        byCluster.values.foreach { ms =>
          for {
            (a, i) <- ms; (b, j) <- ms if i < j
            key = if (a._1 <= b._1) (a._1, b._1) else (b._1, a._1)
          } brute(key) = brute.getOrElse(key, 0L) + 1L
        }
        got == brute.toMap
      }
    }

  // ---- negative-cents floor/rounding discipline (q102/q105) ----
  // The r7 q102 bug was Spark `div` truncating where DuckDB `//`
  // floors — visible only on NEGATIVE sums. These properties are the
  // adversarial cases that would have caught it: the shipped
  // expressions must floor/round exactly like the oracle (replayed
  // here as Math.floorDiv / BigDecimal HALF_UP, the two semantics the
  // oracle SQL and the streaming twin implement) on adversarially
  // negative cents.

  private val negCentsGen = Gen.choose(-1000000000L, 1000000000L)

  property("q102 mean-centi expr floors negative sums like the oracle") =
    Prop.forAll(Gen.listOfN(12, Gen.zip(negCentsGen, Gen.choose(1L, 999L)))) {
      rows =>
        rows.isEmpty || {
          val got = rows.toDF("s1c", "n")
            .selectExpr("s1c", "n", "(s1c - pmod(s1c, n)) div n AS m")
            .as[(Long, Long, Long)].collect()
          got.forall { case (s, n, m) => m == Math.floorDiv(s, n) }
        }
    }

  private val negEventsGen: Gen[List[(Long, Long)]] =
    // (half-hour slot, centi-value): slots span past both horizons,
    // duplicates create RANGE-frame ties, values go properly negative
    Gen.listOfN(14, Gen.zip(Gen.choose(0L, 99L), Gen.choose(-100000L, 100000L)))

  property("q105 RANGE frames sum negative cents exactly (brute replay)") =
    Prop.forAll(negEventsGen) { slots =>
      slots.isEmpty || {
        val h1 = graft.queries.TimeseriesQueries.FeatureHorizon1
        val h2 = graft.queries.TimeseriesQueries.FeatureHorizon2
        val evs = slots.zipWithIndex.map { case ((slot, vc), i) =>
          (i.toLong, slot * (h1 / 2), vc) // half-hour grid
        }
        val w1 = org.apache.spark.sql.expressions.Window
          .orderBy($"tus").rangeBetween(-h1, 0)
        val w2 = org.apache.spark.sql.expressions.Window
          .orderBy($"tus").rangeBetween(-h2, 0)
        val got = evs.toDF("event_id", "tus", "vc")
          .select($"event_id", $"tus",
            count(lit(1)).over(w1).as("n1"), sum($"vc").over(w1).as("s1"),
            count(lit(1)).over(w2).as("n2"), sum($"vc").over(w2).as("s2"))
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        got.forall { case (_, t, n1, s1, n2, s2) =>
          val in1 = evs.filter(e => e._2 >= t - h1 && e._2 <= t)
          val in2 = evs.filter(e => e._2 >= t - h2 && e._2 <= t)
          n1 == in1.size && s1 == in1.map(_._3).sum &&
            n2 == in2.size && s2 == in2.map(_._3).sum
        }
      }
    }

  private val funnelEvGen: Gen[List[(String, Long)]] =
    Gen.listOfN(12, Gen.zip(
      Gen.oneOf("view", "click", "purchase", "error"), Gen.choose(0L, 20L)))

  property("funnel greedy walk reaches brute-force maximal depth") =
    Prop.forAll(funnelEvGen) { evs =>
      val steps = graft.queries.TimeseriesQueries.FunnelSteps.toIndexedSeq
      val sorted = evs.sortBy(_._2).toIndexedSeq
      // exhaustive take-or-skip search for the deepest feasible chain
      def best(i: Int, k: Int, last: Long): Int =
        if (k == steps.length || i == sorted.length) k
        else {
          val (tpe, t) = sorted(i)
          val skip = best(i + 1, k, last)
          if (tpe == steps(k) && (k == 0 || t > last))
            math.max(skip, best(i + 1, k + 1, t))
          else skip
        }
      graft.operators.FunnelWalk.walk(sorted, steps).length ==
        best(0, 0, Long.MinValue)
    }

  property("funnel walk is split-consistent: resuming from state equals " +
    "the one-shot walk at every cut point") =
    Prop.forAll(funnelEvGen) { evs =>
      val steps = graft.queries.TimeseriesQueries.FunnelSteps.toIndexedSeq
      val sorted = evs.sortBy(_._2)
      val whole = graft.operators.FunnelWalk.walk(sorted, steps)
      (0 to sorted.length).forall { cut =>
        val resumed = graft.operators.FunnelWalk.walk(sorted.drop(cut), steps,
          graft.operators.FunnelWalk.walk(sorted.take(cut), steps))
        resumed == whole
      }
    }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 7L)))
      .map(_.collect { case (a, b) if a != b =>
        if (a < b) (a, b) else (b, a)
      }.distinct)

  property("TriangleCount equals the brute-force closed-triple count on " +
    "random graphs") =
    Prop.forAll(edgeGen) { edges =>
      edges.isEmpty || {
        val got = graft.operators.TriangleCount
          .perNode(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        val es = edges.toSet
        def adj(x: Long, y: Long) = es((x min y, x max y))
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val brute = nodes.map { v =>
          val tri = (for {
            x <- nodes; y <- nodes
            if x < y && adj(v, x) && adj(v, y) && adj(x, y) &&
              v != x && v != y
          } yield 1).size.toLong
          v -> tri
        }.toMap
        got == brute
      }
    }

  private lazy val kmvAgg = graft.operators.KmvSketch.aggregator(8,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]](),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())

  property("KMV sketch is mergeable and order-free: any split/order " +
    "reduces to the k smallest distinct hashes") =
    Prop.forAll(
      Gen.listOfN(30, Gen.choose(0L, 40L)), Gen.choose(0, 30)) { (hs, cut0) =>
      val cut = cut0 min hs.length
      val (p1, p2) = hs.splitAt(cut)
      def fold(part: Seq[Long]) = part.foldLeft(kmvAgg.zero)(kmvAgg.reduce)
      val merged = kmvAgg.finish(kmvAgg.merge(fold(p1), fold(p2)))
      val direct = kmvAgg.finish(fold(hs))
      val expected = hs.distinct.sorted.take(8)
      merged == expected && direct == expected &&
        kmvAgg.finish(kmvAgg.merge(fold(p2), fold(p1))) == expected // commutes
    }

  property("negative money rounds to cents identically in batch round() " +
    "and the streaming twin's BigDecimal HALF_UP") =
    Prop.forAll(Gen.listOfN(16, Gen.choose(-2000L, 2000L))) { millis =>
      millis.isEmpty || {
        // values on a 5-millicent grid hit the exact .5-cent boundary
        // cases where truncation/floor/half-up all differ
        val vs = millis.map(m => m * 5 / 1000.0)
        val got = vs.toDF("value")
          .selectExpr("CAST(round(value * 100) AS BIGINT) AS vc")
          .as[Long].collect().toSeq
        val expected = vs.map(v => BigDecimal.valueOf(v * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        got == expected
      }
    }

  property("q121 fixed-point OLS equals the exact BigInt replay and tracks " +
    "double OLS, including negative slopes/intercepts") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.choose(0L, 50L), Gen.choose(-5000L, 5000L)))
    ) { pts0 =>
      // ≥ 2 distinct x values or the variance denominator is zero
      val pts = pts0.distinctBy(_._1)
      pts.size < 2 || {
        val df = pts.toDF("x0", "y0")
          .selectExpr("'g' AS grp", "CAST(x0 AS BIGINT) AS x",
            "CAST(y0 AS BIGINT) AS y")
        val got = graft.queries.RelationalQueries.trendOf(df, "grp")
          .selectExpr("n_rows", "slope_1e6", "intercept_1e6")
          .as[(Long, Long, Long)].head()
        // exact BigInt replay of the same truncating fixed-point algebra
        val n = BigInt(pts.size)
        val sx = pts.map(p => BigInt(p._1)).sum
        val sy = pts.map(p => BigInt(p._2)).sum
        val sxx = pts.map(p => BigInt(p._1) * p._1).sum
        val sxy = pts.map(p => BigInt(p._1) * p._2).sum
        val den = n * sxx - sx * sx
        val slope = ((n * sxy - sx * sy) * 1000000) / den // BigInt / truncates
        val icept = ((sy * den - (n * sxy - sx * sy) * sx) * 1000000) / (n * den)
        val exactOk = got == ((pts.size.toLong, slope.toLong, icept.toLong))
        // and the fixed point tracks the double-precision OLS within
        // the 1e-6 quantization (+1 for the truncation step)
        val dSlope = (n * sxy - sx * sy).toDouble / den.toDouble
        val dIcept = (sy.toDouble - dSlope * sx.toDouble) / n.toDouble
        exactOk &&
          math.abs(slope.toLong / 1e6 - dSlope) <= 2e-6 &&
          math.abs(icept.toLong / 1e6 - dIcept) <= 2e-6
      }
    }

  property("q128 CUPED algebra equals the exact BigInt replay on generated " +
    "units (negative thetas, degenerate arms, zero variance included)") =
    Prop.forAll(
      Gen.listOfN(10,
        Gen.zip(Gen.choose(0L, 5000L), Gen.choose(-5000L, 5000L),
          Gen.oneOf(0, 1)))
    ) { units0 =>
      val units = units0.zipWithIndex
        .map { case ((x, y, arm), i) => (i.toLong, x, y, arm) };
      {
        val df = units.toDF("uid", "x0", "y0", "arm")
          .selectExpr("'g' AS event_type", "CAST(x0 AS DECIMAL(38,0)) AS x",
            "CAST(y0 AS DECIMAL(38,0)) AS y", "arm")
        val got = graft.queries.TimeseriesQueries.cupedReadout(df)
          .selectExpr("n_a", "n_b", "theta_1e6", "t2_raw_1e6", "t2_cuped_1e6")
          .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
          .head()
        // exact BigInt replay of the engine-generated algebra
        def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates
        val all = units.map(u => (BigInt(u._2), BigInt(u._3), u._4))
        def m(arm: Int) = {
          val xs = all.filter(_._3 == arm)
          (BigInt(xs.size), xs.map(_._1).sum, xs.map(_._2).sum,
            xs.map(v => v._1 * v._1).sum, xs.map(v => v._1 * v._2).sum,
            xs.map(v => v._2 * v._2).sum)
        }
        val (na, sxa, sya, sxxa, sxya, syya) = m(0)
        val (nb, sxb, syb, sxxb, sxyb, syyb) = m(1)
        val n = na + nb; val sx = sxa + sxb; val sy = sya + syb
        val dvx = n * (sxxa + sxxb) - sx * sx
        val th: Option[BigInt] =
          if (dvx == 0) None
          else Some(tdiv((n * (sxya + sxyb) - sx * sy) * 1000000, dvx))
        def welch(sA: BigInt, qA: BigInt, sB: BigInt, qB: BigInt) =
          if (na < 2 || nb < 2) None
          else {
            val se2 = tdiv(tdiv(na * qA - sA * sA, na * (na - 1)), na) +
              tdiv(tdiv(nb * qB - sB * sB, nb * (nb - 1)), nb)
            if (se2 == 0) None
            else {
              val dm = tdiv(sA, na) - tdiv(sB, nb)
              Some(tdiv(dm * dm * 1000000, se2).toLong)
            }
          }
        val raw = welch(BigInt(1000000) * sya, BigInt("1000000000000") * syya,
          BigInt(1000000) * syb, BigInt("1000000000000") * syyb)
        val cuped = th.flatMap { t =>
          def s2(sY: BigInt, sX: BigInt) = BigInt(1000000) * sY - t * sX
          def q2(qY: BigInt, xy: BigInt, xx: BigInt) =
            BigInt("1000000000000") * qY - BigInt(2000000) * t * xy + t * t * xx
          welch(s2(sya, sxa), q2(syya, sxya, sxxa),
            s2(syb, sxb), q2(syyb, sxyb, sxxb))
        }
        got == ((na.toLong, nb.toLong, th.map(_.toLong), raw, cuped))
      }
    }

  /** q143's KS formulation: `max |cumA·N_B − cumB·N_A| / (N_A·N_B)`
    * over the merged distinct-value grid must equal the textbook
    * two-sample statistic `max_x |F_A(x) − F_B(x)|` evaluated at
    * every pooled sample point — including duplicated values and
    * values present in only one arm, the cases where a naive
    * per-arm-grid evaluation goes wrong.
    */
  property("q143 KS: integer cross-multiplied CDF max equals the textbook statistic") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1, 30)).map(_.take(30)),
      Gen.nonEmptyListOf(Gen.choose(1, 30)).map(_.take(30))) { (xs, ys) =>
      val na = BigInt(xs.size); val nb = BigInt(ys.size)
      val grid = (xs ++ ys).distinct.sorted
      val dInt = grid.map { v =>
        val ca = BigInt(xs.count(_ <= v)); val cb = BigInt(ys.count(_ <= v))
        (ca * nb - cb * na).abs
      }.max
      val dDouble = grid.map { v =>
        math.abs(xs.count(_ <= v).toDouble / xs.size -
          ys.count(_ <= v).toDouble / ys.size)
      }.max
      // the integer form is the exact rational; the double form agrees
      // to float precision
      math.abs(dInt.toDouble / (na * nb).toDouble - dDouble) < 1e-9
    }

  /** q152's PSI in 10⁻⁶ quantize-then-sum fixed point: exactly zero
    * on identical distributions, symmetric up to ONE quantization
    * unit per bucket (the difference factor negates exactly, but the
    * log factor is `log(u)` vs `log(fl(1/u))` — a last-ulp pair, so
    * a rounded term may shift by one only when it lands within an
    * ulp of a half-unit), and non-negative always (each term's
    * factors share a sign). The bound is the honest one — asserting
    * bit-exact symmetry would be a latent one-in-a-billion flake.
    */
  property("q152 PSI: zero at identity, symmetric within quantization, never negative") =
    Prop.forAll(Gen.listOfN(6, Gen.choose(1L, 50L)),
      Gen.listOfN(6, Gen.choose(1L, 50L))) { (as, bs) =>
      def psi(a: Seq[Long], b: Seq[Long]): Long = {
        val na = a.sum.toDouble; val nb = b.sum.toDouble
        a.indices.collect {
          case i if a(i) > 0 && b(i) > 0 =>
            math.round((a(i) / na - b(i) / nb) *
              math.log((a(i) * nb) / (b(i) * na)) * 1e6)
        }.sum
      }
      psi(as, as) == 0L &&
        math.abs(psi(as, bs) - psi(bs, as)) <= as.size.toLong &&
        psi(as, bs) >= 0L
    }

  /** q138's prefix-sum Gini identity: the rank-free form
    * `((n+1)T − 2ΣSᵢ) div (nT)` (what the distributed operator
    * computes) must equal the textbook rank formula
    * `(2Σ i·xᵢ − (n+1)T) div (nT)` on the ascending-sorted counts —
    * including duplicate counts, the case where a wrong tie order in
    * the sort key would silently shift ranks.
    */
  property("q138 Gini: prefix-sum identity equals the rank formula exactly") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 50L)).map(_.take(40))) { xs =>
      val sorted = xs.sorted.map(BigInt(_))
      val n = BigInt(sorted.size)
      val t = sorted.sum
      val cums = sorted.scanLeft(BigInt(0))(_ + _).tail
      val viaPrefix = (((n + 1) * t - 2 * cums.sum) * 1000000) / (n * t)
      val viaRank = ((2 * sorted.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x
      }.sum - (n + 1) * t) * 1000000) / (n * t)
      viaPrefix == viaRank && viaPrefix >= 0 && viaPrefix < 1000000
    }

  property("q188 CUSUM: the sequential max(0, S+d) recurrence equals the " +
    "prefix-minus-running-min closed form on arbitrary signed drifts") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-50L, 50L)).map(_.take(60))) {
      ds =>
        val sequential = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
        val prefixes = ds.scanLeft(0L)(_ + _).tail
        val closed = prefixes.zipWithIndex.map { case (p, i) =>
          p - math.min(0L, prefixes.take(i + 1).min)
        }
        sequential == closed
    }

  property("q185/q177 order statistics: the histogram cumulative-rank " +
    "pick equals the sorted-list order statistic at every ceil(p*n)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 30L)).map(_.take(50))) {
      xs =>
        val sorted = xs.sorted
        val hist = xs.groupBy(identity).toArray.sortBy(_._1)
          .map { case (v, g) => (v, g.size.toLong) }
        def atHist(rank: Long): Long = {
          var cum = 0L; var i = 0
          while (i < hist.length && cum + hist(i)._2 < rank) {
            cum += hist(i)._2; i += 1
          }
          hist(math.min(i, hist.length - 1))._1
        }
        Seq(25, 50, 90, 100).forall { p =>
          val rank = (p.toLong * xs.size + 99) / 100
          atHist(math.max(rank, 1)) == sorted((math.max(rank, 1) - 1).toInt)
        }
    }

  // --- SequencePacking (q57/q75/q135/q158): the distributed two-pass
  // prefix sum must equal a sequential per-key fold for ARBITRARY
  // inputs and partition counts — the operator is the one place a
  // split-index bookkeeping bug would silently shift every cum/bin
  // downstream, and the example tests only cover two partitionings.

  private val packGen: Gen[(List[(String, Long, Long)], Int, Long)] =
    for {
      nRows <- Gen.choose(0, 40)
      keys <- Gen.listOfN(nRows, Gen.oneOf("a", "b", "c"))
      toks <- Gen.listOfN(nRows, Gen.choose(0L, 120L))
      parts <- Gen.choose(1, 7)
      budget <- Gen.choose(1L, 100L)
    } yield {
      // unique (key, order) pairs: order ties inside a key would make
      // the sequential oracle ambiguous (the operator's contract
      // requires a total per-key order, which every caller has)
      val rows = keys.zipWithIndex.zip(toks).map { case ((k, i), t) =>
        (k, i.toLong, t)
      }
      (rows, parts, budget)
    }

  property("SequencePacking.withBins: distributed two-pass prefix sum == " +
    "sequential per-key fold, for arbitrary inputs, budgets, and " +
    "partition counts") =
    Prop.forAll(packGen) { case (rows, parts, budget) =>
      val df = rows.toDF("source", "doc_id", "n_tokens")
      val got = graft.operators.SequencePacking
        .withBins(df, Seq("source"), "doc_id", "n_tokens", budget,
          numPartitions = parts)
        .select($"source", $"doc_id", $"cum_tokens", $"bin_id")
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      val expected = rows.groupBy(_._1).iterator.flatMap { case (_, ks) =>
        var acc = 0L
        ks.sortBy(_._2).map { case (k, id, t) =>
          acc += t
          (k, id) -> ((acc, (acc - t) / budget))
        }
      }.toMap
      got == expected
    }

  // --- AviCodec (q40/q55): pure-JVM codec, so these afford arbitrary
  // clips rather than only the generator's id-derived ones -----------

  import graft.functions.AviCodec

  private val aviClipGen: Gen[(Int, Int, Long, IndexedSeq[Array[Int]])] =
    for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      nf <- Gen.choose(1, 6)
      us <- Gen.choose(1L, 0xffffffffL)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      (w, h, us, IndexedSeq.fill(nf)(Array.fill(w * h)(rnd.nextInt(0x1000000))))
    }

  property("AviCodec: encode→decode round-trips meta + every pixel for " +
    "ARBITRARY clips, and the size closed form is exact") =
    Prop.forAll(aviClipGen) { case (w, h, us, frames) =>
      val bytes = AviCodec.encode(w, h, us, frames)
      val clip = AviCodec.decode(bytes)
      bytes.length == AviCodec.encodedSize(w, h, frames.length) &&
        clip.meta == AviCodec.AviMeta(w, h, us, frames.length) &&
        clip.frames.size == frames.size &&
        clip.frames.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }

  property("AviCodec: every strict prefix fails loudly (no truncated " +
    "container ever decodes)") =
    Prop.forAll(aviClipGen, Gen.choose(0, Int.MaxValue)) {
      case ((w, h, us, frames), cutSeed) =>
        val bytes = AviCodec.encode(w, h, us, frames)
        val cut = cutSeed % bytes.length // every value < full length
        Prop.throws(classOf[IllegalArgumentException]) {
          AviCodec.decode(bytes.take(cut))
        }
    }

  property("AviCodec: a pixel-byte flip decodes to a DIFFERENT raster — " +
    "the parser reads the movi payload, never echoes the generator") =
    Prop.forAll(aviClipGen, Gen.choose(0, Int.MaxValue),
      Gen.choose(0, Int.MaxValue), Gen.choose(0, Int.MaxValue),
      Gen.choose(0, 2)) {
      case ((w, h, us, frames), fSeed, ySeed, xSeed, ch) =>
        val bytes = AviCodec.encode(w, h, us, frames)
        val f = fSeed % frames.length
        val y = ySeed % h // row as STORED (bottom-up)
        val x = xSeed % w
        val fb = AviCodec.stride(w) * h
        val pos = 224 + f * (8 + fb) + 8 + y * AviCodec.stride(w) + 3 * x + ch
        val flipped = bytes.clone()
        flipped(pos) = (flipped(pos) ^ 0x01).toByte
        val clip = AviCodec.decode(flipped)
        val decodedRow = h - 1 - y // decode un-flips the bottom-up rows
        clip.frames(f)(decodedRow * w + x) !=
          frames(f)(decodedRow * w + x)
    }

  // --- WavCodec (q118/q130): same pure-JVM discipline as AviCodec ----

  import graft.functions.WavCodec

  private val wavClipGen: Gen[(Int, Array[Short])] =
    for {
      rate <- Gen.choose(1, 192000)
      n <- Gen.choose(1, 4000)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      (rate, Array.fill(n)(rnd.nextInt(0x10000).toShort))
    }

  property("WavCodec: encode→decode round-trips meta + every sample for " +
    "ARBITRARY clips, and the size closed form is exact") =
    Prop.forAll(wavClipGen) { case (rate, pcm) =>
      val bytes = WavCodec.encode(rate, pcm)
      val clip = WavCodec.decode(bytes)
      bytes.length == WavCodec.encodedSize(pcm.length) &&
        clip.meta == WavCodec.WavMeta(rate, 16, 1, pcm.length) &&
        clip.samples.sameElements(pcm)
    }

  property("WavCodec: every strict prefix fails loudly (no truncated " +
    "container ever decodes)") =
    Prop.forAll(wavClipGen, Gen.choose(0, Int.MaxValue)) {
      case ((rate, pcm), cutSeed) =>
        val bytes = WavCodec.encode(rate, pcm)
        val cut = cutSeed % bytes.length
        Prop.throws(classOf[IllegalArgumentException]) {
          WavCodec.decode(bytes.take(cut))
        }
    }

  property("WavCodec: a sample-byte flip decodes to a DIFFERENT sample — " +
    "the parser reads the data payload, never echoes the generator") =
    Prop.forAll(wavClipGen, Gen.choose(0, Int.MaxValue), Gen.oneOf(0, 1)) {
      case ((rate, pcm), iSeed, byteHalf) =>
        val bytes = WavCodec.encode(rate, pcm)
        val i = iSeed % pcm.length
        val pos = 44 + 2 * i + byteHalf
        val flipped = bytes.clone()
        flipped(pos) = (flipped(pos) ^ 0x01).toByte
        WavCodec.decode(flipped).samples(i) != pcm(i)
    }

  // --- WavCodec forged-container fuzz (VERDICT r13 item 4): unlike the
  // three properties above, these containers do NOT start from a valid
  // encode — the generator assembles arbitrary chunk walks (honest and
  // LYING size fields including the 0xFFFFFFFF wrap pattern, unknown
  // fourccs, odd-size chunks exercising the RIFF pad rule, duplicate /
  // missing fmt+data, forged RIFF headers, trailing junk). Allocation
  // stays bounded by construction: decode validates every claimed size
  // against buf.remaining BEFORE allocating, so a lying u32 can never
  // claim more memory than the ≤ ~6 KiB container the generator built.

  /** One raw chunk: fourcc + DECLARED size (possibly a lie) + body. */
  private def rawChunk(id: String, declared: Int, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(id.getBytes("US-ASCII")); buf.putInt(declared); buf.put(body)
    buf.array
  }

  /** A structurally VALID mono-PCM16 fmt chunk body for `rate`. */
  private def validFmtBody(rate: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(1); buf.putShort(1); buf.putInt(rate)
    buf.putInt(rate * 2); buf.putShort(2); buf.putShort(16)
    buf.array
  }

  private val forgedChunkGen: Gen[Array[Byte]] = Gen.frequency(
    // honest-enough pieces so the fuzzer reaches DEEP into the walk
    // (all-garbage inputs die at the RIFF header and test nothing)
    3 -> Gen.choose(1, 192000).map(r => rawChunk("fmt ", 16, validFmtBody(r))),
    3 -> Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(2 * n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(b => rawChunk("data", 2 * n, b.toArray))),
    2 -> (for { // honest unknown chunk, odd sizes exercise the pad rule
      id <- Gen.oneOf("LIST", "JUNK", "id3 ", "fact", "xxxx")
      n <- Gen.choose(0, 33)
      pad <- Gen.oneOf(0, 1) // pad byte present or absent at the tail
      body <- Gen.listOfN(n + (if (n % 2 == 1) pad else 0),
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk(id, n, body.toArray)),
    2 -> (for { // LYING size field over an arbitrary body
      id <- Gen.oneOf("fmt ", "data", "LIST", "RIFF", "WAVE", "    ")
      n <- Gen.choose(0, 33)
      declared <- Gen.oneOf(
        Gen.choose(0, 200),
        Gen.oneOf(0xFFFFFFF8, -1, Int.MaxValue, Int.MinValue, 0x80000000))
      body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk(id, declared, body.toArray)),
    1 -> Gen.choose(0, 7).flatMap(n => // a ragged sub-header tail
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))

  private val forgedWavGen: Gen[Array[Byte]] =
    for {
      nChunks <- Gen.choose(0, 6)
      chunks <- Gen.listOfN(nChunks, forgedChunkGen)
      magic <- Gen.frequency(6 -> Gen.const("RIFF"), 1 -> Gen.const("RIFX"))
      form <- Gen.frequency(6 -> Gen.const("WAVE"), 1 -> Gen.const("AVI "))
      honestSize <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
      forgedSize <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield {
      val payload = form.getBytes("US-ASCII") ++ chunks.flatten
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(magic.getBytes("US-ASCII"))
      buf.putInt(if (honestSize) payload.length else forgedSize)
      buf.put(payload)
      buf.array
    }

  property("WavCodec: decode over arbitrary forged chunk walks either " +
    "succeeds or throws EXACTLY IllegalArgumentException — never hangs, " +
    "never leaks another exception type") =
    Prop.forAll(forgedWavGen) { bytes =>
      try { WavCodec.decode(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  property("WavCodec: a successful decode of a forged walk implies full " +
    "structural consistency — valid fmt+data present, sample count " +
    "matches the data chunk's claim, and no trailing bytes were ignored") =
    Prop.forAll(forgedWavGen) { bytes =>
      val decoded = try Some(WavCodec.decode(bytes)) catch {
        case _: IllegalArgumentException => None
      }
      decoded.forall { clip =>
        clip.meta.bits == 16 && clip.meta.nFrames >= 1 &&
          clip.samples.length == clip.meta.nFrames * clip.meta.channels &&
          // the trailing-bytes rule (r13 ADVICE): everything after the
          // header must have parsed as well-formed chunks, so a decode
          // that succeeded can never have skipped a ragged tail
          bytes.length >= 20 + 16 + 8 + 2 * clip.samples.length
      }
    }

  // --- AviCodec forged-container fuzz (VERDICT r14 item 5): the WAV
  // forged-walk discipline ported to the video container. Unlike the
  // three AviCodec properties above, these containers do NOT start
  // from a valid encode (except the flip/resize arms, which mutate
  // one): the generator assembles arbitrary RIFF walks — honest and
  // LYING size fields, unknown fourccs, nested LISTs deep enough to
  // hit the depth cap, frame chunks whose size disagrees with the
  // headers, ragged tails. The load-bearing claim is the allocation
  // rule: decode validates every claimed size against buf.remaining
  // BEFORE allocating pixel storage, so a forged u32 can never claim
  // more memory than the ≤ ~8 KiB container the generator built —
  // asserted below as pixels ≤ input bytes on every successful decode.

  /** A structurally VALID avih chunk body (56 bytes). */
  private def validAvihBody(w: Int, h: Int, us: Int, n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(us); b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(n); b.putInt(0); b.putInt(1); b.putInt(0)
    b.putInt(w); b.putInt(h)
    (0 until 4).foreach(_ => b.putInt(0))
    b.array
  }

  /** A structurally VALID strh chunk body ('vids'/'DIB ', 56 bytes). */
  private def validStrhBody(w: Int, h: Int, us: Int, n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("vids".getBytes("US-ASCII")); b.put("DIB ".getBytes("US-ASCII"))
    b.putInt(0); b.putShort(0); b.putShort(0); b.putInt(0)
    b.putInt(us); b.putInt(1000000); b.putInt(0); b.putInt(n)
    b.putInt(0); b.putInt(0); b.putInt(0)
    b.putShort(0); b.putShort(0); b.putShort(w.toShort); b.putShort(h.toShort)
    b.array
  }

  /** A structurally VALID strf chunk body (BITMAPINFOHEADER, 40 bytes). */
  private def validStrfBody(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(40); b.putInt(w); b.putInt(h)
    b.putShort(1); b.putShort(24); b.putInt(0)
    b.putInt(AviCodec.stride(w) * h); b.putInt(0); b.putInt(0)
    b.putInt(0); b.putInt(0)
    b.array
  }

  /** A LIST chunk: declared size spans the inner fourcc + body. */
  private def listChunk(form: String, body: Array[Byte]): Array[Byte] =
    rawChunk("LIST", 4 + body.length, form.getBytes("US-ASCII") ++ body)

  /** Small-dims generator shared by the honest AVI pieces. */
  private val aviDimsGen: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8))

  private val forgedAviHdrlChunkGen: Gen[Array[Byte]] = Gen.frequency(
    3 -> (for { // honest avih
      (w, h) <- aviDimsGen; us <- Gen.choose(1, 100000); n <- Gen.choose(0, 4)
    } yield rawChunk("avih", 56, validAvihBody(w, h, us, n))),
    3 -> (for { // honest strl list (strh + strf)
      (w, h) <- aviDimsGen; us <- Gen.choose(1, 100000); n <- Gen.choose(0, 4)
    } yield listChunk("strl",
      rawChunk("strh", 56, validStrhBody(w, h, us, n)) ++
        rawChunk("strf", 40, validStrfBody(w, h)))),
    2 -> (for { // LYING size over an arbitrary body
      id <- Gen.oneOf("avih", "strh", "strf", "LIST", "00db", "vedr")
      nBody <- Gen.choose(0, 40)
      declared <- Gen.oneOf(
        Gen.choose(0, 300),
        Gen.oneOf(0xFFFFFFF8, -1, Int.MaxValue, Int.MinValue, 0x80000000))
      body <- Gen.listOfN(nBody, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk(id, declared, body.toArray)),
    1 -> Gen.choose(9, 14).map { depth => // nest past the depth cap
      (1 to depth).foldLeft(Array.emptyByteArray) { (inner, _) =>
        listChunk("strl", inner)
      }
    },
    1 -> (for { // honest unknown chunk, odd sizes exercise the pad rule
      id <- Gen.oneOf("JUNK", "vprp", "odml", "xxxx")
      nBody <- Gen.choose(0, 17)
      pad <- Gen.oneOf(0, 1)
      body <- Gen.listOfN(nBody + (if (nBody % 2 == 1) pad else 0),
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk(id, nBody, body.toArray)),
    1 -> Gen.choose(0, 7).flatMap(nRag => // a ragged sub-header tail
      Gen.listOfN(nRag, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)))

  private val forgedAviMoviChunkGen: Gen[Array[Byte]] = Gen.frequency(
    3 -> (for { // frame chunk with honest size (dims may still disagree
                // with whatever headers the walk carries)
      (w, h) <- aviDimsGen
      body <- Gen.listOfN(AviCodec.stride(w) * h,
        Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk("00db", body.length, body.toArray)),
    2 -> (for { // frame chunk with a LYING size
      id <- Gen.oneOf("00db", "00dc")
      nBody <- Gen.choose(0, 40)
      declared <- Gen.oneOf(
        Gen.choose(0, 300),
        Gen.oneOf(0xFFFFFFF8, -1, Int.MaxValue, Int.MinValue))
      body <- Gen.listOfN(nBody, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk(id, declared, body.toArray)),
    1 -> (for { // non-frame chunk inside movi
      nBody <- Gen.choose(0, 17)
      body <- Gen.listOfN(nBody, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield rawChunk("idx1", nBody, body.toArray)))

  private val forgedAviGen: Gen[Array[Byte]] = {
    // arm 1: free-assembled chunk walk under LIST hdrl / LIST movi
    val walkGen = for {
      nh <- Gen.choose(0, 3)
      hdrl <- Gen.listOfN(nh, forgedAviHdrlChunkGen)
      nm <- Gen.choose(0, 3)
      movi <- Gen.listOfN(nm, forgedAviMoviChunkGen)
      stray <- Gen.oneOf(
        Gen.const(Array.emptyByteArray),
        Gen.listOfN(6, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(b =>
          rawChunk("JUNK", 6, b.toArray)))
      magic <- Gen.frequency(8 -> Gen.const("RIFF"), 1 -> Gen.const("RIFX"))
      form <- Gen.frequency(8 -> Gen.const("AVI "), 1 -> Gen.const("WAVE"))
      honestSize <- Gen.frequency(5 -> Gen.const(true), 1 -> Gen.const(false))
      forgedSize <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield {
      val payload = form.getBytes("US-ASCII") ++
        listChunk("hdrl", hdrl.flatten.toArray) ++ stray ++
        listChunk("movi", movi.flatten.toArray)
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(magic.getBytes("US-ASCII"))
      buf.putInt(if (honestSize) payload.length else forgedSize)
      buf.put(payload)
      buf.array
    }
    // arm 2: a VALID encode with k byte flips — reaches every parse
    // stage deep, and some cases survive (flips landing in pixel bytes)
    val flipGen = for {
      (w, h, us, frames) <- aviClipGen
      k <- Gen.choose(1, 6)
      seeds <- Gen.listOfN(k, Gen.choose(0, Int.MaxValue))
    } yield {
      val bytes = AviCodec.encode(w, h, us, frames)
      seeds.foreach { sd =>
        val pos = sd % bytes.length
        bytes(pos) = (bytes(pos) ^ (1 << (sd % 8))).toByte
      }
      bytes
    }
    // arm 3: a VALID encode truncated or junk-extended with the RIFF
    // size field PATCHED to match — walks the mangled tree past the
    // first header check instead of dying on "RIFF size != payload"
    val resizeGen = for {
      (w, h, us, frames) <- aviClipGen
      grow <- Gen.oneOf(true, false)
      amt <- Gen.choose(1, 64)
      junk <- Gen.listOfN(amt, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield {
      val bytes = AviCodec.encode(w, h, us, frames)
      val out =
        if (grow) bytes ++ junk.toArray
        else bytes.take(math.max(12, bytes.length - amt))
      val buf = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(4, out.length - 8)
      out
    }
    Gen.frequency(3 -> walkGen, 2 -> flipGen, 2 -> resizeGen)
  }

  property("AviCodec: decode over arbitrary forged chunk walks either " +
    "succeeds or throws EXACTLY IllegalArgumentException — never hangs, " +
    "never leaks another exception type") =
    Prop.forAll(forgedAviGen) { bytes =>
      try { AviCodec.decode(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  property("AviCodec: a successful decode of a forged walk implies full " +
    "structural consistency, and ALLOCATION IS BOUNDED BY INPUT SIZE — " +
    "decoded pixel bytes never exceed the container's byte count, no " +
    "matter what any forged size field claimed") =
    Prop.forAll(forgedAviGen) { bytes =>
      val decoded = try Some(AviCodec.decode(bytes)) catch {
        case _: IllegalArgumentException => None
      }
      decoded.forall { clip =>
        val m = clip.meta
        m.width > 0 && m.height > 0 && m.nFrames >= 1 &&
          clip.frames.size == m.nFrames &&
          clip.frames.forall(_.length == m.width * m.height) &&
          // every accepted frame consumed stride(w)·h ≥ 3·w·h payload
          // bytes from the container, and frames never overlap — so
          // pixel storage is bounded by what was actually read, never
          // by a header's claim (a forged dwTotalFrames/biWidth either
          // fails the cross-checks or describes real payload)
          clip.frames.iterator.map(_.length.toLong * 3L).sum <= bytes.length
      }
    }

  // ---- PackedKeyTable (q166's broadcast model lookup, r16) ----------

  private val packedEntriesGen: Gen[List[(Long, Long)]] =
    Gen.choose(0, 60).flatMap { n =>
      Gen.listOfN(n, Gen.zip(
        // bias toward clustered keys: sequential-ish low bits are the
        // probe-chain adversary the SplitMix slot mix exists for
        Gen.oneOf(Gen.choose(0L, 50L), Gen.choose(0L, (1L << 42) - 1)),
        Gen.choose(Long.MinValue, Long.MaxValue)))
        .map(_.distinctBy(_._1))
    }

  property("PackedKeyTable: every inserted key looks up to its value; " +
    "any absent key throws (never a silent zero score)") =
    Prop.forAll(packedEntriesGen) { entries =>
      val tbl = graft.functions.TextJvm.PackedKeyTable.build(
        entries.map(_._1).toArray, entries.map(_._2).toArray)
      val hits = entries.forall { case (k, v) => tbl(k) == v }
      val present = entries.map(_._1).toSet
      val absent = Iterator.from(0).map(i => (1L << 42) + i.toLong)
        .find(!present.contains(_)).get
      val misses = scala.util.Try(tbl(absent)).isFailure
      hits && misses
    }

  property("PackedKeyTable rejects negative keys at build (the -1 " +
    "empty-slot sentinel must stay unreachable)") =
    Prop.forAll(Gen.choose(Long.MinValue, -1L)) { bad =>
      scala.util.Try(graft.functions.TextJvm.PackedKeyTable.build(
        Array(bad), Array(0L))).isFailure
    }

  property("md5Hash32JvmBytes over an assembled span buffer equals " +
    "md5Hash32Jvm of the space-joined string (UTF-8 concat = byte " +
    "concat — q97's zero-allocation window assembly)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("日本語", "עברית", "😀x", "naïve", "Ω≈ç")))) { words =>
      val wb = words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val buf = new Array[Byte](wb.map(_.length + 1).sum)
      var len = 0
      wb.zipWithIndex.foreach { case (w, i) =>
        if (i > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(w, 0, buf, len, w.length); len += w.length
      }
      graft.functions.DedupFunctions.md5Hash32JvmBytes(buf, len) ==
        graft.functions.DedupFunctions.md5Hash32Jvm(words.mkString(" "))
    }

  property("PackedKeyTable rejects duplicate keys at build — silent " +
    "last-wins would pick one value unannounced (VERDICT r16 item 5)") =
    Prop.forAll(packedEntriesGen.suchThat(_.nonEmpty),
      Gen.choose(0, Int.MaxValue)) { (entries, seed) =>
      // duplicate an arbitrary existing key at the END of the array so
      // the collision happens mid-build, wherever probing lands it
      val dupOf = entries(seed % entries.size)._1
      val ks = entries.map(_._1).toArray :+ dupOf
      val vs = entries.map(_._2).toArray :+ 99L
      scala.util.Try(
        graft.functions.TextJvm.PackedKeyTable.build(ks, vs)).isFailure
    }
}
