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
}
