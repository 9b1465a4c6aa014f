package graft

import graft.queries.VectorQueries

/** Retrieval quality of the two approximate ANN paths, measured the way
  * an ANN user tunes them: recall@k against the exact brute-force
  * top-k, averaged over a 20-query sweep, as a CURVE over the tuning
  * knob (IVF: nprobe; LSH: multi-probe Hamming radius). The oracle
  * hash-match (q38/q56) proves engine portability of the algorithm;
  * this is the other half — whether the approximation retrieves the
  * true neighbours, and what turning the knob buys. Measured means are
  * recorded in BASELINE.md; the asserted floors sit below them so
  * data-regeneration jitter doesn't flake the suite while a real
  * retrieval regression (wrong bucketing, wrong probe order, empty
  * lists) still fails loudly.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val queryIds: Seq[Long] = (0 until 20).map(_ * 25L)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select($"vec_id").as[Long].collect().toSet

  private def recallAt10(approx: Long => Set[Long],
                         exact: Map[Long, Set[Long]]): Double = {
    val per = queryIds.map { q =>
      approx(q).intersect(exact(q)).size.toDouble / exact(q).size
    }
    per.sum / per.size
  }

  test("q83 truncation audit: hand-computed norms, cosines, and null arms") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val d = VectorQueries.Dims
    val k = VectorQueries.KeepDims
    def vec(head: Float, tail: Float) =
      Array.fill(k)(head) ++ Array.fill(d - k)(tail)
    Seq(
      (0L, vec(1f, 1f)),  // the reference query: all ones
      (1L, vec(1f, 0f)),  // all norm in the kept prefix
      (2L, vec(1f, 1f)),  // identical to the query
      (3L, vec(0f, 0f)),  // zero vector: every audit column NULL
      (4L, vec(0f, 1f))   // all norm in the DROPPED tail
    ).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.q83(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val c = 0.707107 // sqrt(32)/8 rounded to 6dp
    val r1 = got(1L)
    assert(r1.getDouble(1) == 1.0 && r1.getDouble(3) == 1.0)
    assert(math.abs(r1.getDouble(2) - c) < 1e-6)
    assert(math.abs(r1.getDouble(4) - (1.0 - r1.getDouble(2))) < 1e-6)
    val r2 = got(2L)
    assert(math.abs(r2.getDouble(1) - c) < 1e-6) // half the energy kept
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 1.0 &&
      r2.getDouble(4) == 0.0) // truncation is free for aligned vectors
    val r3 = got(3L)
    assert(r3.isNullAt(1) && r3.isNullAt(2) && r3.isNullAt(3) && r3.isNullAt(4))
    val r4 = got(4L)
    assert(r4.getDouble(1) == 0.0)       // prefix holds nothing
    assert(math.abs(r4.getDouble(2) - c) < 1e-6)
    assert(r4.isNullAt(3) && r4.isNullAt(4)) // truncated cosine undefined
  }

  test("q89 int8 retrieval: float cosines agree with q37, rows bounded at TopK") {
    val q89 = VectorQueries.q89(spark, sf).collect()
    assert(q89.length == VectorQueries.TopK)
    // for ids the two top-k sets share, q89's float cosine must equal
    // q37's value exactly (same fold, same 6dp round)
    val q37 = VectorQueries.q37(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shared = q89.filter(r => q37.contains(r.getLong(0)))
    assert(shared.nonEmpty)
    shared.foreach { r =>
      assert(r.getDouble(2) == q37(r.getLong(0)),
        s"vec ${r.getLong(0)}: q89 cos_f ${r.getDouble(2)} vs q37 ${q37(r.getLong(0))}")
      // a shared id is by definition in the float top-k
      assert(r.getBoolean(3))
    }
  }

  test("ANN recall@10 curves: IVF vs nprobe, LSH vs multi-probe radius") {
    val exact = queryIds
      .map(q => q -> ids(VectorQueries.exactTopKDf(spark, sf, q))).toMap
    assert(exact.values.forall(_.size == VectorQueries.TopK))

    val ivfCurve = Seq(2, 4, 6).map { np =>
      np -> recallAt10(
        q => ids(VectorQueries.ivfTopKDf(spark, sf, q, np)), exact)
    }
    val lshCurve = Seq(0, 1, 2).map { r =>
      r -> recallAt10(
        q => ids(VectorQueries.lshTopKDf(spark, sf, q, r)), exact)
    }
    info("recall@10 over 20 queries —")
    info("  ivf: " + ivfCurve.map { case (np, r) =>
      f"nprobe=$np → $r%.3f" }.mkString("  "))
    info("  lsh: " + lshCurve.map { case (rad, r) =>
      f"radius=$rad → $r%.3f" }.mkString("  "))

    val ivfR = ivfCurve.toMap
    val lshR = lshCurve.toMap
    // the curves must be monotone — a wider probe can only add
    // candidates, and candidates are ranked by true cosine
    assert(ivfR(2) <= ivfR(4) && ivfR(4) <= ivfR(6), s"ivf not monotone: $ivfCurve")
    assert(lshR(0) <= lshR(1) && lshR(1) <= lshR(2), s"lsh not monotone: $lshCurve")
    // floors: measured ≈ 0.41 / 0.63 / 0.76 (ivf @ nprobe 2/4/6 of 10
    // lists) and ≈ 0.015 / 0.07 / 0.335 (lsh @ radius 0/1/2 of 8 bits)
    // on the near-isotropic synthetic corpus — see BASELINE.md
    // "ANN recall@10"
    assert(ivfR(2) >= 0.30, f"IVF nprobe=2 recall collapsed: ${ivfR(2)}%.3f")
    assert(ivfR(6) >= 0.60, f"IVF nprobe=6 recall collapsed: ${ivfR(6)}%.3f")
    assert(lshR(2) >= 0.15, f"LSH radius=2 recall collapsed: ${lshR(2)}%.3f")
  }

  test("PQ-ADC recall@10 over the 20-query sweep, with exact-rerank ordering") {
    val exact = queryIds
      .map(q => q -> ids(VectorQueries.exactTopKDf(spark, sf, q))).toMap
    val pqRecall = recallAt10(
      q => ids(VectorQueries.pqTopKDf(spark, sf, q)), exact)
    info(f"  pq (M=${VectorQueries.PqM}, Ks=${VectorQueries.PqKs}, " +
      f"rerank ${VectorQueries.PqRerank}): recall@10 $pqRecall%.3f")
    // 4x16 codes over near-isotropic synthetic vectors are a COARSE
    // approximation by design; the floor pins the build didn't collapse
    assert(pqRecall >= 0.15, f"PQ recall collapsed: $pqRecall%.3f")
    // the rerank contract: emitted rows are ordered by EXACT cosine
    // (rank ascending = cos_sim descending), adc is advisory
    val rows = VectorQueries.q122(spark, sf)
      .select($"rank", $"cos_sim").as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    // and every emitted candidate really came from the ADC cut: at
    // most PqRerank candidates existed, TopK survive
    assert(rows.length == VectorQueries.TopK)
    // IVF-PQ recall vs nprobe: NOT asserted monotone, deliberately —
    // unlike plain IVF (candidates ranked by TRUE cosine, so wider
    // probes only add), the fixed-size ADC cut means a newly-covered
    // list can contribute a high-ADC FALSE positive that displaces a
    // true neighbor from the rerank set. Measured here: 0.245 → 0.230
    // → 0.270 over nprobe 2/4/8 — the real IVFPQ rerank-budget
    // interplay, pinned as floors instead
    val ivfpqCurve = Seq(2, 4, 8).map { np =>
      np -> recallAt10(
        q => ids(VectorQueries.ivfPqTopKDf(spark, sf, q, np)), exact)
    }
    info("  ivfpq: " + ivfpqCurve.map { case (np, r) =>
      f"nprobe=$np → $r%.3f" }.mkString("  "))
    ivfpqCurve.foreach { case (np, r) =>
      assert(r >= 0.15, f"IVF-PQ nprobe=$np recall collapsed: $r%.3f")
    }
    // at full coverage (nprobe = KLists) IVF-PQ degenerates to exactly
    // the q122 full-corpus ADC search — same candidates, same rerank
    val full = recallAt10(
      q => ids(VectorQueries.ivfPqTopKDf(spark, sf, q, VectorQueries.KLists)),
      exact)
    assert(math.abs(full - pqRecall) < 1e-9,
      f"full-coverage IVF-PQ $full%.3f != plain PQ $pqRecall%.3f")
  }

  test("MinHash banding recall vs exact all-pairs Jaccard ground truth — " +
    "the s-curve floors the q29 pipeline's candidate generation promises") {
    import graft.queries.DedupQueries
    // exact ground truth: every doc pair's true shingle Jaccard,
    // computed brute-force on the driver (500 docs — an EVAL-scale
    // pass; the distributed path must never do this, which is exactly
    // why its recall needs measuring)
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).toSeq
        .sliding(DedupQueries.ShingleN)
        .filter(_.size == DedupQueries.ShingleN)
        .map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val cand = DedupQueries.q29(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    def jac(a: Set[String], b: Set[String]): Double = {
      val i = a.intersect(b).size
      if (i == 0) 0.0 else i.toDouble / (a.size + b.size - i)
    }
    val pairs = for {
      i <- sets.indices; j <- (i + 1) until sets.length
      s = jac(sets(i)._2, sets(j)._2) if s > 0.0
    } yield (math.min(sets(i)._1, sets(j)._1),
      math.max(sets(i)._1, sets(j)._1), s)
    def recallAtOrAbove(tau: Double): (Int, Double) = {
      val truePairs = pairs.filter(_._3 >= tau)
      (truePairs.size,
        if (truePairs.isEmpty) 1.0
        else truePairs.count(p => cand((p._1, p._2))).toDouble / truePairs.size)
    }
    // theoretical s-curve for 8 bands x 2 rows: P = 1-(1-s^2)^8 →
    // 1.000 at s=0.9, 0.995 at 0.7, 0.900 at 0.5; floors sit below
    val (n90, r90) = recallAtOrAbove(0.9)
    val (n70, r70) = recallAtOrAbove(0.7)
    val (n50, r50) = recallAtOrAbove(0.5)
    assert(n90 > 0, "corpus lost its high-similarity pairs — recall floor untestable")
    assert(r90 >= 0.95, f"recall@J>=0.9 collapsed: $r90%.3f over $n90 pairs")
    if (n70 > 0) assert(r70 >= 0.85, f"recall@J>=0.7: $r70%.3f over $n70 pairs")
    if (n50 > 0) assert(r50 >= 0.60, f"recall@J>=0.5: $r50%.3f over $n50 pairs")
    // and the curve is monotone in similarity, as banding theory says
    assert(r90 >= r70 - 1e-9 || n70 == 0)
  }
}
