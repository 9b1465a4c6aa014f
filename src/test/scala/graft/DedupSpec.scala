package graft

import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("q69 chunk dedup flags cross-doc chunks, ignores within-doc repeats") {
    import graft.queries.DedupQueries
    val k = DedupQueries.ChunkWords
    val boiler = (0 until k).map(i => s"bp$i").mkString(" ") // one shared chunk
    def uniq(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    Seq(
      (1L, s"$boiler ${uniq("a", k)}"),          // boiler + 1 unique chunk
      (2L, s"$boiler ${uniq("b", 5)}"),          // boiler + short tail chunk
      (3L, uniq("c", 2 * k)),                    // fully unique, 2 chunks
      (4L, s"${uniq("d", k)} ${uniq("d", k)}")   // same chunk TWICE in one doc
    ).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.q69(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 1L, 0.5)))  // the boiler chunk is shared
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))  // unique docs stay clean
    // within-doc repetition is q52's business, not cross-doc dedup's
    assert(got(4L) == ((2L, 0L, 0.0)))
  }

  test("q92 finds the cluster a per-doc split tears; q93 heals it") {
    import graft.queries.DedupQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    // md5('split-1')%100 = 99 (test) but md5('split-2')%100 = 56
    // (train): identical texts cluster together, the per-doc split
    // tears them across the eval boundary — the leak q50/q87 cannot see
    val x = (0 until 30).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, x, "en", "src0"), (2L, x, "en", "src0"),
      (3L, (0 until 30).map(i => s"u$i").mkString(" "), "en", "src0")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val a = DedupQueries.q92(spark, dir).collect().head
    assert((a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ((2L, 1L, 1L, 2L))) // 2 clusters, 1 multi-doc, 1 LEAKY, 2 docs in it
    val splits = DedupQueries.q93(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the whole cluster follows its canonical (doc 1 → test)
    assert(splits(1L) == ((1L, "test")) && splits(2L) == ((1L, "test")))
    // the healed assignment passes its own audit by construction
    assert(splits.values.groupBy(_._1).values
      .forall(g => g.map(_._2).toSet.size == 1))
  }

  test("q87 decontam scrub cuts the chunk holding the eval passage, keeps the rest") {
    import graft.queries.DedupQueries
    val k = DedupQueries.ChunkWords
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    val evalText = "bench mark question answer pair"
    val clean1 = (0 until k).map(i => s"c$i").mkString(" ")
    val clean2 = (0 until k).map(i => s"d$i").mkString(" ")
    // the eval passage sits wholly inside doc 2's SECOND chunk
    val poisoned = s"$clean1 $evalText ${(0 until k - 7).map(i => s"e$i").mkString(" ")}"
    Seq(
      (1L, evalText, "en", DedupQueries.EvalSource),
      (2L, poisoned, "en", "src0"),
      (3L, clean2, "en", "src0")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.q87(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 2: 2 chunks, the contaminated second one drops, first survives
    assert(got(2L) == ((2L, 1L, md5hex(clean1), k.toLong)),
      s"got ${got(2L)}")
    // clean doc untouched; eval doc itself is not in the output
    assert(got(3L) == ((1L, 0L, md5hex(clean2), k.toLong)))
    assert(!got.contains(1L))
  }

  test("q86 source dup matrix: pair counts from cluster membership, not enumeration") {
    import graft.queries.DedupQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_matrix").toString
    val x = (0 until 30).map(i => s"w$i").mkString(" ") // one shared template
    val docs =
      (1L to 3L).map(i => (i, x, "en", "srcA")) ++
        (4L to 5L).map(i => (i, x, "en", "srcB")) :+
        ((6L, (0 until 30).map(i => s"u$i").mkString(" "), "en", "srcC"))
    docs.toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.q86(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // m_A=3, m_B=2 in one cluster: within-A 3 pairs, within-B 1, cross 6
    assert(got(("srcA", "srcA")) == ((3L, 1L)))
    assert(got(("srcB", "srcB")) == ((1L, 1L)))
    assert(got(("srcA", "srcB")) == ((6L, 1L)))
    // the unique srcC doc contributes no row at all
    assert(!got.keys.exists(k => k._1 == "srcC" || k._2 == "srcC"))
  }

  test("q85 bloom blocklist: exact hits hand-counted, both sketch bounds hold") {
    import graft.queries.DedupQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // eval doc: shingles {a b c, b c d}; corpus doc 2 shares exactly
    // "a b c"; doc 3 shares nothing → 5 probed shingles, 1 exact hit
    Seq(
      (1L, "a b c d", "en", DedupQueries.EvalSource),
      (2L, "a b c x y", "en", "src0"),
      (3L, "p q r s", "en", "src0")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = DedupQueries.q85(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 1L)
    assert(r.getBoolean(2), "bloom must never miss a true member")
    assert(r.getBoolean(3), "false-positive excess must sit in budget")
  }

  test("q84 chunk scrub drops repeats keeping first occurrence; idempotent") {
    import graft.queries.DedupQueries
    val k = DedupQueries.ChunkWords
    val boiler = (0 until k).map(i => s"bp$i").mkString(" ")
    val unique = (0 until k).map(i => s"u$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_scrub").toString
    Seq(
      (1L, s"$boiler $unique $boiler"), // boiler pasted twice
      (2L, unique),                     // clean doc: untouched
      (3L, "")                          // empty doc: empty receipt
    ).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.q84(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: 3 chunks, second boiler dropped, bytes = "boiler unique"
    assert(got(1L) == ((3L, 1L, md5hex(s"$boiler $unique"), 2L * k)))
    assert(got(2L) == ((1L, 0L, md5hex(unique), k.toLong)))
    assert(got(3L) == ((0L, 0L, md5hex(""), 0L)))
    // idempotence: scrubbing the scrubbed text drops nothing
    val dir2 = java.nio.file.Files.createTempDirectory("graft_scrub2").toString
    Seq((1L, s"$boiler $unique")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir2/documents.parquet")
    val again = DedupQueries.q84(spark, dir2).collect().head
    assert(again.getLong(2) == 0L &&
      again.getString(3) == md5hex(s"$boiler $unique"))
  }

  test("survivor selection keeps max quality, breaks ties by min doc_id") {
    import graft.queries.DedupQueries
    val labeled = Seq(
      // cluster 1: min-id member is the WORST copy — survivor must be 3
      (1L, 0.2, 1L), (2L, 0.5, 1L), (3L, 0.9, 1L),
      // cluster 4: quality tie between 5 and 6 — min doc_id (5) wins
      (4L, 0.1, 4L), (5L, 0.7, 4L), (6L, 0.7, 4L),
      // singleton: its own survivor regardless of score
      (7L, 0.0, 7L)
    ).toDF("doc_id", "quality", "cluster_id")
    val got = DedupQueries.survivorSelect(labeled)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got(1L) == ((3L, false)) && got(2L) == ((3L, false)))
    assert(got(3L) == ((3L, true)))   // best quality beats min id
    assert(got(5L) == ((5L, true)))   // tie → min doc_id
    assert(got(6L) == ((5L, false)) && got(4L) == ((5L, false)))
    assert(got(7L) == ((7L, true)))
  }

  test("md5Hash32 is the portable first-8-hex-chars value") {
    // DuckDB: CAST(concat('0x', substr(md5('hello'),1,8)) AS BIGINT) = 1564557354
    val got = Seq("hello").toDF("s")
      .select(DedupFunctions.md5Hash32($"s")).as[Long].head()
    assert(got == 1564557354L)
  }

  private def sig(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(DedupFunctions.minHashSignature(
        TextFunctions.wordShingles($"t", 3), 16)).as[Seq[Long]].head()

  test("minhash: identical docs → identical signature; est ≈ jaccard") {
    val a = (0 until 50).map(i => s"w$i").mkString(" ")
    val b = (0 until 49).map(i => s"w$i").mkString(" ") + " zz" // 1 word changed
    val c = (0 until 50).map(i => s"x$i").mkString(" ")         // disjoint
    assert(sig(a) == sig(a))
    assert(sig(a).size == 16)
    def est(s1: Seq[Long], s2: Seq[Long]): Double =
      s1.zip(s2).count { case (x, y) => x == y } / 16.0
    assert(est(sig(a), sig(b)) >= 0.6)  // true jaccard = 45/51 ≈ 0.88
    assert(est(sig(a), sig(c)) <= 0.25) // true jaccard = 0
  }

  test("minhash signature is null for docs with no shingles") {
    assert(Seq("a b").toDF("t")
      .select(DedupFunctions.minHashSignature(
        TextFunctions.wordShingles($"t", 3), 16)).head().isNullAt(0))
  }

  test("lsh bands: identical signatures share every band key") {
    val df = Seq("k0 k1 k2 k3 k4 k5").toDF("t")
      .select(DedupFunctions.minHashSignature(
        TextFunctions.wordShingles($"t", 3), 16).as("sig"))
      .select(explode(DedupFunctions.lshBands($"sig", 8, 2)).as("b"))
      .select($"b.band_idx", $"b.band_key").as[(Int, String)].collect()
    assert(df.length == 8)
    assert(df.map(_._1).toSeq == (0 until 8))
    assert(df.forall(_._2.matches("\\d+-\\d+")))
  }

  test("simhash: identical docs at distance 0, perturbed docs nearby") {
    def sh(t: String): Long = Seq(t).toDF("t")
      .select(DedupFunctions.simHash(TextFunctions.words($"t"), 32)).as[Long].head()
    val a = (0 until 60).map(i => s"tok$i").mkString(" ")
    val b = (0 until 58).map(i => s"tok$i").mkString(" ") + " q r"
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(ham(sh(a), sh(a)) == 0)
    assert(ham(sh(a), sh(b)) <= 12) // small perturbation → small distance
    assert(sh(a) >= 0 && sh(a) < (1L << 32))
  }

  test("embedding near-dup is exact under label skew (one hot label)") {
    // 150 of 200 vectors share one label: the shape that OOM'd the old
    // whole-partition buffering under skew. flatMapGroups must still
    // produce exactly the brute-force within-label pairs.
    import graft.queries.DedupQueries
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, if (i < 150) 1 else 2 + i % 3,
        Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    vecs.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = DedupQueries.q32(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val expected = (for {
      a <- vecs; b <- vecs
      if a._1 < b._1 && a._2 == b._2
      cos = dot(a._3, b._3) / (math.sqrt(dot(a._3, a._3)) * math.sqrt(dot(b._3, b._3)))
      if cos >= DedupQueries.NearDupCos
    } yield (a._1, b._1)).toSet
    assert(expected.nonEmpty && got == expected)

    // force secondary bucketing (cap 16 → the 150-vector label splits
    // into 10 sub-buckets): identical pair set, blocks stay capped
    val capped = DedupQueries.blockedCosinePairs(
      spark, spark.read.parquet(s"$dir/embeddings.parquet"), 16)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    assert(capped.length == capped.distinct.length) // no duplicate pairs
    assert(capped.toSet == expected)
  }

  test("exact-dup collapse: 1k copies cluster through O(groups) candidates") {
    import graft.queries.DedupQueries
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val docs =
      (1 to 1000).map(i => (i.toLong, template)) ++
        (3000 to 3019).map(i =>
          (i.toLong, s"unique doc number$i carries words w${i * 7} w${i * 13} w${i * 31} only")) ++
        Seq((4001L, "too short"), (4002L, "too short"))
    val dir = java.nio.file.Files.createTempDirectory("graft-collapse").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (mapping, cand) = DedupQueries.collapsedLshInputs(spark, dir)
    // candidate pairs are representative-level: the 1000-copy template is
    // ONE vertex, not C(1000, 2) ≈ 500k pairs × 8 bands
    val nCand = cand.count()
    assert(nCand < 50, s"collapsed candidates should be O(groups), got $nCand")
    // the shingle-less group ("too short" twice) is excluded from the
    // mapping: identical text without shingles is NOT an LSH duplicate
    val m = mapping.as[(Long, Long)].collect().toMap // (doc_id → rep_id)
    assert(!m.contains(4001L) && !m.contains(4002L))
    val labels = DedupQueries.clusterLabels(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == docs.size)
    (1 to 1000).foreach(i => assert(labels(i.toLong) == 1L))
    (3000 to 3019).foreach(i => assert(labels(i.toLong) == i.toLong))
    assert(labels(4001L) == 4001L && labels(4002L) == 4002L)
  }

  test("band-bucket cap drops oversized buckets; default cap is inert") {
    import graft.queries.DedupQueries
    // 50 docs with IDENTICAL signatures — one 50-member bucket per band
    val sig = (1 to 50).map(i => (i.toLong, Seq.fill(16)(7L)))
      .toDF("doc_id", "sig")
    assert(DedupQueries.lshCandidates(sig).count() == 50L * 49 / 2)
    assert(DedupQueries.lshCandidates(sig, maxBucket = 10).count() == 0)
    // the drop is observable, never silent
    assert(DedupQueries.oversizedBandBuckets(sig, 10).count() == DedupQueries.NBands)
    assert(DedupQueries.oversizedBandBuckets(sig, DedupQueries.MaxBandBucket).count() == 0)
  }

  test("dedup queries leave the cache manager empty (persist hygiene)") {
    import graft.queries.DedupQueries
    val sf = "/root/testdata/sf0.001"
    DedupQueries.q29(spark, sf).count()
    DedupQueries.q31(spark, sf).count()
    DedupQueries.q48(spark, sf).count()
    DedupQueries.q49(spark, sf).count()
    assert(org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark))
  }

  test("fingerprint is order-sensitive (unlike the minhash set signature)") {
    def fp(t: String): Long = Seq(t).toDF("t")
      .select(DedupFunctions.fingerprint(TextFunctions.words($"t"))).as[Long].head()
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
    assert(Seq("").toDF("t")
      .select(DedupFunctions.fingerprint(TextFunctions.words($"t"))).head().isNullAt(0))
  }

  test("q169 CDC chunks tile the corpus exactly, and boundaries " +
    "re-align after a prefix insertion (the shift-robustness a fixed " +
    "grid cannot give)") {
    import graft.queries.DedupQueries
    val sfd = "/root/testdata/sf0.001"
    val corpus = Tables.documents(spark, sfd)
      .filter(length($"text") > 0)
      .agg(sum(length($"text"))).as[Long].head()
    val card = DedupQueries.q169(spark, sfd)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (nChunks, nDistinct, dupInst, bytesTotal, bytesDistinct, savings) =
      card
    assert(bytesTotal == corpus)           // chunks tile, never overlap
    assert(dupInst == nChunks - nDistinct)
    assert(bytesDistinct <= bytesTotal && savings >= 0 && savings < 1000000)

    // shift-robustness: doc2 = junk prefix + doc1. After the first
    // boundary past the edit, every chunk re-aligns — dup mass appears
    // even though NO fixed-size grid offset would line up.
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val base = (0 until 60).map(i => s"w${i % 17} x${(i * 7) % 13}")
      .mkString(" ")
    Seq((1L, base), (2L, "ZQJXKVY " + base)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val shifted = DedupQueries.q169(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(shifted._3 > 0, "shifted duplicate produced no shared chunks")
  }

  test("q182 containment: an embedded document scores high containment " +
    "against its host; unrelated text pairs with neither") {
    import graft.queries.DedupQueries
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    val base = (0 until 160).map(i => s"w${i % 23} y${(i * 11) % 19}")
      .mkString(" ") // ~1000 chars -> ~15 CDC chunks
    val host = "HOSTPREFIXJUNK " + base + " HOSTSUFFIXJUNK"
    val other = (0 until 160).map(i => s"q${i % 13} z${(i * 7) % 29}")
      .mkString(" ")
    Seq((1L, base), (2L, host), (3L, other)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.q182(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(got.keySet == Set((1L, 2L)), s"pairs: ${got.keySet}")
    assert(got((1L, 2L)) >= 600000L,
      s"embedded doc containment too low: ${got((1L, 2L))}")
  }

  test("q168 sorted-neighborhood: catches suffix AND prefix typos (the " +
    "reverse pass), never emits a pair beyond the edit ceiling") {
    import graft.queries.DedupQueries
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sn").toString
    Seq((1L, "gizmo pod"), (2L, "gizmo pod"), (3L, "gizmo pox"),
      (4L, "aizmo pod"), // prefix typo: far on pass 1, adjacent reversed
      (5L, "unrelated thing"), (6L, "zz other"))
      .toDF("p_partkey", "p_name")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    val got = DedupQueries.q168(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains(("gizmo pod", "gizmo pox"))) // suffix typo
    assert(pairs.contains(("aizmo pod", "gizmo pod"))) // prefix typo
    got.foreach { case (a, b, d, na, nb) =>
      assert(d >= 1 && d <= DedupQueries.SnMaxEdit && lev(a, b) == d)
      assert(na >= 1 && nb >= 1)
    }
    // the "gizmo pod" dictionary entry carries BOTH records
    assert(got.exists(r => r._1 == "aizmo pod" && r._5 == 2L))

    // q184 on the same lake: the typo cluster elects the most-recorded
    // name as canonical; untouched names stay singleton entities
    val golden = DedupQueries.q184(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(golden("gizmo pod") == (("gizmo pod", 3L, 4L)))
    assert(golden("unrelated thing") == (("unrelated thing", 1L, 1L)))
    assert(golden("zz other") == (("zz other", 1L, 1L)))
    assert(golden.values.map(_._3).sum == 6L) // every record accounted for
  }
}
