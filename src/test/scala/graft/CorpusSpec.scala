package graft

import graft.Materialize.Ops

import java.nio.file.Files

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("q61 counts codepoints, not UTF-16 code units") {
    // "hi😀": 2 ASCII chars + one supplementary codepoint (a surrogate
    // PAIR in UTF-16) = 3 characters, matching DuckDB's codepoint-based
    // length()/substr() semantics; code-unit counting would say 4 and
    // split the emoji into two bogus 'characters'
    val dir = Files.createTempDirectory("graft_corpus").toString
    Seq((1L, "hi😀"), (2L, "aab"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val byId = graft.queries.CorpusQueries.q61(spark, dir)
      .select($"doc_id", $"len_chars", $"entropy")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(1L)._1 == 3L) // not 4
    // three distinct equiprobable characters → exactly log2(3) bits
    assert(math.abs(byId(1L)._2 - 1.585) < 1e-9)
    // "aab": H = -(2/3 log2 2/3 + 1/3 log2 1/3) ≈ 0.9183
    assert(math.abs(byId(2L)._2 - 0.9183) < 1e-9)
  }

  test("greedy subword tokenizer: longest-match wins, fallback consumes codepoints") {
    import graft.functions.TextJvm
    assert(TextJvm.subwordCount("scan") == 2)     // sc + an
    assert(TextJvm.subwordCount("customer") == 3) // cust + om + er
    assert(TextJvm.subwordCount("the") == 1)      // whole-word entry beats pieces
    assert(TextJvm.subwordCount("xyz") == 3)      // pure single-char fallback
    assert(TextJvm.subwordCount("thexyz") == 4)   // the + x + y + z
    // each 😀 is ONE codepoint (two UTF-16 chars): fallback must consume
    // the pair, matching DuckDB's substr stride — char-wise consumption
    // would count 4 and desync the oracle
    assert(TextJvm.subwordCount("😀😀") == 2)
    assert(TextJvm.subwordCountDoc("the scan  customer") == 6)
    assert(TextJvm.subwordCountDoc("") == 0)
  }

  test("packing by subword counts assigns materially different bins than whitespace counts") {
    import graft.operators.SequencePacking
    import graft.queries.TextQueries
    // same docs, same budget, same order — only the token column differs
    val counts = TextQueries.subwordCounts(spark, "/root/testdata/sf0.001")
      .materialize()
    def bins(tok: String): Map[Long, Long] = SequencePacking
      .withBins(counts, keyCols = Seq("source"), orderCol = "doc_id",
        tokensCol = tok, tokensPerBin = TextQueries.TokensPerBin)
      .select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    val wsBins = bins("n_ws")
    val swBins = bins("n_subword")
    // subword counts are strictly larger (fertility > 1), so bins fill
    // faster: a whitespace-budgeted plan OVERFILLS real token budgets
    val moved = wsBins.count { case (id, b) => swBins(id) != b }
    assert(moved > 0, "subword packing identical to whitespace packing")
    assert(swBins.values.max > wsBins.values.max,
      s"subword packing should need more bins: ${swBins.values.max} vs ${wsBins.values.max}")
  }

  test("q78: the learned vocab lowers fertility vs the fixed vocab") {
    import graft.queries.TextQueries
    import org.apache.spark.sql.functions.sum
    val (learned, fixed, ws) = TextQueries.q78(spark, "/root/testdata/sf0.001")
      .agg(sum($"n_learned"), sum($"n_fixed"), sum($"n_ws"))
      .as[(Long, Long, Long)].head()
    // top-K corpus words become single tokens → corpus-level fertility
    // strictly drops; it can never drop below one token per word
    assert(learned < fixed, s"learned $learned should beat fixed $fixed")
    assert(learned >= ws)
  }

  test("token-weighted mixture (q73) can FLIP the resampling direction vs doc-count mixture (q59)") {
    import graft.queries.CorpusQueries
    val dir = Files.createTempDirectory("graft_mix").toString
    // en: 1 long doc of 40×'customer' (subword fertility 3) → 120 tokens
    // de: 4 short docs of 10×'the' (fertility 1) → 40 tokens total
    val en = Seq((1L, Seq.fill(40)("customer").mkString(" "), "en", "web"))
    val de = (2L to 5L).map(i => (i, Seq.fill(10)("the").mkString(" "), "de", "web"))
    (en ++ de).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    def rates(df: org.apache.spark.sql.DataFrame) = df
      .select($"lang", $"keep_bps").as[(String, Long)].collect().toMap
    val byDocs = rates(CorpusQueries.q59(spark, dir))
    val byTokens = rates(CorpusQueries.q73(spark, dir))
    // doc-count mixture: de is over-represented (4 of 5 docs) → downsampled
    assert(byDocs("en") == 10000L && byDocs("de") < 10000L)
    // token mixture: en holds 120 of 160 tokens → the direction FLIPS
    assert(byTokens("de") == 10000L && byTokens("en") < 10000L,
      s"expected flip, got $byTokens")
  }

  test("q82 epoch plan: scarce source up-samples to the cap, glutted source down-samples") {
    import graft.queries.CorpusQueries
    val dir = Files.createTempDirectory("graft_epoch").toString
    // src0 (target 30%) holds 40 of 440 tokens → raw 3.3 epochs → capped
    // at 3; src9 (target 1%) holds 400 → raw 110 bps, a hard down-sample.
    // 'the' is in the fixed vocab (fertility 1), so tokens = words.
    val scarce = (1L to 2L).map(i =>
      (i, Seq.fill(20)("the").mkString(" "), "en", "src0"))
    val glut = (10L to 19L).map(i =>
      (i, Seq.fill(40)("the").mkString(" "), "en", "src9"))
    (scarce ++ glut).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q82(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val r0 = got("src0")
    assert(r0.getLong(4) == 3L * CorpusQueries.MixBps && r0.getBoolean(5),
      s"src0 should cap at ${CorpusQueries.MaxEpochs} epochs: $r0")
    // the cap's remainder is 0, so every src0 doc gets EXACTLY 3 copies
    assert(r0.getLong(6) == 3L * r0.getLong(1))
    assert(r0.getLong(7) == 3L * r0.getLong(2))
    val r9 = got("src9")
    assert(r9.getLong(4) < CorpusQueries.MixBps && !r9.getBoolean(5))
    assert(r9.getLong(6) <= r9.getLong(1)) // down-sample never replicates
    // 40 tokens per src9 doc → realized tokens track realized copies
    assert(r9.getLong(7) == 40L * r9.getLong(6))
  }

  test("q90 per-source top ngrams: feed-local boilerplate outranks, ties by ngram") {
    import graft.queries.CorpusQueries
    val dir = Files.createTempDirectory("graft_srcgrams").toString
    Seq(
      // srcA boilerplate "x y" appears 3x; everything else once
      (1L, "x y p x y q x y", "en", "srcA"),
      // srcB: all bigrams tie at 1 → rank order is lexicographic
      (2L, "b c a b", "en", "srcB")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q90(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got(("srcA", 1L)) == (("x y", 3L)))
    // global frequency cannot leak across sources: srcB's top is its own
    assert(got(("srcB", 1L)) == (("a b", 1L)))  // lexicographic tie-break
    assert(got(("srcB", 2L)) == (("b c", 1L)))
    assert(got(("srcB", 3L)) == (("c a", 1L)))
  }

  test("q91 weighted sample: picks sum to target exactly, weight drives multiplicity") {
    import graft.queries.CorpusQueries
    val dir = Files.createTempDirectory("graft_wsample").toString
    // doc 50 holds half the corpus tokens ('the' has fertility 1);
    // doc 99 is empty and must never be picked
    val docs = (1L to 49L).map(i =>
        (i, Seq.fill(10)("the").mkString(" "), "en", "src0")) ++
      Seq((50L, Seq.fill(490)("the").mkString(" "), "en", "src0"),
        (99L, "", "en", "src0"))
    docs.toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q91(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.values.sum == CorpusQueries.SampleTarget) // telescoping floors
    // doc 50 owns 50% of the mass → half the picks land inside it
    assert(got(50L) == CorpusQueries.SampleTarget / 2)
    assert(!got.contains(99L)) // zero weight, zero picks
    // every small doc's 10-token interval exceeds the 9.8-token
    // stride, so ALL 49 must appear — the invariant the output filter
    // alone cannot prove
    assert((1L to 49L).forall(got.contains))
  }

  test("q88 adaptive gate: each language gets its own bar at the exact ceil-rank") {
    import graft.queries.CorpusQueries
    val dir = Files.createTempDirectory("graft_adapt").toString
    // no punctuation → quality = min(words/100, 1); two languages with
    // shifted distributions: en holds .1–.8, de holds .55–.90
    def doc(id: Long, words: Int, lang: String) =
      (id, (0 until words).map(i => s"w$i").mkString(" "), lang, "src0")
    val en = (1 to 8).map(i => doc(i.toLong, i * 10, "en"))
    val de = (11 to 18).map(i => doc(i.toLong, 55 + (i - 11) * 5, "de"))
    (en ++ de).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.q88(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    // n=8 → ceil-rank (8+3)//4 = 2 → the bar is each lang's 2nd-lowest
    assert(got(1L)._1 == 0.2 && !got(1L)._2)  // en bar 0.2; the .1 doc drops
    assert(got(2L)._2 && got(8L)._2)          // bar itself and above keep
    assert(got(11L)._1 == 0.6 && !got(11L)._2) // de bar 0.6; the .55 doc drops
    assert(got(12L)._2 && got(18L)._2)
    // the bars genuinely differ — an absolute constant cannot do this
    assert(got(1L)._1 != got(11L)._1)
  }

  test("versionDiff covers all four arms, including removed (absent from q76's synthetic prev)") {
    import graft.queries.CorpusQueries
    import org.apache.spark.sql.functions.md5
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "t")
      .select($"doc_id", md5($"t").as("h_prev"))
    val cur = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "t")
      .select($"doc_id", md5($"t").as("h_cur"))
    val got = CorpusQueries.versionDiff(prev, cur)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("q75 packing report is consistent with q57's bins") {
    import graft.queries.TextQueries
    val sf = "/root/testdata/sf0.001"
    val bins = TextQueries.q57(spark, sf)
      .select($"source", $"bin_id", $"n_tokens")
      .as[(String, Long, Long)].collect()
    val report = TextQueries.q75(spark, sf)
      .select($"source", $"n_bins", $"n_tokens", $"fill_ratio")
      .as[(String, Long, Long, Double)].collect()
    assert(report.nonEmpty)
    val bySource = bins.groupBy(_._1)
    report.foreach { case (src, nBins, nTok, fill) =>
      val rows = bySource(src)
      assert(nBins == rows.map(_._2).max + 1)
      assert(nTok == rows.map(_._3).sum)
      val expected = BigDecimal(
        nTok.toDouble / (nBins * TextQueries.TokensPerBin).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(fill - expected) < 1e-12, s"$src fill $fill vs $expected")
    }
  }

  test("q68 shuffle-shard: rank is a permutation, shards fill contiguously, order is deterministic") {
    import org.apache.spark.sql.functions._
    import graft.queries.CorpusQueries
    val k = CorpusQueries.ShardDocs
    val out = CorpusQueries.q68(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = out.length
    // global_rank is exactly 1..N (a permutation, no gaps or dups)
    assert(out.map(_._2).sorted.toSeq == (1L to n).toSeq)
    // shard/pos are pure functions of the rank
    assert(out.forall { case (_, r, s, p) => s == (r - 1) / k && p == (r - 1) % k })
    // every shard except the last is full
    val sizes = out.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val last = sizes.keys.max
    assert(sizes.filterNot(_._1 == last).values.forall(_ == k))
    assert(sizes(last) == n - last * k)
    // the hash permutation actually shuffles (doc_id order would be identity)
    assert(out.exists { case (id, r, _, _) => id + 1 != r })
    // deterministic across runs
    val again = CorpusQueries.q68(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("q67 scrub leaves no residual PII and is idempotent") {
    import org.apache.spark.sql.functions._
    import graft.queries.TextQueries
    val detail = TextQueries.piiScrubDetail(spark, "/root/testdata/sf0.001")
    // the injection guarantees at least one of each PII kind per doc,
    // so a scrubber that silently matches nothing cannot pass
    val residual = detail.filter(
      size(regexp_extract_all(col("scrubbed"), lit(TextQueries.EmailRe), lit(0))) > 0 ||
      size(regexp_extract_all(col("scrubbed"), lit(TextQueries.Ipv4Re), lit(0))) > 0 ||
      size(regexp_extract_all(col("scrubbed"), lit(TextQueries.PhoneRe), lit(0))) > 0)
      .count()
    assert(residual == 0)
    val unredacted = detail.filter(!col("scrubbed").contains("<EMAIL>") ||
      !col("scrubbed").contains("<IP>") || !col("scrubbed").contains("<PHONE>"))
      .count()
    assert(unredacted == 0)
    // scrubbing scrubbed text must be a no-op (replacement tokens and
    // surviving text never form new matches)
    val changed = detail.filter(
      !(TextQueries.piiScrub(col("scrubbed")) <=> col("scrubbed"))).count()
    assert(changed == 0)
    // a crafted line with all three kinds, scrubbed in chain order
    val got = Seq((99L, "mail bob.smith+x@corp.example.org ip 192.168.0.12 tel +44-20-7946-0958 end"))
      .toDF("doc_id", "text")
      .select(TextQueries.piiScrub(col("text")).as("s")).as[String].head()
    assert(got == "mail <EMAIL> ip <IP> tel <PHONE> end")
  }

  test("q119 normalization really composes NFC and shrinks every doc; " +
    "q120 collocations are ranked, supported, and positively associated") {
    // NFC pin outside Spark first: the injected combining sequence
    // must compose to one codepoint, not pass through
    val composed = java.text.Normalizer.normalize("cafe\u0301",
      java.text.Normalizer.Form.NFC)
    assert(composed == "caf\u00e9" && composed.length == 4)
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.TextQueries.q119(spark, sf)
      .select($"len_raw", $"len_norm").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // the composed é and the collapsed double space each drop ≥ one
    // char (a third collapse fires when the prefix cut lands on a
    // word boundary and the re-joined text doubles a space)
    rows.foreach { case (raw, norm) =>
      assert(norm <= raw - 2 && norm >= raw - 3)
    }
    val cols = graft.queries.TextQueries.q120(spark, sf)
      .select($"c_bg", $"lift_1e6", $"rank").as[(Long, Long, Long)].collect()
    assert(cols.nonEmpty && cols.length <= graft.queries.TextQueries.PmiTopK)
    assert(cols.map(_._3).sorted.toSeq == (1L to cols.length))
    cols.foreach { case (c, lift, _) =>
      assert(c >= graft.queries.TextQueries.PmiMinSupport)
      // top collocations co-occur MORE than independence predicts
      assert(lift > 1000000L)
    }
  }

  test("q166 bigram LM: scores equal a brute-force corpus-fit model " +
    "(quantized terms, exact fixed-point sums)") {
    val sfd = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfd)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._2.length >= 2)
    val bgs = docs.flatMap { case (id, t) =>
      (0 until t.length - 1).map(i => (id, t.substring(i, i + 2))) }
    val cbg = bgs.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val cctx = cbg.groupBy(_._1.substring(0, 1))
      .map { case (c, xs) => c -> xs.values.sum }
    val exp = bgs.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map { case (_, b) =>
        // HALF_UP on BigDecimal = away-from-zero, matching Spark/DuckDB
        // round() on these NEGATIVE ln terms (math.round would differ
        // at exact .5 boundaries)
        BigDecimal(math.log(cbg(b).toDouble / cctx(b.substring(0, 1)))
          * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      val h = BigDecimal(-s.toDouble / xs.length / 1000000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((xs.length.toLong, h))
    }
    val got = graft.queries.TextQueries.q166(spark, sfd)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == exp && got.nonEmpty)
  }
}
