package graft

import graft.Materialize.Ops

import graft.operators.{ConnectedComponents, SequencePacking}
import graft.queries.{DedupQueries, VectorQueries}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial scale-stress: each test feeds an operator the
  * pathological shape its scaladoc claims to survive and asserts the
  * survival PROPERTY (bounded candidates, O(log) convergence, skew
  * spread, balanced lists) — turning the 100 TB prose claims into
  * executable checks. StressBench runs the same shapes bigger and
  * records wall-times in SCALE.md.
  */
class StressSpec extends SparkSpec {
  import spark.implicits._

  test("skyline prune: a 200k anti-chain (worst case — NOTHING dominates) " +
    "survives both phases losslessly; a dominated chain collapses to one " +
    "survivor per salt before the global pass ever runs") {
    import graft.queries.TimeseriesQueries
    val n = 200000L
    def salted(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("salt", pmod(xxhash64(col("user_id")), lit(32)))
    // anti-chain x + y = n: the frontier IS the dataset — pruning must
    // not lose a single row, and the global pass pays the honest
    // worst-case single-partition sort the scaladoc warns about
    val anti = salted(spark.range(n).select(col("id").as("user_id"),
      col("id").as("x"), (lit(n) - col("id")).as("y")))
    val t0 = System.nanoTime()
    val localA = TimeseriesQueries.skylinePrune(anti, Seq("salt"))
    assert(localA.count() == n)
    assert(TimeseriesQueries.skylinePrune(localA, Seq.empty).count() == n)
    val secsA = (System.nanoTime() - t0) / 1e9
    // dominated chain y = x: exactly one global survivor, and the
    // LOCAL phase already cuts 200k rows to <= 32 — the global window
    // never sees the corpus
    val chain = salted(spark.range(n).select(col("id").as("user_id"),
      col("id").as("x"), col("id").as("y")))
    val localC = TimeseriesQueries.skylinePrune(chain, Seq("salt"))
    val localCount = localC.count()
    assert(localCount <= 32L, s"local prune left $localCount rows")
    val sky = TimeseriesQueries.skylinePrune(localC, Seq.empty)
      .select("user_id").as[Long].collect()
    assert(sky.toSeq == Seq(n - 1))
    info(f"200k anti-chain both phases in $secsA%.1fs; " +
      f"chain pruned 200k -> $localCount -> 1")
  }

  test("CDC chunker: a 1M-char document chunks in linear time and tiles " +
    "exactly; a 20k-doc corpus tiles corpus-wide through the q169 shape") {
    import graft.functions.TextJvm
    import graft.queries.DedupQueries.{CdcWindow, CdcMask}
    val big = (0 until 180000).map(i => s"w${i % 997}").mkString(" ")
    val t0 = System.nanoTime()
    val chunks = TextJvm.cdcChunks(big, CdcWindow, CdcMask)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(chunks.map(_.length).sum == big.length) // exact tiling
    assert(chunks.length > 1000) // boundaries actually fire
    // the quadratic SQL-substring form at this length would touch
    // ~len^2/2 = 3.9e11 chars; the loop touches len once
    val docs = spark.range(20000)
      .select(col("id"),
        concat_ws(" ", (0 until 60).map(k =>
          concat(lit("t"), ((col("id") * 61 + k) % 991))): _*).as("text"))
    import spark.implicits._
    val tiled = docs.select(col("text")).as[String]
      .flatMap(TextJvm.cdcChunks(_, CdcWindow, CdcMask))
      .agg(sum(length(col("value"))))
      .as[Long].head()
    val corpus = docs.agg(sum(length(col("text")))).as[Long].head()
    assert(tiled == corpus)
    info(f"1M-char doc: ${chunks.length} chunks in $secs%.3fs (O(len)); " +
      s"20k-doc corpus tiles exactly ($corpus chars)")
  }

  test("band-bucket cap: 15k unique near-dups past MaxBandBucket stay " +
    "bounded, and the drop is observable") {
    val n = DedupQueries.MaxBandBucket + 5000
    val dir = java.nio.file.Files.createTempDirectory("graft-stress-lsh").toString
    StressData.writeDocs(spark, dir, StressData.hotBucketDocs(n))
    val sig = DedupQueries.signatures(spark, dir).materialize()
    // FIRST the (linear-cost) oversize monitor: it must see the hot
    // bucket. Checking this before the join also fail-fasts if the
    // generator ever drifts below the cap — in that regime the
    // candidate join really does go quadratic (observed: a just-under-
    // cap bucket ground the JVM into a GC spiral), which is the point
    // of the cap, not of this test.
    val over = DedupQueries.oversizedBandBuckets(sig, DedupQueries.MaxBandBucket)
      .as[(Int, String, Long)].collect()
    assert(over.nonEmpty,
      s"generator miscalibrated: no bucket over ${DedupQueries.MaxBandBucket}")
    assert(over.map(_._3).max > DedupQueries.MaxBandBucket)
    // the hot bucket is dropped: candidates come only from the straggler
    // signatures (docs whose unique tail won a minhash slot) — orders of
    // magnitude below the ~n²/2 ≈ 112M an uncapped join would emit
    val nCand = DedupQueries.lshCandidates(sig).count()
    assert(nCand < 200000, s"cap failed to bound candidates: $nCand")
    info(s"candidates=$nCand, oversized buckets=${over.length}, " +
      s"hottest=${over.map(_._3).max} members")
  }

  test("connected components: worst-case diameter (20k path) and degree " +
    "(20k star) converge via pointer doubling, both variants agree") {
    val edges = StressData.pathPlusStarEdges(spark, pathN = 20000, starN = 20000)
      .materialize()
    val t0 = System.nanoTime()
    val byProp = ConnectedComponents.run(edges, "src", "dst", maxIter = 25)
      .as[(Long, Long)].collect().toMap
    val tProp = (System.nanoTime() - t0) / 1e9
    // exact labels prove convergence: an unconverged run leaves some
    // path vertex pointing above the minimum
    assert(byProp.size == 20001 + 20001)
    (0 to 20000).foreach(i =>
      assert(byProp(StressData.PathBase + i) == StressData.PathBase))
    (0 to 20000).foreach(i =>
      assert(byProp(StressData.StarBase + i) == StressData.StarBase))
    val t1 = System.nanoTime()
    val byStar = ConnectedComponents
      .runAlternating(edges, "src", "dst").as[(Long, Long)].collect().toMap
    val tStar = (System.nanoTime() - t1) / 1e9
    assert(byStar == byProp)
    info(f"label-prop $tProp%.1fs, large/small-star $tStar%.1fs")
  }

  test("CC auto-selection: the degree sketch routes the star graph to the " +
    "skew-robust variant and the path graph to pointer doubling") {
    // pure path: max degree 2 of 40k endpoints → far below the skew bar
    val path = StressData.pathPlusStarEdges(spark, pathN = 20000, starN = 0)
      .materialize()
    val pathSkew = ConnectedComponents.degreeSketch(path, "src", "dst")
    assert(pathSkew < ConnectedComponents.SkewFraction,
      f"path skew $pathSkew%.4f should be below ${ConnectedComponents.SkewFraction}")
    // pure star: the hub is HALF of all endpoints → far above the bar
    val star = StressData.pathPlusStarEdges(spark, pathN = 0, starN = 20000)
      .materialize()
    val starSkew = ConnectedComponents.degreeSketch(star, "src", "dst")
    assert(starSkew >= ConnectedComponents.SkewFraction,
      f"star skew $starSkew%.4f should be above ${ConnectedComponents.SkewFraction}")
    // and auto() itself is label-identical to both variants either way
    val viaAuto = ConnectedComponents.auto(star, "src", "dst")
      .as[(Long, Long)].collect().toMap
    (0 to 20000).foreach(i =>
      assert(viaAuto(StressData.StarBase + i) == StressData.StarBase))
  }

  test("pagerank: a 50k-leaf star (one-key in-mass funnel) and a 50k path " +
    "rank exactly in bounded time — partial agg absorbs the hot sink") {
    import graft.operators.PageRank
    // undirected star: every iteration funnels 50k contributions into
    // ONE dst key — the worst reduce-skew PageRank can see. Map-side
    // combine must absorb it (sum of longs is associative), or this
    // would be the one-reducer hot key the scaladoc forbids.
    val starN = 50000
    val star = StressData.pathPlusStarEdges(spark, pathN = 0, starN = starN)
    val und = star.union(star.select($"dst".as("src"), $"src".as("dst")))
      .materialize()
    val t0 = System.nanoTime()
    val r = PageRank.run(und, iters = 5)
      .select($"id", $"rank").as[(Long, Long)].collect().toMap
    val tStar = (System.nanoTime() - t0) / 1e9
    assert(r.size == starN + 1)
    // exact closed-form replay: leaves are symmetric, so the whole
    // 5-iteration recurrence collapses to two scalars
    val scale = PageRank.DefaultScale
    val n = starN + 1L
    val tp = ((scale / n) * (PageRank.DampDen - PageRank.DampNum)) /
      PageRank.DampDen
    var (hub, leaf) = (scale / n, scale / n)
    (1 to 5).foreach { _ =>
      val hubNext = tp + starN * (((leaf * PageRank.DampNum) /
        PageRank.DampDen) / 1L)
      val leafNext = tp + (((hub * PageRank.DampNum) /
        PageRank.DampDen) / starN)
      hub = hubNext; leaf = leafNext
    }
    assert(r(StressData.StarBase) == hub)
    assert(r(StressData.StarBase + 1L) == leaf)
    assert((1 to starN).forall(i => r(StressData.StarBase + i) == leaf))
    // long path: diameter is irrelevant to fixed-k cost (contrast CC,
    // which must traverse it) — 50k-node chain in the same bound
    val path = StressData.pathPlusStarEdges(spark, pathN = 50000, starN = 0)
    val undP = path.union(path.select($"dst".as("src"), $"src".as("dst")))
      .materialize()
    val t1 = System.nanoTime()
    val np = PageRank.run(undP, iters = 5).count()
    val tPath = (System.nanoTime() - t1) / 1e9
    assert(np == 50001L)
    assert(tStar < 120 && tPath < 120,
      f"pagerank stress too slow: star $tStar%.1fs path $tPath%.1fs")
    info(f"star(${starN}) $tStar%.1fs, path(50k) $tPath%.1fs")
  }

  test("weighted pagerank: a skew-weighted 50k star funnels exactly like " +
    "the uniform one; a 50k directed sink chain redistributes in bounds") {
    import graft.operators.PageRank
    // the hot-sink shape again, now with a weight spread (leaf i feeds
    // the hub at weight 1 + i % 9): the per-edge (damped·w) div Σw
    // split must ride the SAME map-side combine — weights change the
    // arithmetic, not the shuffle shape
    val starN = 50000
    val star = StressData.pathPlusStarEdges(spark, pathN = 0, starN = starN)
    val und = star.union(star.select($"dst".as("src"), $"src".as("dst")))
      .withColumn("weight", lit(1L) + pmod($"src" + $"dst", lit(9L)))
      .materialize()
    val t0 = System.nanoTime()
    val n = PageRank.runWeighted(und, iters = 5).count()
    val tw = (System.nanoTime() - t0) / 1e9
    assert(n == starN + 1L)
    // 50k-edge directed chain ending in a sink, redistribution on:
    // the dangling share is ONE broadcast scalar per round, so cost
    // stays one partial-agg shuffle per iteration + a tiny agg
    val chain = StressData.pathPlusStarEdges(spark, pathN = 50000, starN = 0)
      .materialize() // directed: node 50000 is a true sink
    val t1 = System.nanoTime()
    val rd = PageRank.run(chain, iters = 5, redistributeDangling = true)
      .agg(sum($"rank")).as[Long].head()
    val td = (System.nanoTime() - t1) / 1e9
    // redistribution conserves mass within the floor-leak budget even
    // at 50k nodes (the leak bound scales as iters·(3N+E+N))
    val nn = 50001L
    val leak = nn + 5L * (3 * nn + 50000L + nn)
    assert(rd >= PageRank.DefaultScale - leak && rd <= PageRank.DefaultScale,
      s"mass $rd outside [scale-leak, scale]")
    assert(tw < 120 && td < 120,
      f"weighted/dangling stress too slow: $tw%.1fs / $td%.1fs")
    info(f"weighted star(50k) $tw%.1fs; dangling chain(50k) $td%.1fs, " +
      s"leak ${PageRank.DefaultScale - rd} of $leak budget")
  }

  test("sequence packing: a key with 90% of tokens spans the range " +
    "partitions and still matches the window form bit-for-bit") {
    val rows = StressData.skewedPackingRows(spark, n = 100000, hotShare = 0.9)
      .materialize()
    val packed = SequencePacking.withBins(rows, Seq("source"), "doc_id",
      "n_tokens", tokensPerBin = 2048, numPartitions = 32)
    // the property that kills the window form: the hot key's rows run
    // through MANY partitions (parallel), not one task. Same
    // partitioning spec as the operator's pass-1 shuffle.
    val spread = rows.repartitionByRange(32, col("source"), col("doc_id"))
      .select(spark_partition_id().as("p"), col("source"))
      .filter(col("source") === "web").select("p").distinct().count()
    assert(spread > 20, s"hot key spans only $spread of 32 partitions")
    // bit-identical to the single-task window reference
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expected = rows
      .withColumn("cum_tokens", sum(col("n_tokens").cast("long")).over(w))
      .withColumn("bin_id",
        ((col("cum_tokens") - col("n_tokens")) / 2048).cast("long"))
      .select("source", "doc_id", "cum_tokens", "bin_id")
      .as[(String, Long, Long, Long)].collect().toSet
    val got = packed.select("source", "doc_id", "cum_tokens", "bin_id")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    info(s"hot key spread over $spread/32 partitions, 100k rows equal " +
      "to window reference")
  }

  test("IVF on a fat label: learned quantizer balances lists by " +
    "geometry where the label split would put 80% in one list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stress-ivf").toString
    StressData.writeSkewedEmbeddings(spark, dir, n = 5000, dims = 16,
      gClusters = 10)
    val ix = VectorQueries.ivfIndex(spark, dir)
    val sizes = spark.read.parquet(ix.listsPath)
      .groupBy("list_id").count().as[(Int, Long)].collect().toMap
    val total = sizes.values.sum.toDouble
    val maxFrac = sizes.values.max / total
    val labelMaxFrac = spark.read.parquet(s"$dir/embeddings.parquet")
      .groupBy("label").count().as[(Int, Long)].collect()
      .map(_._2).max / total
    info(f"learned lists: ${sizes.size} non-empty, max holds " +
      f"$maxFrac%.2f of corpus (label split would hold $labelMaxFrac%.2f)")
    assert(labelMaxFrac >= 0.75) // the trap is real in this corpus
    assert(maxFrac <= 0.5,
      f"learned quantizer still skewed: max list $maxFrac%.2f")
    assert(sizes.size >= 5, s"only ${sizes.size} non-empty lists")
  }

  test("survivor selection and source matrix keep a 50k-member hot cluster " +
    "as compact aggregation state with exact closed-form results") {
    // one boilerplate cluster mirrored by two feeds (30k + 20k members)
    // plus 10k singletons — the member-pair count is ~1.25×10⁹, so any
    // pairwise formulation times out here while the count-based one is
    // instant. Expected values are closed-form.
    val hot = spark.range(0, 50000L)
      .select(col("id").as("doc_id"),
        when(col("id") < 30000L, "srcA").otherwise("srcB").as("source"),
        lit(0L).as("cluster_id"),
        (col("id") % 97).cast("double").as("quality"))
    val single = spark.range(50000L, 60000L)
      .select(col("id").as("doc_id"), lit("srcS").as("source"),
        col("id").as("cluster_id"), lit(1.0).as("quality"))
    val members = hot.unionAll(single).materialize()
    val surv = DedupQueries.survivorSelect(
        members.select(col("doc_id"), col("quality"), col("cluster_id")))
      .filter(col("cluster_id") === 0L && col("is_survivor"))
      .select(col("doc_id")).as[Long].collect()
    // max quality 96 first reached at doc_id 96; ties resolve to min id
    assert(surv.toSeq == Seq(96L))
    val matrix = DedupQueries.sourceDupMatrix(
        members.select(col("source"), col("cluster_id")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(matrix(("srcA", "srcA")) == 30000L * 29999 / 2)
    assert(matrix(("srcB", "srcB")) == 20000L * 19999 / 2)
    assert(matrix(("srcA", "srcB")) == 30000L * 20000)
    // singletons (m = 1) contribute no pairs at all
    assert(!matrix.keys.exists(k => k._1 == "srcS" || k._2 == "srcS"))
  }

  test("repeated spans: a boilerplate span in 20k docs stays one compact " +
    "reducer key, straddling windows stay doc-unique") {
    val W = DedupQueries.SpanW
    val dir = java.nio.file.Files.createTempDirectory("graft-stress-span").toString
    StressData.boilerSpanDocs(spark, 20000L, W)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val rows = DedupQueries.q97(spark, dir)
      .select(col("n_spans"), col("n_shared")).as[(Long, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 20000)
    // 2W words -> W+1 windows per doc, every doc
    assert(rows.forall(_._1 == W + 1))
    // exactly the boilerplate window is shared — up to the md5-32
    // birthday collisions the scaladoc documents (~(n·(W+1))²/2³³ ≈ 4
    // expected here; each collision inflates two docs' counts by 1)
    val exact = rows.count(_._2 == 1L)
    assert(exact >= 20000 - 50, s"only $exact docs at the closed-form count")
    assert(rows.forall(_._2 <= 3L))
    info(f"20k docs, ${rows.map(_._1).sum}%,d windows in $secs%.1fs; " +
      s"$exact/20000 docs exactly at the closed form")
  }

  test("KMV sketch on 10M heavily-duplicated rows: k-bounded state end to " +
    "end, estimate within the k=256 error band (exact distinct beside it " +
    "for the honest local CPU comparison)") {
    import graft.functions.DedupFunctions
    import graft.operators.KmvSketch
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val k = 256
    val trueDistinct = 200000L
    // 10M rows over 200k distinct keys (50x duplication, skewed by
    // construction of % — the duplicate-heavy shape the sketch's O(1)
    // early-exit reduce is built for)
    val hashes = spark.range(10000000L)
      .select(lit("g").as("g"),
        DedupFunctions.md5Hash32(($"id" % trueDistinct).cast("string")).as("h"))
      .materialize() // generate once; both paths consume it
    val agg = KmvSketch.aggregator(k,
      ExpressionEncoder[List[Long]](), ExpressionEncoder[Seq[Long]]())
    val t0 = System.nanoTime()
    val mins = hashes.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("mins"))
      .collect().head._2
    val tSketch = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val exact = hashes.select($"h").distinct().count()
    val tExact = (System.nanoTime() - t1) / 1e9
    val est = KmvSketch.estimate(mins, k, 1L << 32)
    // md5 collisions over 200k draws from 2^32 shave a few off exact
    assert(exact > trueDistinct - 50 && exact <= trueDistinct)
    val err = math.abs(est.toDouble - exact) / exact
    // deterministic pin (fixed hashes): expected ~1/sqrt(k-2) ≈ 6%
    assert(err < 0.2, s"KMV err $err (est $est vs exact $exact)")
    assert(mins.length == k)
    info(f"10M rows: sketch $tSketch%.1fs (k-bounded shuffle) vs exact " +
      f"distinct $tExact%.1fs; est $est vs $exact (err ${err * 100}%.1f%%)")
  }

  test("AQE skew join: a hot key's partition is split at runtime " +
    "(skew=true in the final adaptive plan), not one straggler task") {
    // the 100 TB skew story this suite otherwise only states: a
    // sort-merge join where one key holds ~97% of the left side must
    // be split by AQE's skew handling. Thresholds are lowered to make
    // the 300k-row shape register as skewed at test scale; the
    // MECHANISM under test (runtime re-plan) is scale-independent.
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // pad must depend on id or constant folding strips it from the
      // shuffle and the hot partition stays beneath the threshold
      val left = spark.range(300000)
        .select((when($"id" % 100 =!= 0, lit(0L)).otherwise($"id") % 10000)
          .as("k"), concat(lit("x" * 64), $"id").as("pad"))
      val right = spark.range(10000).select($"id".as("k"), lit(1L).as("v"))
      val joined = left.hint("merge").join(right, "k")
      // execute THIS dataframe's plan (count()/write() would plan a
      // separate query execution and leave this one un-finalized)
      assert(joined.queryExecution.toRdd.count() == 300000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally restore.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("funnel: a 500k-event hot user is one in-memory sorted walk, " +
    "closed-form result, bounded time") {
    // per-user funnel state is the sorted event array — bounded by one
    // user's activity; this pins that a pathological single-user log
    // stays a single-task linear walk, not a quadratic or OOM path
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stress-funnel").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Array("purchase", "click", "view") // reversed: walk works
    spark.range(500000)
      .select($"id".as("event_id"), lit(1L).as("user_id"),
        element_at(typedLit(types.toSeq), ($"id" % 3 + 1).cast("int"))
          .as("event_type"),
        to_timestamp(from_unixtime(lit(base / 1000) + $"id")).as("ts"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val t0 = System.nanoTime()
    val rows = graft.queries.TimeseriesQueries.q110(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 1)
    def us(sec: Long) = Some((base / 1000 + sec) * 1000000L)
    // first view is event 2, first later click event 4, first later
    // purchase event 6 — the greedy earliest-first closed form
    assert(rows.head == ((1L, 3L, us(2), us(4), us(6))))
    assert(secs < 60.0, f"hot-user funnel took $secs%.1fs")
    info(f"500k-event single-user funnel in $secs%.1fs")
  }

  test("streaming rollingFeatures: a 50k-event in-window hot user is linear " +
    "per batch, and a cross-batch late event honors its own [t-H, t] frame") {
    import graft.streaming.{EventStreams, Ev}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val n = 50000
    // one user, one event per second, all inside the 24h horizon, so
    // every arrival's window is the whole retained state — the shape
    // where per-event O(W) rescans go quadratic (~3.7e9 list-node
    // traversals for this batch) while the merged prefix-sum pass
    // stays O(W + B)
    val hot = (0 until n).map(i =>
      Ev(i.toLong, 1L, "view", new java.sql.Timestamp(base + i * 1000L), 1.0))
    val in = MemoryStream[Ev]
    val q = EventStreams.rollingFeatures(in.toDS())
      .writeStream.format("memory").queryName("rollhot")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = System.nanoTime()
      in.addData(hot: _*); q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(secs < 60.0, f"hot-user batch took $secs%.1fs — not linear")
      val rows = spark.table("rollhot")
        .select($"event_id", $"n_1h", $"sum_centi_1h", $"n_24h", $"sum_centi_24h")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(rows.size == n)
      // closed forms: event i sees min(i+1, 3601) in the 1h frame and
      // i+1 in the 24h frame, at 100 cents each
      assert(rows(49999L) == ((49999L, 3601L, 360100L, 50000L, 5000000L)))
      assert(rows(3600L) == ((3600L, 3601L, 360100L, 3601L, 360100L)))
      // a LATE event lands mid-history in the next micro-batch: its
      // frame is [t−H, t] — the 40k future-timestamped entries already
      // in state must NOT count (the upper bound is enforced, not just
      // the lower one)
      val late = Ev(900000L, 1L, "view",
        new java.sql.Timestamp(base + 10000L * 1000L + 500L), 1.0)
      in.addData(late); q.processAllAvailable()
      val lrow = spark.table("rollhot").filter($"event_id" === 900000L)
        .select($"n_1h", $"sum_centi_1h", $"n_24h", $"sum_centi_24h")
        .as[(Long, Long, Long, Long)].collect().head
      // events 0..10000 precede t=10000.5s; 6401..10000 are inside the
      // 1h frame; plus the late event itself
      assert(lrow == ((3601L, 360100L, 10002L, 1000200L)))
      info(f"50k-event hot-user batch in $secs%.1fs; late-event frame exact")
    } finally q.stop()
  }
}
