package graft

import graft.Materialize.Ops

import graft.operators.{ConnectedComponents, SequencePacking}
import graft.queries.{DedupQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Scale-stress wall-time recorder: the StressSpec shapes, bigger, on
  * local[32] — output is pasted into SCALE.md. Run with
  * `Test/runMain graft.StressBench`.
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("32")
    import spark.implicits._
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    // 1. band-bucket cap: 30k unique near-dups in one bucket
    val lshDir = java.nio.file.Files.createTempDirectory("stressb-lsh").toString
    StressData.writeDocs(spark, lshDir, StressData.hotBucketDocs(30000))
    val sig = timed("minhash 30k docs (300-word template)") {
      val x = DedupQueries.signatures(spark, lshDir).materialize()
      x.count(); x
    }
    val over = timed("oversize monitor") {
      DedupQueries.oversizedBandBuckets(sig, DedupQueries.MaxBandBucket)
        .as[(Int, String, Long)].collect()
    }
    val nCand = timed("capped LSH candidates") {
      DedupQueries.lshCandidates(sig).count()
    }
    println(s"[stress] hot-bucket: hottest=${over.map(_._3).max}, " +
      s"oversized=${over.length}, candidates=$nCand " +
      s"(uncapped would be ~${30000L * 29999 / 2} pairs/band)")

    // 2. connected components: 100k path + 100k star
    val edges = StressData.pathPlusStarEdges(spark, 100000, 100000)
      .materialize()
    val prop = timed("CC label-prop (100k path + 100k star)") {
      ConnectedComponents.run(edges, "src", "dst", maxIter = 30)
        .filter(col("comp") === StressData.PathBase).count()
    }
    val star = timed("CC large/small-star (same graph)") {
      ConnectedComponents.runAlternating(edges, "src", "dst")
        .filter(col("comp") === StressData.PathBase).count()
    }
    println(s"[stress] CC path-component sizes agree: $prop vs $star")

    // 3. sequence packing: 2M rows, one key with 90% of tokens
    val rows = StressData.skewedPackingRows(spark, 2000000, 0.9)
      .materialize()
    timed("pack 2M rows, hot key 90%") {
      SequencePacking.withBins(rows, Seq("source"), "doc_id", "n_tokens",
        tokensPerBin = 2048, numPartitions = 32)
        .write.format("noop").mode("overwrite").save()
    }
    val spread = rows.repartitionByRange(32, col("source"), col("doc_id"))
      .select(spark_partition_id().as("p"), col("source"))
      .filter(col("source") === "web").select("p").distinct().count()
    println(s"[stress] packing hot-key spread: $spread of 32 partitions")

    // 4. IVF build on 100k fat-label vectors
    val ivfDir = java.nio.file.Files.createTempDirectory("stressb-ivf").toString
    StressData.writeSkewedEmbeddings(spark, ivfDir, 100000, dims = 32,
      gClusters = 10)
    val ix = timed("IVF build (k-means quantizer + assign + write) 100k vecs") {
      VectorQueries.ivfIndex(spark, ivfDir)
    }
    val sizes = spark.read.parquet(ix.listsPath)
      .groupBy("list_id").count().as[(Int, Long)].collect().map(_._2)
    println(f"[stress] IVF lists: n=${sizes.length}, " +
      f"max/mean=${sizes.max / (sizes.sum.toDouble / sizes.length)}%.2f, " +
      f"max-frac=${sizes.max / sizes.sum.toDouble}%.2f (label split: 0.80)")

    // 5. greedy subword tokenizer throughput: 500k docs × 200 words
    // (100M words), generated in-executor so the driver never holds the
    // corpus; half the word pool matches vocab pieces, half falls back
    val pool: Array[String] =
      (graft.functions.TextFunctions.SubwordVocab.filter(_.length >= 3) ++
        (0 until 500).map(i => s"zz${i}xq")).toArray
    val docs = spark.range(500000).map { id =>
      val rnd = new scala.util.Random(id)
      val words = Array.fill(200)(pool(rnd.nextInt(pool.length)))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text").materialize()
    val (nWords, nSub) = timed("subword-tokenize 500k docs x 200 words") {
      docs.as[(Long, String)]
        .map { case (_, t) =>
          (t.split("\\s+").count(_.nonEmpty).toLong,
            graft.functions.TextJvm.subwordCountDoc(t))
        }
        .toDF("w", "s").agg(sum("w"), sum("s"))
        .as[(Long, Long)].head()
    }
    println(f"[stress] tokenizer: $nWords%,d words -> $nSub%,d subwords " +
      f"(fertility ${nSub.toDouble / nWords}%.2f)")

    // 6. token-bounded shard export: 1M rows, heavy-tailed weights plus
    // 20 docs each 100x the shard budget (must own their shards, not
    // stall a reducer)
    val shardRows = spark.range(1000000).select(col("id").as("doc_id"),
      (when(pmod(col("id"), lit(50000)) === 0, lit(800000L))
        .otherwise(pmod(org.apache.spark.sql.functions.hash(col("id")),
          lit(400)) + lit(20)))
        .cast("long").as("n_tokens"))
      .materialize()
    val sharded = timed("token-bounded shards: 1M rows, budget 8192") {
      val x = graft.queries.CorpusQueries
        .withShardsByTokens(shardRows, "doc_id", "n_tokens", 8192L)
        .materialize()
      x.count(); x
    }
    val nShards = sharded.agg(max(col("shard_id"))).as[Long].head() + 1
    val oversizedOwn = sharded.filter(col("n_tokens") === 800000L)
      .select(col("shard_id")).distinct().count()
    println(s"[stress] shards: $nShards total, 20 oversized docs in " +
      s"$oversizedOwn distinct shards (greedy: each owns its own)")

    // 7. bigram-novelty shape at scale: the q77 explode + count + join
    // over the SAME 500k×200-word corpus as §5 — ~100M exploded bigram
    // rows through a partial-agg count and a same-key join back
    val novelty = timed("bigram novelty: 500k docs, ~100M bigrams") {
      val bigrams = docs.as[(Long, String)]
        .flatMap { case (id, text) =>
          val ws = text.split("\\s+").filter(_.nonEmpty)
          if (ws.length < 2) Iterator.empty
          else ws.iterator.sliding(2).withPartial(false)
            .map(p => (id, p.head + " " + p.last))
        }
        .toDF("doc_id", "bg")
      val counts = bigrams.groupBy("bg").agg(count(lit(1)).as("n_global"))
      // merge hint: the distinct-bigram table is corpus-sized in a real
      // run, so the scale plan is a sort-merge join on the count key —
      // at this synthetic scale Catalyst's static estimate broadcasts
      // instead, and the build-side collect (the 100M-row side at one
      // point of the estimate curve) blows driver memory; the hint pins
      // the plan a 100 TB run needs
      bigrams.join(counts.hint("merge"), "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), min(col("n_global")).as("mn"))
        .agg(sum(col("n_bigrams")), min(col("mn")))
        .as[(Long, Long)].head()
    }
    println(s"[stress] novelty: ${novelty._1} bigram instances scored, " +
      s"rarest global count ${novelty._2}")

    // 8. survivor selection + source matrix on a 1M-member hot cluster:
    // the boilerplate template mirrored by three feeds. Both operators
    // must keep the cluster as compact aggregation state — survivor
    // via max(struct) (O(1) per cluster), matrix via (cluster, source,
    // m) counts — never enumerating the ~5×10¹¹ member pairs.
    val hot = spark.range(0, 1000000L)
      .select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 3).cast("string")).as("source"),
        lit(0L).as("cluster_id"),
        (col("id") % 97).cast("double").as("quality"))
    val single = spark.range(1000000L, 2000000L)
      .select(col("id").as("doc_id"), lit("srcS").as("source"),
        col("id").as("cluster_id"),
        lit(1.0).as("quality"))
    val members = hot.unionAll(single).materialize()
    val surv = timed("survivor select: 1M-member cluster + 1M singletons") {
      DedupQueries.survivorSelect(
          members.select(col("doc_id"), col("quality"), col("cluster_id")))
        .filter(col("cluster_id") === 0L && col("is_survivor")).count()
    }
    val matrix = timed("source dup matrix: same frame") {
      DedupQueries.sourceDupMatrix(members.select(col("source"), col("cluster_id")))
        .collect()
    }
    val crossAB = matrix
      .find(r => r.getString(0) == "src0" && r.getString(1) == "src1")
      .map(_.getLong(2)).getOrElse(-1L)
    println(s"[stress] survivor rows in hot cluster: $surv (must be 1); " +
      s"matrix rows: ${matrix.length} (6 from the hot cluster, " +
      s"singletons contribute none); src0×src1 pairs=$crossAB")

    // 9. bloom blocklist probe: 1M-entry blocklist, 10M probes.
    // Driver state is the sketch alone — report its size; the probe is
    // a closure-side projection, so throughput is scan-bound.
    val block = spark.range(0, 1000000L)
      .select(concat(lit("sh-"), col("id").cast("string")).as("shingle"))
    val bloom = timed("bloom build: 1M entries") {
      block.stat.bloomFilter("shingle", 1000000L, DedupQueries.BloomFpp)
    }
    val bcB = spark.sparkContext.broadcast(bloom)
    val hits = timed("bloom probe: 10M shingles (50% members)") {
      spark.range(0, 10000000L)
        .select(concat(lit("sh-"), (col("id") % 2000000L).cast("string")).as("s"))
        .as[String]
        .map(s => if (bcB.value.mightContain(s)) 1L else 0L)
        .toDF("h").agg(sum("h")).as[Long].head()
    }
    println(f"[stress] bloom: sketch ${bloom.bitSize() / 8 / 1024}%,d KiB, " +
      f"$hits%,d of 10,000,000 flagged (5M true members + fp)")

    // 10. repeated spans: one boilerplate window shared by 500k docs.
    // The hot hash is ONE reducer key holding 500k (doc, hash) rows —
    // the min!=max decision is O(1) agg state; a per-pair formulation
    // would enumerate ~1.25×10¹¹ doc pairs for this window alone.
    val spanDir = java.nio.file.Files.createTempDirectory("stressb-span").toString
    StressData.boilerSpanDocs(spark, 500000L, DedupQueries.SpanW)
      .write.mode("overwrite").parquet(s"$spanDir/documents.parquet")
    val spanAgg = timed("repeated spans: 500k docs, 4.5M windows, one hot hash") {
      DedupQueries.q97(spark, spanDir)
        .agg(sum(col("n_spans")), sum(col("n_shared")),
          count(when(col("n_shared") === 1L, 1)))
        .as[(Long, Long, Long)].head()
    }
    println(f"[stress] spans: ${spanAgg._1}%,d windows, ${spanAgg._2}%,d " +
      f"shared (closed form 500,000 + md5-32 collisions), " +
      f"${spanAgg._3}%,d/500,000 docs exactly at the closed form")

    // 11. weighted PageRank on a 200k-leaf skew-weighted star and a
    // 200k directed sink chain with dangling redistribution — the
    // round-9 graph shapes, bigger (StressSpec runs 50k)
    val star2 = StressData.pathPlusStarEdges(spark, pathN = 0, starN = 200000)
    val und2 = star2
      .union(star2.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("weight", lit(1L) + pmod(col("src") + col("dst"), lit(9L)))
      .materialize()
    timed("weighted pagerank: 200k-leaf skew-weighted star, 5 iters") {
      graft.operators.PageRank.runWeighted(und2, iters = 5).count()
    }
    val chain2 = StressData.pathPlusStarEdges(spark, pathN = 200000, starN = 0)
      .materialize()
    val mass = timed("dangling redistribution: 200k directed chain, 5 iters") {
      graft.operators.PageRank.run(chain2, iters = 5,
          redistributeDangling = true)
        .agg(sum(col("rank"))).as[Long].head()
    }
    println(f"[stress] dangling mass: $mass%,d of " +
      f"${graft.operators.PageRank.DefaultScale}%,d retained")

    // 12. KMV sketch: 50M rows, 1M distinct — exchange carries k longs
    // per partition; exact distinct beside it for the honest CPU line
    val kHashes = spark.range(50000000L)
      .select(lit("g").as("g"),
        graft.functions.DedupFunctions.md5Hash32(
          (col("id") % 1000000L).cast("string")).as("h"))
      .materialize()
    val kAgg = graft.operators.KmvSketch.aggregator(256,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val kMins = timed("KMV sketch: 50M rows, 1M distinct, k=256") {
      kHashes.as[(String, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(kAgg.toColumn.name("mins")).collect().head._2
    }
    // compare against the constructed universe (1M keys, minus ~116
    // expected md5-32 birthday collisions) — a 50M-row exact DISTINCT
    // here would just re-time the 10M StressSpec case's honest CPU
    // line while fighting this run's accumulated checkpoint memory
    val kEst = graft.operators.KmvSketch.estimate(kMins, 256, 1L << 32)
    val kTrue = 1000000.0
    println(f"[stress] KMV: est $kEst%,d vs ~1,000,000 constructed " +
      f"(err ${math.abs(kEst - kTrue) / kTrue * 100}%.1f%%)")

    // 13. label propagation: 100k path + 100k-leaf star, undirected,
    // 3 synchronous rounds. The hub is the adversarial key: round 1
    // feeds it 100k DISTINCT neighbor labels — the (v,lbl) count agg
    // cannot reduce them map-side, but the argmax stage collapses the
    // 100k pairs into one O(1) max(struct) reducer row; leaves are the
    // opposite shape (one pair each, fully map-side).
    val lpaEdges = StressData.pathPlusStarEdges(spark, 100000, 100000)
    val lpaUnd = lpaEdges
      .union(lpaEdges.select(col("dst").as("src"), col("src").as("dst")))
      .materialize()
    val nComm = timed("label propagation: 100k path + 100k star, 3 rounds") {
      graft.operators.LabelPropagation.run(lpaUnd, iters = 3)
        .select(col("community")).distinct().count()
    }
    println(s"[stress] LPA: $nComm distinct communities " +
      "(star collapses to 1; the path fragments into synchronous-wave chunks)")

    // 14. count-min sketch: 50M token occurrences over 1M distinct
    // keys. The exchange carries one depth*width grid per partition
    // (~8 KiB) — nothing row-shaped shuffles; the cost is the 4
    // codegen'd md5 buckets per occurrence. Exact DISTINCT beside it
    // would re-time §12's case; instead probe 5 keys against the
    // constructed truth (uniform: every key appears 50 times).
    val cmsW = graft.queries.SamplingQueries.CmsWidth
    val cmsD = graft.queries.SamplingQueries.CmsDepth
    val cmsToks = spark.range(50000000L)
      .select(concat(lit("w"), (col("id") % 1000000L).cast("string")).as("w"))
    val cmsAgg = graft.operators.CountMinSketch.aggregator(cmsD, cmsW,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val grid = timed("CMS fold: 50M occurrences, 1M keys, 4x256 grid") {
      cmsToks.select(graft.queries.SamplingQueries.cmsBuckets(col("w")).as("b"))
        .as[Seq[Int]].select(cmsAgg.toColumn.name("g")).head()
    }
    val overs = (0 until 5).map { i =>
      val buckets = (0 until cmsD).map(d =>
        graft.streaming.StreamingSketch.bucketJvm(d, s"w$i"))
      graft.operators.CountMinSketch.estimate(grid, cmsW, buckets) - 50L
    }
    println(f"[stress] CMS: grid sum ${grid.sum}%,d (= 50M x depth), " +
      s"probe overcounts (true 50): ${overs.mkString(",")} — the 256-wide " +
      "grid under 1M keys is saturated BY DESIGN; production sizes " +
      "width=e/eps (the estimate stays one-sided either way)")

    // 15. PQ on the §4 100k-vector corpus: train codebooks, ENCODE ONCE
    // (the production shape — codes are index state like IVF lists,
    // not per-query work), then compare the ADC scan over codes with
    // the exact float-cosine scan. Honest local-vs-cluster note, KMV
    // style: the win to measure is bytes-touched (4 code bytes vs 256
    // float bytes per vector), which is what matters when the corpus
    // doesn't fit in RAM.
    // own 64-dim corpus: the engine's PQ geometry is Dims-derived
    // (4 x 16-dim subspaces) — the §4 corpus is deliberately 32-dim
    val pqDir = java.nio.file.Files.createTempDirectory("stressb-pq").toString
    StressData.writeSkewedEmbeddings(spark, pqDir, 100000,
      dims = graft.queries.VectorQueries.Dims, gClusters = 10)
    import graft.queries.VectorQueries
    val books = timed("PQ codebook training (4 subspaces x 16, 100k corpus)") {
      VectorQueries.pqCodebooks(spark, pqDir)
    }
    val bcBk = spark.sparkContext.broadcast(books)
    val sub = VectorQueries.PqSub
    val codes = timed("PQ encode: 100k vectors -> 4 codes each") {
      val c = Tables.load(spark, pqDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, emb) =>
          val cs = new Array[Int](VectorQueries.PqM)
          var m = 0
          while (m < VectorQueries.PqM) {
            cs(m) = VectorQueries.pqAssign(bcBk.value(m), emb, m * sub)
            m += 1
          }
          (id, cs.toSeq)
        }.toDF("vec_id", "codes").materialize()
      c.count(); c
    }
    val qv = Tables.load(spark, pqDir, "embeddings")
      .filter(col("vec_id") === 0L).select(col("embedding"))
      .as[Array[Float]].head()
    val lut = Array.tabulate(VectorQueries.PqM) { m =>
      books(m).sortBy(_._1).map { case (_, c) =>
        var s = 0.0; var i = 0
        while (i < sub) { s += qv(m * sub + i).toDouble * c(i); i += 1 }
        s
      }
    }
    val bcLut = spark.sparkContext.broadcast(lut)
    timed("ADC scan: 100k code rows, top-20") {
      codes.as[(Long, Seq[Int])]
        .map { case (id, cs) =>
          var s = 0.0; var m = 0
          while (m < VectorQueries.PqM) { s += bcLut.value(m)(cs(m)); m += 1 }
          (id, s)
        }.toDF("vec_id", "adc")
        .orderBy(col("adc").desc, col("vec_id").asc).limit(20)
        .collect()
    }
    timed("exact float-cosine scan: 100k vectors, top-10") {
      VectorQueries.exactTopKDf(spark, pqDir, 0L).collect()
    }

    // 16. k-core peel: 100k path + 100k-leaf star, undirected, k=2,
    // 4 synchronous rounds. The star is the hot-reducer case (one
    // degree-count key holding 100k edge rows — partial agg collapses
    // it map-side); the path is the cascade case (each round only the
    // current endpoints die, alive-set shrinks by 4 per round of the
    // 100k — the fixed-round bound is what keeps the loop from
    // becoming a 50k-round peel-to-fixpoint).
    val kcEdges = StressData.pathPlusStarEdges(spark, 100000, 100000)
    val kcUnd = kcEdges
      .union(kcEdges.select(col("dst").as("src"), col("src").as("dst")))
      .materialize()
    val kc = timed("k-core peel: 100k path + 100k star, k=2, 4 rounds") {
      graft.operators.KCore.peel(kcUnd, k = 2, rounds = 4)
        .groupBy("peel_round").agg(count(lit(1)).as("n"))
        .as[(Option[Long], Long)].collect().toMap
    }
    println(s"[stress] k-core: peel-round counts " +
      s"r1=${kc.get(Some(1L))} r2=${kc.get(Some(2L))} " +
      s"r3=${kc.get(Some(3L))} r4=${kc.get(Some(4L))} " +
      s"survivors=${kc.get(None)} (star: 100k leaves r1 + hub r2; " +
      "path: 2 endpoints per round; middle survives the bounded peel)")

    // 17. exact Gini over 2M keys with a Zipf-ish count law — the
    // rank-free prefix-sum form: no unpartitioned window anywhere,
    // parallelism = 32 range partitions. A window row_number
    // formulation would drag 2M rows through ONE task.
    val skewCounts = spark.range(2000000L)
      .select(col("id").as("k"),
        (lit(2000000L) / (col("id") + 1L) + 1L).cast("long").as("cnt"))
      .materialize()
    val g = timed("gini: 2M keys, zipf counts, distributed prefix sum") {
      graft.queries.SamplingQueries.giniOf(skewCounts)
        .as[(Long, Long, Long, Long, Long)].head()
    }
    println(f"[stress] gini: n=${g._1}%,d total=${g._2}%,d max=${g._3}%,d " +
      f"top1=${g._4 / 10000.0}%.2f%% gini=${g._5 / 1e6}%.4f")

    // 18. co-occurrence degenerate-basket guard: 300k 3-item baskets
    // plus ONE 10k-item cart. Uncapped, the cart alone contributes
    // ~5x10^7 ordered pairs (half the work of the whole run); the
    // basket-size cut drops it before the self-join fans out.
    val normal = spark.range(900000L)
      .select((col("id") / 3L).cast("long").as("o"),
        pmod(org.apache.spark.sql.functions.hash(col("id")), lit(5000L))
          .cast("long").as("p"))
    val cart = spark.range(10000L)
      .select(lit(999999999L).as("o"), (col("id") + 100000L).as("p"))
    val baskets = normal.unionAll(cart).distinct().materialize()
    val nPairs = timed("co-occurrence: 300k baskets + one 10k-item cart, capped") {
      graft.queries.RelationalQueries
        .basketPairs(baskets, graft.queries.RelationalQueries.CoocMaxBasket)
        .count()
    }
    val cartPairs = timed("same frame, cap raised above the cart (the bad plan)") {
      graft.queries.RelationalQueries.basketPairs(baskets, 20000L).count()
    }
    println(f"[stress] co-occurrence: $nPairs%,d supported pairs with the " +
      f"guard vs $cartPairs%,d rows through the agg without it " +
      "(the cart's ~5e7 pairs are sub-support noise either way — the " +
      "guard saves the join fanout, not the output)")

    // 19. HITS on a 1M-edge skewed bipartite graph: 100k customers x
    // ~10 parts each, plus one mega-customer touching every part and
    // one mega-part touched by everyone — both one-key partial-agg
    // hot spots. Linearized half-steps (the q141 fix) keep the 3-round
    // cost 6x one edge pass; the pre-fix exponential lineage would
    // re-evaluate this subtree ~64x.
    val bip = spark.range(1000000L)
      .select((col("id") % 100000L).as("src"),
        pmod(org.apache.spark.sql.functions.hash(col("id")), lit(20000L))
          .cast("long").as("dst"))
      .unionAll(spark.range(20000L)
        .select(lit(999999L).as("src"), col("id").as("dst")))
      .unionAll(spark.range(100000L)
        .select(col("id").as("src"), lit(999999L).as("dst")))
      .distinct().materialize()
    val hitsTop = timed("HITS: 1M-edge skewed bipartite, 3 rounds") {
      graft.operators.Hits.run(bip, iters = 3)
        .filter(col("score") === graft.operators.Hits.Scale)
        .select(col("side"), col("id"))
        .as[(String, Long)].collect().toSet
    }
    println(s"[stress] HITS max-score nodes: $hitsTop (the mega-customer " +
      "and mega-part must top their sides)")
    spark.stop()
  }
}
