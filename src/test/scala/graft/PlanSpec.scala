package graft

import graft.queries.{DedupQueries, RelationalQueries, TimeseriesQueries}

/** Plan-shape guards: the physical plans the 100 TB design depends on.
  * These assert the properties (pushdown, broadcast, top-k without
  * global sort), not exact plan text — they should survive Spark
  * upgrades but fail if a refactor silently loses an optimization.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filters and projection reach the parquet scan") {
    val p = plan(RelationalQueries.q02(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // column pruning: the scan must not read all 16 lineitem columns
    assert(!p.contains("l_comment"))
  }

  test("q06: dimension joins broadcast, no shuffle join on dims") {
    val p = plan(RelationalQueries.q06(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("r_name"))
  }

  test("q04: top-n plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalQueries.q04(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("GlobalSort"))
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan(RelationalQueries.q01(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2) // partial + final
  }

  test("q10: first/last-per-group is one aggregation, no window sort") {
    val p = plan(TimeseriesQueries.q10(spark, sf))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(!p.contains("Window"))
  }

  test("q29: signature pipeline is materialized once, not recomputed per branch") {
    // signatures are localCheckpointed: every branch of the band
    // self-join reads the materialized blocks (an RDD scan), and the
    // shingle/md5/fold pipeline appears nowhere in the outer plan
    val p = plan(DedupQueries.q29(spark, sf))
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("md5"))
  }

  test("q50: contamination membership test is a semi-join, nothing pairwise") {
    val p = plan(DedupQueries.q50(spark, sf))
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("whole-stage codegen covers the scan-filter-project hot path") {
    // `*(n)` is the codegen-stage marker in executedPlan.toString
    val p = plan(RelationalQueries.q02(spark, sf))
    assert(p.contains("*(1)"))
  }

  test("q59: rate table broadcasts onto the corpus, no shuffle join") {
    val p = plan(graft.queries.CorpusQueries.q59(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q60: split assignment is a pure projection, zero exchanges") {
    val p = plan(graft.queries.CorpusQueries.q60(spark, sf))
    assert(!p.contains("Exchange"))
  }

  test("q63: top-k per group is a bounded typed agg, not a window sort") {
    // partial + final ObjectHashAggregate: the shuffle carries ≤k rows
    // per (map partition, group); a Window plan would sort every group
    val p = plan(graft.queries.CorpusQueries.q63(spark, sf))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("Window"))
  }

  test("q66: multi-probe ANN is one pruned scan + broadcast, top-k without a global sort") {
    // the probed-bucket set is a driver-side literal list: the corpus
    // side must stay a single filtered scan (no self-join shuffle), the
    // query vector a broadcast, and the top-k a TakeOrderedAndProject
    val p = plan(graft.queries.VectorQueries.q66(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("ShuffleExchange") && !p.contains("SortMergeJoin"))
  }

  test("q67: PII scrub is a pure projection, zero exchanges") {
    val p = plan(graft.queries.TextQueries.q67(spark, sf))
    assert(!p.contains("Exchange"))
    assert(p.contains("*(1)")) // one codegen stage covers the whole scrub
  }

  test("q69: chunk dedup marks shared chunks via semi-join over ONE chunk materialization") {
    // the flatMap chunking pass is localCheckpointed: all three
    // consumers (shared-hash agg, per-doc totals, dup marking) read the
    // materialized (doc_id, md5) pairs — text is chunked exactly once
    // and nothing pairwise touches the corpus. Both joins are pinned
    // sort-merge: shared hashes AND per-doc counts scale with the
    // corpus, so an estimate-driven broadcast of either is a scale bug
    val p = plan(DedupQueries.q69(spark, sf))
    assert(p.contains("LeftSemi"))
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q81: survivor selection is agg + pinned sort-merge, nothing pairwise") {
    // the per-cluster best is a partial-agg (max of a (quality, -id)
    // struct — O(1) state per cluster), and the member join is pinned
    // sort-merge: both sides scale with the corpus and the checkpointed
    // input is stats-blind, so an estimate-driven broadcast would be
    // the q77 scale bug again
    val p = plan(DedupQueries.q81(spark, sf))
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window")) // no per-cluster sort; agg carries the tie-break
  }

  test("q91: weighted sample cumsum is the two-pass prefix sum, no global window") {
    val p = plan(graft.queries.CorpusQueries.q91(spark, sf))
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q90: per-source top-k rides the bounded typed agg, never a window sort") {
    val p = plan(graft.queries.CorpusQueries.q90(spark, sf))
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q88: adaptive gate windows the lang histogram, broadcasts the bars") {
    // the rank windows run over the (lang, quality) HISTOGRAM (bounded
    // by 4dp quality), partitioned by lang; the corpus itself is never
    // sorted, and the ≤ n_langs bar table broadcasts back
    val p = plan(graft.queries.CorpusQueries.q88(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q82: epoch plan broadcasts the rate table, corpus is one narrow pass") {
    // the ≤ n_sources-row rate table broadcasts back onto the
    // tokenization scan; the corpus itself is never window-sorted or
    // self-joined
    val p = plan(graft.queries.CorpusQueries.q82(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q70: subword counting is one narrow typed pass, zero exchanges") {
    val p = plan(graft.queries.TextQueries.q70(spark, sf))
    assert(!p.contains("Exchange"))
  }

  test("q73: token-weighted mixture broadcasts the rate table like q59") {
    val p = plan(graft.queries.CorpusQueries.q73(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q74: IVF-blocked near-dup shuffles on list_id only, nothing cartesian") {
    // the pairwise work rides a list_id-keyed join over the materialized
    // index — no cross join, no nested-loop; the quadratic term is
    // confined within lists by construction
    val p = plan(graft.queries.VectorQueries.q74(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("list_id"))
  }

  test("q76: version diff joins compact hash rows, nothing cartesian") {
    val p = plan(graft.queries.CorpusQueries.q76(spark, sf))
    assert(p.contains("FullOuter") || p.contains("full_outer"), p.take(500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q77: bigram novelty sort-merges on the count key — the distinct-" +
    "bigram table must NEVER broadcast (it is corpus-sized at scale)") {
    val p = plan(graft.queries.TextQueries.q77(spark, sf))
    // partial + final aggregate on the bigram key before anything joins
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("q86: dup matrix never enumerates member pairs or broadcasts corpus frames") {
    // the pair terms come from (cluster, source, m) count rows joined
    // on the cluster key — pinned sort-merge (both sides descend from
    // the stats-blind checkpoint); the docs⋈labels join upstream may
    // broadcast the PARQUET side at this sf because its stats are real
    // — that choice reverts to sort-merge at scale on its own
    val p = plan(DedupQueries.q86(spark, sf))
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q85: bloom probe joins nothing on the corpus side except a broadcast") {
    // the membership test itself is closure-side (no join at all); the
    // only shingle-keyed join is the gate's broadcast of the bounded
    // eval set — corpus shingles must never sort-merge or go cartesian
    val p = plan(DedupQueries.q85(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q84: chunk scrub is a pure per-document pass, zero exchanges") {
    val p = plan(DedupQueries.q84(spark, sf))
    assert(!p.contains("Exchange") && !p.contains("Join"))
  }

  test("q87: decontam scrub's corpus side is a pure pass, blocklist in closure") {
    val p = plan(DedupQueries.q87(spark, sf))
    assert(!p.contains("Exchange") && !p.contains("Join"))
  }

  test("q89: quantized retrieval is one typed pass + top-k, no joins") {
    // membership in the float top-k folds back as a 10-id literal
    // predicate, not a join; the top-k is TakeOrderedAndProject
    val p = plan(graft.queries.VectorQueries.q89(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
  }

  test("q83: truncation audit is one narrow typed pass, zero exchanges") {
    // the reference vector rides the closure (one-row driver lookup,
    // the IVF-centroid discipline) — the per-vector audit itself never
    // shuffles or joins
    val p = plan(graft.queries.VectorQueries.q83(spark, sf))
    assert(!p.contains("Exchange") && !p.contains("Join"))
  }

  test("q79/q80: fertility and quant audit never window or cross-join") {
    val p79 = plan(graft.queries.TextQueries.q79(spark, sf))
    assert(!p79.contains("Window") && !p79.contains("CartesianProduct"))
    // q80 is a pure narrow typed pass: zero exchanges
    val p80 = plan(graft.queries.VectorQueries.q80(spark, sf))
    assert(!p80.contains("Exchange"))
  }

  test("q56: IVF probe is a partition-pruned scan of the probed lists only") {
    // the index build (full-corpus assignment) happens once at ivfIndex
    // build time; the probe's parquet scan must prune on list_id at the
    // DIRECTORY level — no non-probed list's files are opened
    val p = plan(graft.queries.VectorQueries.q56(spark, sf))
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(p).isDefined, p)
  }

  test("DPP: the day-partitioned lake join prunes fact partitions from " +
    "the filtered dim side (J3/q08 deployment shape — at 100 TB the " +
    "date-partitioned fact must never full-scan under a dim filter)") {
    import org.apache.spark.sql.functions._
    // the production lake layout this models: the fact table written
    // day-partitioned (F8/q26's strftime partitions), joined to a dim
    // carrying the date filter — exactly how a deployment scopes a
    // reprocessing window without enumerating paths
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    graft.Tables.load(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = spark.read.parquet(dir)
    val allDays = fact.select("day").distinct()
      .collect().map(_.getDate(0)).sortBy(_.getTime)
    assert(allDays.length >= 5, "need several day partitions for pruning")
    val hot = allDays.take(2).toSet
    // the dim must be a real scan: a LocalRelation's filter constant-
    // folds away and DPP sees no selective predicate to reuse
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppd").toString
    spark.createDataFrame(allDays.toSeq.map(d =>
      (d, if (hot(d)) "hot" else "cold"))).toDF("day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tag") === "hot"), "day")
    val p = plan(joined)
    assert(p.contains("dynamicpruning"),
      s"no dynamicpruning subquery in the partitioned-fact join plan:\n$p")
    // and it actually prunes: only the hot days' rows come back
    val expected = fact.filter(col("day").isin(hot.toSeq.map(lit): _*)).count()
    assert(joined.count() == expected && expected > 0)
  }

  test("IVF index lifecycle: deterministic path, adopted across memo " +
    "evictions without a rebuild") {
    import graft.queries.{QueryMemo, VectorQueries}
    val path = VectorQueries.ivfIndexPath(spark, sf)
    val first = VectorQueries.ivfIndex(spark, sf)
    assert(first.listsPath == path)
    val marker = java.nio.file.Paths.get(path, "_GRAFT_INDEX_DONE")
    val built = java.nio.file.Files.getLastModifiedTime(marker)
    // simulate eviction / a fresh session: the memo entry is gone, but
    // the deterministic on-disk index is adopted, not rebuilt (the
    // _SUCCESS marker's mtime is untouched) and carries the same
    // quantizer centroids
    QueryMemo.invalidate(spark, VectorQueries.ivfMemoKey(spark, sf))
    val second = VectorQueries.ivfIndex(spark, sf)
    assert(second.listsPath == path)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == built)
    assert(second.cents.map(_._1).toSeq == first.cents.map(_._1).toSeq)
    assert(second.cents.map(_._2.toSeq).toSeq ==
      first.cents.map(_._2.toSeq).toSeq)
  }

  test("q57: packing is a two-pass prefix sum, not a per-source window sort") {
    // the window form serializes each source through ONE task; the
    // SequencePacking plan is a narrow map over the pinned range
    // partitioning — no Window node anywhere in the physical plan
    val p = plan(graft.queries.TextQueries.q57(spark, sf))
    assert(!p.contains("Window"))
    assert(p.contains("Scan ExistingRDD"))
  }

  test("q62: bucket thresholds broadcast, corpus is never globally sorted") {
    // the only Sort allowed is inside the tiny histogram window; the
    // document-side bucket assignment must be a broadcast of the 1-row
    // threshold frame, not a sort/ntile over the corpus
    val p = plan(graft.queries.CorpusQueries.q62(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("ntile"))
  }

  test("q94: BM25 cut is top-k over the checkpointed stats pass, no window") {
    // the text pass is localCheckpointed (Scan ExistingRDD) so scoring
    // never re-reads the corpus; the cut is a per-partition heap merge,
    // not a global sort
    val p = plan(graft.queries.SearchQueries.q94(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("q96: classifier inference is a pure typed pass, zero exchanges") {
    val p = plan(graft.queries.SearchQueries.q96(spark, sf))
    assert(!p.contains("Exchange"))
  }

  test("q97: span sharing sort-merges on the hash key, nothing corpus-broadcast") {
    // both join inputs are corpus-sized and stats-blind behind the
    // checkpoint — a stats-guess broadcast here is the q77 failure mode
    val p = plan(graft.queries.DedupQueries.q97(spark, sf))
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q95: rollup is one Expand feeding one partial-agg exchange") {
    // grouping sets expand BEFORE the shuffle so the map-side combine
    // absorbs the 3x row fan-out; three separate scans would be the
    // reference's per-level stats-job shape
    val p = plan(graft.queries.CorpusQueries.q95(spark, sf))
    assert(p.contains("Expand"))
    assert("Exchange".r.findAllIn(p).size == 1)
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("q98: pivot with an explicit value list — one scan, no distinct pre-pass") {
    val p = plan(graft.queries.CorpusQueries.q98(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Window"))
  }

  test("q100: fuzzy join is candidate-join + verify, never all-pairs") {
    val p = plan(graft.queries.SearchQueries.q100(spark, sf))
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q99: negatives cut rides the bounded typed agg over one broadcast batch") {
    val p = plan(graft.queries.VectorQueries.q99(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"))
  }

  test("q102: all three running aggregates share one user_id exchange and " +
    "one Window node") {
    val p = plan(graft.queries.TimeseriesQueries.q102(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1)
    assert("Window".r.findAllIn(p).size == 1)
  }

  test("q105: both rolling horizons share ONE user_id exchange (two frame " +
    "specs stack over the same sort, no second shuffle)") {
    val p = plan(TimeseriesQueries.q105(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1)
    // Spark folds BOTH range-frame specs into a single Window node
    // (same partition + ordering): one exchange, one sort, one buffer
    assert("Window".r.findAllIn(p).size == 1)
    assert("Sort".r.findAllIn(p).size == 1)
  }

  test("q106: overlap chunking is one narrow typed pass, zero exchanges") {
    val p = plan(graft.queries.CorpusQueries.q106(spark, sf))
    assert(!p.contains("Exchange"))
  }

  test("q110: funnel is ONE user_id exchange + one sorted typed pass; " +
    "the step-type filter reaches the parquet scan") {
    val p = plan(TimeseriesQueries.q110(spark, sf))
    // the whole k-step funnel costs one shuffle — the oracle's chained
    // min-agg JOIN replay would cost k+1
    assert("Exchange".r.findAllIn(p).size == 1)
    assert(p.contains("MapGroups"))
    // event_type IN (...) and ts IS NOT NULL push to the scan
    assert(p.contains("PushedFilters") && p.contains("In(event_type"))
  }

  test("q111: cohort cells aggregate with plain partial count — no " +
    "distinct-aggregate buffer (the (user, week) pairs are pre-distinct)") {
    val p = plan(TimeseriesQueries.q111(spark, sf))
    assert(!p.toLowerCase.contains("count(distinct"))
    assert(!p.contains("Expand")) // no distinct-agg rewrite
    assert(p.contains("partial_count") || p.contains("partial count")
      || "HashAggregate".r.findAllIn(p).nonEmpty)
  }

  test("q116: top-k is TakeOrderedAndProject; the rank window runs over " +
    "the already-limited K rows, never the vocab") {
    val p = plan(graft.queries.SamplingQueries.q116(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    // the only Window input is the K-row limit output — pinned by the
    // window appearing AFTER the take in the plan tree (child position)
    val win = p.indexOf("Window")
    val take = p.indexOf("TakeOrderedAndProject")
    assert(win >= 0 && take > win,
      "rank window must sit above the TakeOrdered, not over the vocab")
  }

  test("q118: WAV encode+decode is one typed pass over the id spread — " +
    "exactly the round-robin exchange, payload bytes never shuffle " +
    "(the q40/q55 shape, enabled by WavCodec killing the AudioSystem lock)") {
    val p = plan(graft.queries.MultimodalQueries.q118(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1)
    assert(p.contains("RoundRobinPartitioning"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("q40/q55: AVI encode+decode is one typed pass over the id spread — " +
    "exactly the round-robin exchange, payload bytes never shuffle") {
    // the only exchange is the 8-byte-id repartition BEFORE the codec
    // pass (realAviMedia's spread); a second exchange would mean
    // container payloads crossing the wire
    for (df <- Seq(graft.queries.MultimodalQueries.q40(spark, sf),
                   graft.queries.MultimodalQueries.q55(spark, sf))) {
      val p = plan(df)
      assert("Exchange".r.findAllIn(p).size == 1)
      assert(p.contains("RoundRobinPartitioning"))
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
    }
  }

  test("q119: normalization is one narrow typed pass, zero exchanges") {
    val p = plan(graft.queries.TextQueries.q119(spark, sf))
    assert(!p.contains("Exchange"))
  }

  test("q120: unigram joins stay sort-merge (stats-blind vocab is never " +
    "broadcast), top-k is TakeOrdered") {
    val p = plan(graft.queries.TextQueries.q120(spark, sf))
    assert("SortMergeJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q121: OLS is ONE partial-agg exchange over dense per-partition " +
    "long partials; the model algebra runs on the k-group result") {
    val p = plan(RelationalQueries.q121(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2) // partial + final
    assert(p.contains("MapPartitions")) // the r17 dense-partial typed pass
    assert(!p.contains("Window"))
  }

  test("q162: six column-pruned scans (one per profiled column), no " +
    "distinct-aggregate Expand") {
    val p = plan(RelationalQueries.q162(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 6)
    assert(!p.contains("Expand"))
    assert(!p.toLowerCase.contains("count(distinct"))
  }

  test("q163: the heavy skyline prune runs salt-partitioned; only the " +
    "survivor pass is a global window") {
    val p = plan(TimeseriesQueries.q163(spark, sf))
    assert("Window \\[".r.findAllIn(p).size == 4)
    // the deepest two windows (local prune) partition by salt — the
    // global two run above a Filter over the pruned survivors
    assert(p.contains("windowspecdefinition(salt"))
    assert(p.contains("Exchange hashpartitioning(salt"))
  }

  test("q164: both median joins broadcast the per-type medians back, " +
    "never a shuffle join") {
    val p = plan(TimeseriesQueries.q164(spark, sf))
    // 3 = deviations⋈med for the MAD agg, deviations⋈med again for the
    // counting pass (lineage recompute — scans are column-pruned and
    // cheaper than materializing the deviation table), final ⋈mad
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q165: attribution is one user-window exchange plus the rollup — " +
    "no join, no purchase-touch fanout; the type filter pushes to the scan") {
    val p = plan(TimeseriesQueries.q165(spark, sf))
    assert("Exchange".r.findAllIn(p).size == 2)
    assert(!p.contains("Join"))
    assert(p.contains("In(event_type"))
  }

  test("q166: the scoring pass is ONE typed fold over the corpus scan — " +
    "no bigram explode, no join, no aggregate, no exchange past the spread") {
    // the fit side (explode → partial agg → vocab collect) already ran
    // at plan() time; the LIVE plan is only the score side (VERDICT
    // r15 item 3): scan → spread → MapPartitions fold → project.
    val p = plan(graft.queries.TextQueries.q166(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(p.contains("MapPartitions"))
    assert(!p.contains("Join"))          // the model rides a broadcast VARIABLE, not a join
    assert(!p.contains("HashAggregate")) // one row per doc needs no re-agg
    // the only exchange is the deliberate §20 fan-out spread
    assert("Exchange".r.findAllIn(p).size == 1)
    assert(p.contains("RoundRobinPartitioning"))
  }

  test("q160: each relationship audits both directions in ONE " +
    "full-outer join — no anti joins, no crossJoin stitch") {
    val p = plan(RelationalQueries.q160(spark, sf))
    assert("FullOuter".r.findAllIn(p).size == 3)
    assert(!p.contains("LeftAnti"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q116/q166: the fan-out passes are spread across session " +
    "parallelism before the explode (the §20 fan-out rider)") {
    // since the r17 counts-driven grid, q116's declared frame reads the
    // materialized (token, count) checkpoint — the spread lives in the
    // tokenize+count job that produces it, so pin THAT frame's plan
    val pToks = plan(graft.queries.SamplingQueries.docTokens(spark, sf))
    assert(pToks.contains("RoundRobinPartitioning"))
    // and the declared q116 plan is the residual top-k over the
    // checkpoint: one scan of ExistingRDD, no second corpus scan
    val p116 = plan(graft.queries.SamplingQueries.q116(spark, sf))
    assert(p116.contains("Scan ExistingRDD"))
    assert(!p116.contains("Scan parquet"))
    // q166's fit-pass spread sits behind the bigram checkpoint; the
    // surviving scoring pass carries the same spread in the live plan
    val p166 = plan(graft.queries.TextQueries.q166(spark, sf))
    assert(p166.contains("RoundRobinPartitioning"))
  }

  test("q167: the x200 replica pass is a typed fold that collapses " +
    "map-side — no explode rows; the rank window partitions by segment") {
    val p = plan(RelationalQueries.q167(spark, sf))
    // the draws fold inside MapPartitions into |segments|·B partials
    // per task (VERDICT r16 A/B) — no Generate, no per-draw rows
    assert(p.contains("MapPartitions"))
    assert(!p.contains("Generate explode"))
    assert("HashAggregate".r.findAllIn(p).size >= 4) // final agg + point estimate + CI
    assert(p.contains("windowspecdefinition(c_mktsegment"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q168: the dictionary checkpoints once; both passes window over " +
    "blocks; count-joins broadcast — never a shuffle join") {
    // plan the cold body: the public q168 serves the memoized pair
    // artifact (one ExistingRDD scan), which q184 shares
    val p = plan(DedupQueries.q168Cold(spark, sf))
    assert(p.contains("Scan ExistingRDD")) // the checkpointed dictionary
    assert(!p.contains("Scan parquet"))    // part is never re-scanned
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    val served = plan(DedupQueries.q168(spark, sf))
    assert(served.contains("Scan ExistingRDD"))
    assert(!served.contains("Scan parquet"))
  }

  test("q169: CDC is ONE narrow typed pass (per-doc O(len) rolling " +
    "loop) into the chunk-hash rollup — no join, no per-char rows") {
    val p = plan(DedupQueries.q169(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"))
  }

  test("q170: sessionize+rank share one user exchange; top-k is " +
    "TakeOrdered over the checkpointed path dictionary") {
    val p = plan(TimeseriesQueries.q170(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("Scan ExistingRDD"))
    assert("Scan parquet".r.findAllIn(p).size == 0)
  }

  test("q171: train assembly is one scan and one user rollup — no " +
    "features-labels self-join, no Expand") {
    val p = plan(TimeseriesQueries.q171(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
    assert(!p.contains("Expand"))
  }

  test("q172: smoothing runs on the checkpointed cell table (9x explode " +
    "of cells, never of events); top-k is TakeOrdered") {
    val p = plan(TimeseriesQueries.q172(spark, sf))
    assert(!p.contains("Scan parquet")) // events rolled up at checkpoint
    assert(p.contains("Generate"))      // the 3x3 offset explode
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q173: peak extraction joins the broadcast per-type totals onto " +
    "the checkpointed profile — no window, no second corpus pass") {
    val p = plan(TimeseriesQueries.q173(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Window"))
  }

  test("q174: one pair-generation pass (checkpointed) feeds both union " +
    "arms; the per-part cut is the bounded typed top-k, not a window sort") {
    val p = plan(RelationalQueries.q174(spark, sf))
    assert(!p.contains("Scan parquet")) // pairs built once, at checkpoint
    assert(!p.contains("Window"))
    // TopKPerGroup plans as partial+final ObjectHashAggregate — the
    // k-bounded buffers combine map-side before the exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2)
  }

  test("q175: stratified weighted sample is one scan into k-bounded " +
    "typed buffers (partial+final ObjectHashAggregate, no window sort)") {
    val p = plan(graft.queries.SamplingQueries.q175(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2)
    assert(!p.contains("Window"))
  }

  test("q176: the EWMA backtest runs entirely on the checkpointed daily " +
    "rollup — banded self-join broadcasts, events never rejoin") {
    val p = plan(TimeseriesQueries.q176(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q177: latency quantiles share one stage exchange (rank + count " +
    "windows stack); the funnel table is checkpointed, events never rescan") {
    val p = plan(TimeseriesQueries.q177(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert("Exchange".r.findAllIn(p).size == 1)
    assert("Window \\[".r.findAllIn(p).size == 2)
  }

  test("q178: eval card derives everything from the checkpointed " +
    "confusion matrix — marginal joins broadcast, corpus never rejoins") {
    val p = plan(graft.queries.TextQueries.q178(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q179: three sort-free histogram threshold rows broadcast onto " +
    "the checkpointed RFM rollup — the user base is never ntile-sorted") {
    val p = plan(TimeseriesQueries.q179(spark, sf))
    assert(!p.contains("Scan parquet"))
    // the 1-row threshold frames cross in as broadcast nested loops
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 3)
    // windows run on the VALUE histograms, not per-user rows
    assert("Window ".r.findAllIn(p).size == 6)
  }

  test("q180: HHI is the part dimension broadcast onto one fact scan " +
    "plus two partial-agg exchanges — the share algebra never joins back") {
    val p = plan(RelationalQueries.q180(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 2)
    assert(p.contains("BroadcastHashJoin"))
    // 3 = the dimension BroadcastExchange + two partial-agg shuffles
    assert("Exchange".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q181: burst detection is one rollup exchange plus one per-type " +
    "RANGE window over the hourly table — events cross once") {
    val p = plan(TimeseriesQueries.q181(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("Window ".r.findAllIn(p).size == 1)
    assert(p.contains("RangeFrame"))
  }

  test("q182: containment runs on the checkpointed chunk-hash set; " +
    "candidate pairing is hash-bounded, never all-pairs") {
    val p = plan(DedupQueries.q182(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q183: attribution is one conditional-agg pass (checkpointed) " +
    "with the one-row total broadcast back; the rank window sees " +
    "|segments| rows") {
    val p = plan(RelationalQueries.q183(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(p.contains("BroadcastExchange"))
    assert("Window ".r.findAllIn(p).size == 1)
  }

  test("q184: golden records run on the name dictionary — survivorship " +
    "window partitions by component, records never rejoin") {
    val p = plan(DedupQueries.q184(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(p.contains("windowspecdefinition(comp"))
  }

  test("q185: exact quantiles shuffle only distinct values (histogram " +
    "partial agg before the exchange); no per-group percentile buffer") {
    val p = plan(graft.queries.SamplingQueries.q185(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.toLowerCase.contains("percentile"))
    assert("HashAggregate".r.findAllIn(p).size >= 2) // partial + final
    assert(p.contains("windowspecdefinition(event_type"))
  }

  test("q186: perceptual near-dup runs on the checkpointed hash frame " +
    "with capped band buckets — never an all-pairs image compare") {
    val p = plan(graft.queries.MultimodalQueries.q186(spark, sf))
    assert(!p.contains("Scan parquet")) // decode+hash ran at checkpoint
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("bit_count")) // exact verify, not approximate
  }

  test("q187: TWAP is one user window + one rollup; the integral " +
    "accumulates in decimal partial aggs") {
    val p = plan(TimeseriesQueries.q187(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("Window ".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
  }

  test("q188: CUSUM's two detector windows stack over ONE per-type sort " +
    "on the checkpointed daily rollup; reference rates broadcast") {
    val p = plan(TimeseriesQueries.q188(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(p.contains("BroadcastHashJoin"))
    // prefix-sum + running-min collapse into one Window node (same
    // partition + ordering); the reference pass adds its own
    assert("Window ".r.findAllIn(p).size <= 3)
  }

  test("q189: SRM is one distinct rollup and a per-type card — no join, " +
    "no window") {
    val p = plan(TimeseriesQueries.q189(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q190: the covariance partial agg is the only corpus-sized " +
    "shuffle; every iteration joins 4096-row frames with the vector " +
    "broadcast or tiny") {
    val p = plan(graft.queries.VectorQueries.q190(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 0) // cov checkpointed
    assert(!p.contains("CartesianProduct"))
  }

  test("q191/q192: the Lloyd rounds ran once at fit time (broadcast " +
    "centroid joins inside the checkpoints); both reports are rollups " +
    "over the checkpointed distance table") {
    Seq(graft.queries.VectorQueries.q191(spark, sf),
        graft.queries.VectorQueries.q192(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Scan parquet"))
      assert(p.contains("Scan ExistingRDD"))
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q193: validation derives everything from the checkpointed " +
    "contingency table; the ARI algebra runs on one-row frames") {
    val p = plan(graft.queries.VectorQueries.q193(spark, sf))
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q194: growth accounting is one distinct rollup + one user lag " +
    "window; the identity window runs on the |weeks|-row card") {
    val p = plan(TimeseriesQueries.q194(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
    assert(p.contains("windowspecdefinition(user_id"))
  }

  test("q195: seasonal strength is one rollup + one per-type RANGE " +
    "window; the variance algebra is a partial agg, no second pass") {
    val p = plan(TimeseriesQueries.q195(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(p.contains("RangeFrame"))
    assert(!p.contains("Join"))
  }

  test("q196: Spearman is one scoring pass, two rank windows, and a " +
    "one-row moment card — no join, no second corpus scan") {
    val p = plan(graft.queries.CorpusQueries.q196(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
  }

  test("q197: Benford is one scan into a 9-row digit histogram; the " +
    "expectation table is literal — no join") {
    val p = plan(RelationalQueries.q197(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"))
  }

  test("q199: hotspot clustering runs on the checkpointed dense-cell " +
    "table (adjacency, CC, rollup) — event volume crosses once") {
    val p = plan(TimeseriesQueries.q199(spark, sf))
    assert(!p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q200: the dataset card's row-count branches are column-pruned " +
    "to empty schemas — counting never reads data columns") {
    val p = plan(graft.queries.CorpusQueries.q200(spark, sf))
    assert(p.contains("ReadSchema: struct<>"))
    assert(!p.contains("Join"))
  }

  test("q126/q128: experiment readouts are two partial-agg exchanges " +
    "(per-user rollup + arm moments), no pivot, no self-join, no window") {
    Seq(TimeseriesQueries.q126(spark, sf),
        TimeseriesQueries.q128(spark, sf)).foreach { df =>
      val p = plan(df)
      assert("Exchange".r.findAllIn(p).size == 2, p.linesIterator.take(30).mkString("\n"))
      assert(!p.contains("Window"))
      assert(!p.contains("Join"))
      assert("Scan parquet".r.findAllIn(p).size == 1)
    }
  }

  test("q31/q113/q147 + the q107/q127 edge build: the sorted-intersect " +
    "merge walk appears EXACTLY ONCE per plan (the r17 projection-split " +
    "discipline is load-bearing but was unpinned — VERDICT r17 item 2)") {
    // The win relies on CollapseProject DECLINING to inline a non-cheap
    // multi-referenced alias: q113's five consumers reference the walk
    // through its alias in a separate projection. A Spark upgrade or
    // rule change that re-merges the projections would silently
    // quintuple the walk (measured: codegen CSE did NOT deduplicate the
    // repeated custom expression; q113 solo 9.96 → 6.03 task-s on the
    // split alone). Count the expression in the FINAL plan text:
    // exactly one occurrence, not zero (the fold must stay native) and
    // not N (no re-inline).
    Seq(
      "q31" -> DedupQueries.q31(spark, sf),
      "q113" -> DedupQueries.q113(spark, sf),
      "q147" -> DedupQueries.q147(spark, sf),
      // q107/q127 consume the walk through the memoized weighted-edge
      // artifact, so their FINAL plans scan the checkpoint — pin the
      // builder frame itself
      "weightedCandidatesCold" ->
        DedupQueries.weightedCandidatesCold(spark, sf)
    ).foreach { case (name, df) =>
      val p = plan(df)
      val n = "sorted_intersect_size".r.findAllIn(p).size
      assert(n == 1,
        s"$name: expected exactly 1 sorted_intersect_size in the final " +
          s"plan, found $n\n${p.linesIterator.take(40).mkString("\n")}")
    }
  }
}
