package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.functions.DedupFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / sketching operators a corpus pipeline leans on: portable
  * deterministic sampling, heavy hitters, exact quantiles, and an
  * approximate-distinct sketch. All four are oracle-checked: the HLL
  * sketch VALUE is engine-specific, so q46's gate row checks the exact
  * count plus a boolean error-bound assertion, and SamplingSpec pins
  * the raw estimate's error from [[SamplingQueries.q46Detail]].
  */
object SamplingQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q43 — deterministic hash sampling (the reproducible alternative to
    * `df.sample`): a row is in the p% sample iff md5(key) mod 100 < p.
    * Stable across engines, runs, and cluster sizes — the property that
    * matters when a 100 TB pipeline must re-derive the same sample.
    */
  def q43(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("_h", DedupFunctions.md5Hash32(
        concat_ws("-", col("l_orderkey"), col("l_linenumber"))) % 100)
      .filter(col("_h") < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** q44 — heavy hitters: top-3 sources per language by document count,
    * deterministic (count desc, source asc) arbitration.
    */
  def q44(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("lang")
      .orderBy(col("n_docs").desc, col("source").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("lang"), col("source"), col("n_docs"), col("rank").cast("long").as("rank"))
  }

  /** q45 — exact interpolated quantiles per group (`percentile`, the
    * sort-based exact form — linear interpolation, same definition as
    * SQL `quantile_cont`). For 100 TB use `percentile_approx`; the exact
    * form is the oracle-able baseline its error is judged against.
    *
    * The 3-row result is a fingerprint-keyed memo artifact (the
    * basket-tables discipline): q65 judges its sketch against the
    * SAME exact baseline, and a pipeline computes that baseline once.
    */
  def q45(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, "exact-percentiles:" + dir + ":" +
        graft.sources.DatasetFingerprint.ofTable(s, dir, "lineitem")) {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("p"))
        .select(col("l_returnflag"),
          round(element_at(col("p"), 1), 4).as("p50"),
          round(element_at(col("p"), 2), 4).as("p90"),
          round(element_at(col("p"), 3), 4).as("p99"))
        .materialize() // 3 rows
    }

  /** q46 detail — HLL++ approximate distinct vs exact, with the
    * relative error surfaced. The sketch VALUE is engine-specific so it
    * cannot be hash-compared across engines; SamplingSpec pins its
    * error bound from this frame.
    */
  def q46Detail(s: SparkSession, dir: String): DataFrame =
    // one map-side-combined distinct of (flag, part) pairs feeds BOTH
    // counts: the exact count is a plain count over distinct pairs, and
    // the HLL sketch of distinct values has byte-identical registers to
    // a sketch of the raw rows (duplicates hash to the same register),
    // so the estimate is unchanged. This replaces the planner's
    // expand-based distinct-aggregate (which re-aggregates the full
    // table twice) with a single shuffle of already-reduced pairs.
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("exact_parts"))
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"),
        round(abs(col("approx_parts") - col("exact_parts")) /
          col("exact_parts"), 4).as("rel_err"))

  /** q46 — the gate-checkable projection of the sketch comparison: the
    * exact distinct count (plain `count(DISTINCT ...)`, fully
    * oracle-able) plus `approx_ok`, true iff the HLL estimate landed
    * within 5% of exact (rsd 0.02, 2.5× headroom). The oracle asserts
    * `approx_ok = TRUE` for every group, so the sketch's error bound is
    * part of the hash compare even though the sketch value itself is
    * engine-specific.
    */
  def q46(s: SparkSession, dir: String): DataFrame =
    q46Detail(s, dir)
      .select(col("l_returnflag"), col("exact_parts"),
        (col("rel_err") <= 0.05).as("approx_ok"))

  /** Accuracy parameter for the approximate percentile sketch (q65):
    * rank error ≤ n / PercAccuracy.
    */
  val PercAccuracy = 10000

  /** Relative tolerance the q65 gate asserts between the sketch and
    * the exact percentile.
    */
  val PercTolerance = 0.01

  /** q65 — the 100 TB percentile path beside q45's exact baseline:
    * `percentile_approx` (Greenwald-Khanna style mergeable sketch, one
    * partial-agg pass, bounded memory per group) with the same gate
    * discipline as q46: the sketch VALUE is engine-specific, so the
    * oracle row carries the exact interpolated percentiles (fully
    * oracle-able) plus `approx_ok` — true iff every sketch value
    * landed within [[PercTolerance]] of exact. The error bound is part
    * of the hash compare without comparing sketch internals.
    */
  def q65(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), $PercAccuracy)")
        .as("ap"))
    // multiplied form, |ap - p| <= tol * |p|: no division (a zero
    // exact percentile cannot null the gate) and sign-safe for
    // negative-valued columns — unlike /p, which goes vacuously true
    // for p < 0
    def ok(i: Int, p: String) =
      abs(element_at(col("ap"), i) - col(p)) <= abs(col(p)) * PercTolerance
    q45(s, dir).join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("p50"), col("p90"), col("p99"),
        (ok(1, "p50") && ok(2, "p90") && ok(3, "p99")).as("approx_ok"))
  }

  /** KMV sketch size (q114) and the md5Hash32 value space. */
  val KmvK = 256
  val KmvSpace = 1L << 32

  /** q114 — DETERMINISTIC distinct-count sketch (KMV / bottom-k) per
    * source over token hashes: where q46's HLL can only gate within an
    * error bound (register encodings are engine-private), the KMV
    * state is the k smallest distinct hashes — a pure function of the
    * input SET — so estimate AND sketch replay exactly in SQL
    * (`ORDER BY h LIMIT k` per group) and the whole row hash-gates
    * with no `approx_ok` hedge. The estimate is the classic
    * `(k−1)·space div U_k` integer floor; sources with < k distinct
    * hashes short-circuit to the exact count.
    *
    * Scale shape: the query declares BOTH the sketch and its
    * deliberately-expensive exact baseline (distinct pairs, q45/q46
    * discipline), and the KMV state is a pure function of the input
    * SET — so both sides ride ONE tokenize+hash pass and ONE
    * (source, h) distinct exchange: sketching the distinct frame is
    * bit-identical to sketching the raw stream (PropertySpec: the
    * sketch reduces to the k smallest DISTINCT hashes under any
    * order/duplication), and the exact count is a row count of the
    * same frame.
    * The r17 rewrite removed the second full corpus scan the estimate
    * path used to pay (solo A/B in BASELINE.md). A 100 TB deployment
    * running the sketch ALONE uses [[graft.operators.KmvSketch]]'s
    * mergeable map-side shape (≤ k longs per source per partition
    * cross the wire, no corpus-wide DISTINCT) — that shape lives in
    * the streaming twin; here the distinct exchange is already paid
    * for by the exact side.
    */
  def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("source"), DedupFunctions.md5Hash32(col("w")).as("h"))
    val sk = graft.operators.KmvSketch.aggregator(KmvK,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    hashes.distinct().as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(sk.toColumn.name("mins"),
        count(lit(1)).cast("long").as[Long].name("exact_hashes"))
      .map { case (src, mins, exact) =>
        (src, graft.operators.KmvSketch.estimate(mins, KmvK, KmvSpace), exact)
      }
      .toDF("source", "kmv_estimate", "exact_hashes")
      .select(col("source"), col("kmv_estimate"), col("exact_hashes"),
        round(abs(col("kmv_estimate") - col("exact_hashes")).cast("double") /
          col("exact_hashes"), 4).as("rel_err"))
  }

  /** Sketch size for q115's distinct-user KMV — small enough that the
    * sf0.001 gate exercises the below-k EXACT short-circuit (15 users)
    * while sf0.01 exercises the estimator path (150 users): both
    * branches of the sketch are oracle-checked.
    */
  val KmvUserK = 64

  /** q115 — distinct users per event type via the same KMV sketch,
    * over the EVENTS stream table: the online-metrics shape ("unique
    * actives per action type") whose streaming twin
    * ([[graft.streaming.EventStreams.kmvUsersMonitor]]) carries the
    * IDENTICAL sketch state — KMV is a pure function of the input set,
    * so stream and batch agree exactly under any arrival order or
    * micro-batch split (StreamingSpec pins it; contrast the
    * order-caveated funnel/rolling twins).
    */
  def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        DedupFunctions.md5Hash32(col("user_id").cast("string")).as("h"))
    val sk = graft.operators.KmvSketch.aggregator(KmvUserK,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    // one scan + one (type, h) distinct exchange feeds BOTH sides —
    // the q114 single-pass shape (KMV is a pure function of the set)
    hashes.distinct().as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(sk.toColumn.name("mins"),
        count(lit(1)).cast("long").as[Long].name("exact_users"))
      .map { case (tpe, mins, exact) =>
        (tpe, graft.operators.KmvSketch.estimate(mins, KmvUserK, KmvSpace),
          exact)
      }
      .toDF("event_type", "kmv_users", "exact_users")
  }

  /** Count-min sketch grid shape (q116): 4 depth rows × 256 counters.
    * Width 256 is deliberately small for the gate corpus so collisions
    * (and therefore visible positive `overcount`) actually occur —
    * the sketch's defining behavior is exercised, not just its happy
    * path. A production run sizes width = e/ε for the target error.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** How many exact heavy hitters q116 reports. */
  val CmsTopK = 20

  /** The depth-row bucket indices for a key, as a codegen'd Column:
    * `bucket_d = md5("cms<d>-" + key) % width` — the engine-wide
    * 32-bit md5 convention, replayed verbatim by the oracle.
    */
  private[graft] def cmsBuckets(key: org.apache.spark.sql.Column) =
    array((0 until CmsDepth).map(d =>
      (DedupFunctions.md5Hash32(concat(lit(s"cms$d-"), key)) % CmsWidth)
        .cast("int")): _*)

  /** q116 — count-min-sketch frequency estimates vs exact counts for
    * the corpus's top-[[CmsTopK]] tokens: the mergeable POINT-FREQUENCY
    * sketch beside q46/q114's distinct-count sketches and q44's exact
    * heavy hitters. The grid ([[graft.operators.CountMinSketch]]) is a
    * pure order-free function of the token multiset under public md5
    * bucket hashes, so — unlike HLL — estimate rows hash-gate exactly
    * against a full SQL replay (per-depth bucket sums, min across
    * depths), including each token's `overcount` (est − exact ≥ 0, the
    * sketch's one-sided error made visible).
    *
    * Scale shape: the query also declares the exact-count baseline
    * (groupBy token — q46/q65/q114's deliberately-expensive-judge
    * discipline), so since r17 the grid FOLDS FROM that baseline's
    * materialized (token, count) frame by weighted adds — grid cells
    * are sums, so this is bit-identical to the per-occurrence fold
    * (SamplingSpec pin) while paying the depth·md5 draws per VOCAB
    * entry instead of per token occurrence, and scanning the corpus
    * ONCE. The merged grid stays a bounded driver artifact (~8 KiB)
    * re-entering the plan as a literal array; the estimate is
    * codegen'd `least(element_at(...))`. A 100 TB deployment running
    * the grid ALONE (no exact side) uses [[graft.operators.CountMinSketch]]'s
    * per-occurrence map-side shape — every partition reduces to one
    * grid, token rows never shuffle — which is exactly what the
    * streaming twin ([[graft.streaming.EventStreams]]) folds: same
    * rows, IDENTICAL grid in any arrival order (commutative addition,
    * the KMV argument; StreamingSpec pins it against [[cmsGrid]]).
    */
  /** The q116 token stream: one row per token occurrence. Shared with
    * the streaming twin's spec so stream and batch fold the same rows.
    */
  private[graft] def docTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("text"))
      // spread doc rows before the explode: BOTH consumers chain
      // fan-out work onto the sub-4MB documents scan's one partition
      // (the CMS pass pays depth bucket hashes per TOKEN, the exact
      // side a per-token partial agg) — per-doc cost × ~100-token
      // fan-out clears the SCALE.md §20 bar where a flat tokenize
      // pass (q29/q50) did not; the exchange is the raw text column
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)

  /** Fold a token frame into the merged CMS grid — one global typed
    * agg: partial grids merge map-side; the driver receives exactly
    * one depth·width long array (bounded artifact).
    */
  private[graft] def cmsGrid(toks: DataFrame): Seq[Long] = {
    val s = toks.sparkSession
    import s.implicits._
    val cms = graft.operators.CountMinSketch.aggregator(CmsDepth, CmsWidth,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    // the depth bucket hashes run as a TYPED pass (the q167-fold
    // discipline, VERDICT r16): every token occurrence pays CmsDepth
    // md5 draws, and the codegen'd concat→md5→hex-substring→conv
    // chain of [[cmsBuckets]] is the same per-row expression tax the
    // q167 A/B measured at ~2× the raw-digest form
    // ([[DedupFunctions.md5Hash32Jvm]] — bit-identical values, so the
    // grid, the oracle replay, and the streaming twin's column-form
    // fold all still agree). The rows were already crossing a typed
    // boundary into the aggregator, so this swap removes the
    // expression chain without adding a serialization seam.
    toks.select(col("w")).as[String]
      .mapPartitions { it =>
        it.map { w =>
          val bks = new Array[Int](CmsDepth)
          var d = 0
          while (d < CmsDepth) {
            bks(d) = (graft.functions.DedupFunctions
              .md5Hash32Jvm("cms" + d + "-" + w) % CmsWidth).toInt
            d += 1
          }
          bks.toSeq
        }
      }
      .select(cms.toColumn.name("grid")).head()
  }

  /** Fold a (w, exact_cnt) DISTINCT-token frame into the merged CMS
    * grid by WEIGHTED adds — bit-identical to [[cmsGrid]] over the
    * expanded multiset (grid cells are sums; SamplingSpec pins the
    * equality), but the md5 bucket draws run per VOCAB entry instead
    * of per token occurrence, and the corpus is never re-scanned.
    */
  private[graft] def cmsGridFromCounts(counts: DataFrame): Seq[Long] = {
    val s = counts.sparkSession
    import s.implicits._
    val cms = graft.operators.CountMinSketch.weightedAggregator(
      CmsDepth, CmsWidth,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    counts.select(col("w"), col("exact_cnt")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (w, n) =>
          val bks = new Array[Int](CmsDepth)
          var d = 0
          while (d < CmsDepth) {
            bks(d) = (graft.functions.DedupFunctions
              .md5Hash32Jvm("cms" + d + "-" + w) % CmsWidth).toInt
            d += 1
          }
          (bks.toSeq, n)
        }
      }
      .select(cms.toColumn.name("grid")).head()
  }

  def q116(s: SparkSession, dir: String): DataFrame = {
    // ONE tokenize pass: the exact-baseline (w, count) aggregation —
    // which the query declares anyway — is materialized (vocab-sized)
    // and the grid folds from it with weighted adds; the r16-era form
    // re-scanned and re-tokenized the corpus for the grid and paid
    // CmsDepth md5 draws per token OCCURRENCE (r17 A/B, BASELINE.md
    // "q116 counts-driven grid"). Per-occurrence map-side grids remain
    // the standalone/streaming shape (CountMinSketch docstring,
    // EventStreams twin).
    val counts = docTokens(s, dir)
      .groupBy("w").agg(count(lit(1)).as("exact_cnt"))
      .materialize()
    val grid: Seq[Long] = cmsGridFromCounts(counts)
    val gridLit = typedLit(grid)
    // global top-k: TakeOrderedAndProject (distributed sort-limit),
    // never a single-partition window over the vocab-sized frame;
    // the rank window runs over the already-limited K rows
    val top = counts.orderBy(col("exact_cnt").desc, col("w").asc)
      .limit(CmsTopK)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("exact_cnt").desc, col("w").asc)).cast("long"))
    val est = (0 until CmsDepth)
      .map(d => element_at(gridLit,
        (lit(d * CmsWidth) + element_at(cmsBuckets(col("w")), d + 1) + 1)
          .cast("int")))
      .reduceLeft(least(_, _))
    top.select(col("w").as("token"), col("exact_cnt"),
        est.as("cms_est"), (est - col("exact_cnt")).as("overcount"),
        col("rank"))
  }

  /** q138 — KEY-SKEW AUDIT with an exact GINI coefficient: the
    * popularity distribution of `l_partkey` summarized as key count,
    * row total, the hottest key's absolute count and corpus share, and
    * the exact Gini concentration index in 10⁻⁶ fixed point — the
    * skew diagnostic that decides whether a join/agg on this key needs
    * salting ([[graft.operators.SaltedAgg]]) or AQE skew splitting,
    * measured instead of guessed.
    *
    * The trick that makes it scale: Gini is normally "sort, rank,
    * Σ rank·xᵢ" — a global sort plus an UNPARTITIONED window (one
    * task). But with Sᵢ the inclusive prefix sums in ascending
    * (count, key) order, `Σ i·xᵢ = (n+1)·T − Σ Sᵢ`, so
    * `G = (2Σi·xᵢ − (n+1)T) / (nT) = ((n+1)T − 2ΣSᵢ) / (nT)` needs
    * ONLY the prefix-sum column —
    * [[graft.operators.SequencePacking.withBins]]'s two-pass
    * distributed cumsum (parallelism = range partitions, the q135
    * machinery), then a single scalar aggregate. Equal counts → 0;
    * one key owning every row → (n−1)/n; exact integer floor division
    * end-to-end.
    *
    * Scale shape: one partial-agg shuffle (key counts — keys-sized
    * output), the operator's range shuffle over the KEY table (not
    * the corpus), and a one-row reduce. DECIMAL(38,0) sums: ΣSᵢ is
    * O(n·T) and exceeds 2⁶³ at web scale (the q121 lesson).
    */
  /** The q138 core over any (k, cnt) frame — factored so StressBench
    * can drive the distributed-prefix-sum Gini at adversarial key
    * counts. `cnt · 10⁹ + k` must stay collision-free and
    * monotone in (cnt, k): counts are corpus-bounded and keys
    * lake-bounded, both < 10⁹ here (guarded by the expression).
    */
  private[graft] def giniOf(counts: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val packed = graft.operators.SequencePacking
      .withBins(counts.withColumn("ord", expr("cnt * 1000000000L + k")),
        Seq.empty, "ord", "cnt", Long.MaxValue / 4)
    packed
      .agg(count(lit(1)).cast(dec).as("n"),
        max(col("cum_tokens")).cast(dec).as("t"),
        sum(col("cum_tokens")).cast(dec).as("ss"),
        max(col("cnt")).cast(dec).as("mx"))
      .select(
        col("n").cast("long").as("n_keys"),
        col("t").cast("long").as("total_rows"),
        col("mx").cast("long").as("max_count"),
        expr("CAST((mx * 1000000) div t AS BIGINT)").as("top1_share_1e6"),
        expr("CAST((((n + 1) * t - 2 * ss) * 1000000) div (n * t) AS BIGINT)")
          .as("gini_1e6"))
  }

  def q138(s: SparkSession, dir: String): DataFrame =
    giniOf(t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("cnt")))

  /** q175's per-stratum sample size. */
  val StratAesK = 5

  /** q175 — STRATIFIED WEIGHTED SAMPLING WITHOUT REPLACEMENT: exactly
    * [[StratAesK]] documents PER SOURCE, sampled proportional to
    * `n_chars` — q161's Efraimidis–Spirakis A-ES keys (hash-uniform
    * `u`, key `ln(u)/w`, top-k by key) fused with q63's bounded
    * per-group top-k: the per-source token-proportional eval/seed
    * sample every curation pipeline draws ("5 representative docs per
    * source, long docs proportionally likelier"). q53 stratifies
    * UNWEIGHTED and q161 weights WITHOUT strata; this is the missing
    * quadrant, and the hash-derived keys make it reproducible across
    * engines and runs.
    *
    * Scale shape: one projection computes keys; the per-source cut is
    * [[graft.operators.TopKPerGroup]]'s k-bounded typed buffers —
    * map-side partial aggregation caps every partition at k rows per
    * source before the one exchange. No window, no per-source sort.
    */
  def q175(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = (DedupFunctions.md5Hash32(
      concat(lit("saes-"), col("doc_id").cast("string"))) + lit(1L))
      .cast("double") / lit(4294967296.0)
    val scored = Tables.documents(s, dir)
      .filter(col("n_chars") > 0L)
      .select(col("source"), col("doc_id"), col("n_chars"),
        (log(u) / col("n_chars").cast("double")).as("skey"))
    val agg = graft.operators.TopKPerGroup.topK[(Double, Long, Long)](
      StratAesK, Ordering.by { case (sk, id, _) => (-sk, id) })
    scored.as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._4, r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case ((sk, id, nc), i) =>
          (src, (i + 1).toLong, id, nc, sk)
        }
      }
      .toDF("source", "rank", "doc_id", "n_chars", "skey_raw")
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        round(col("skey_raw"), 9).as("skey"))
  }

  /** q185 — EXACT GROUPED QUANTILES WITHOUT PER-GROUP BUFFERS: the
    * per-type exact median and p90 of value-cents, computed from a
    * VALUE histogram (count per distinct cent amount) plus a
    * cumulative rank scan — the third point on the repo's quantile
    * spectrum and the one that survives 100 TB groups: q45's exact
    * `percentile` buffers every row of a group in one agg state (its
    * documented memory bound), q65 trades exactness for a sketch;
    * this is EXACT and its state is |distinct values| per type, which
    * for a bounded domain (cents, ints, enums, anything quantized) is
    * O(domain), independent of row count — the q62/q179 histogram-
    * rank discipline promoted to a general quantile operator.
    * Quantiles are type-1 order statistics (first value whose
    * cumulative count reaches ⌈p·n⌉) — integers end to end.
    *
    * Scale shape: one partial-agg pass to the (type, value) histogram
    * — the ONLY shuffle rows are distinct values; the rank window
    * runs per type over histogram rows.
    */
  def q185(s: SparkSession, dir: String): DataFrame = {
    val cum = Tables.events(s, dir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
    cum.groupBy("event_type")
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("v")))
          .as("median_cents"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("v")))
          .as("p90_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q185_histogram_quantiles" -> (q185 _),
    "q175_stratified_weighted" -> (q175 _),
    "q138_skew_gini" -> (q138 _),
    "q43_hash_sample" -> (q43 _),
    "q44_heavy_hitters" -> (q44 _),
    "q45_percentiles" -> (q45 _),
    "q46_approx_distinct" -> (q46 _),
    "q65_percentiles_approx" -> (q65 _),
    "q114_kmv_distinct" -> (q114 _),
    "q115_kmv_users" -> (q115 _),
    "q116_cms_heavy_hitters" -> (q116 _))

  val oracles: Map[String, String] = Map(
    "q185_histogram_quantiles" ->
      """WITH h AS (
        | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS c
        | FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        | SELECT *, CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        | FROM h)
        |SELECT event_type, max(n) AS n,
        | CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT)
        |   AS median_cents,
        | CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS BIGINT)
        |   AS p90_cents
        |FROM cum GROUP BY 1""".stripMargin,
    "q175_stratified_weighted" ->
      s"""WITH sc AS (
        | SELECT source, doc_id, n_chars,
        |  ln((CAST(concat('0x', substr(md5(concat('saes-',
        |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1) / 4294967296.0)
        |   / CAST(n_chars AS DOUBLE) AS skey
        | FROM documents WHERE n_chars > 0),
        |rk AS (
        | SELECT source, doc_id, n_chars, skey,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY skey DESC, doc_id ASC) AS BIGINT) AS rank
        | FROM sc)
        |SELECT source, rank, doc_id, n_chars, round(skey, 9) AS skey
        |FROM rk WHERE rank <= $StratAesK""".stripMargin,
    "q138_skew_gini" ->
      """WITH c AS (
        | SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS cnt
        | FROM lineitem GROUP BY 1),
        |s AS (
        | SELECT cnt, sum(cnt) OVER (ORDER BY cnt, k
        |   ROWS UNBOUNDED PRECEDING) AS cum
        | FROM c),
        |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(cnt) AS HUGEINT) AS t,
        |  CAST(sum(cum) AS HUGEINT) AS ss,
        |  CAST(max(cnt) AS HUGEINT) AS mx FROM s)
        |SELECT CAST(n AS BIGINT) AS n_keys, CAST(t AS BIGINT) AS total_rows,
        | CAST(mx AS BIGINT) AS max_count,
        | CAST((mx * 1000000) // t AS BIGINT) AS top1_share_1e6,
        | CAST((((n + 1) * t - 2 * ss) * 1000000) // (n * t) AS BIGINT) AS gini_1e6
        |FROM a""".stripMargin,
    "q116_cms_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
         |    w -> len(w) > 0)) AS w
         |  FROM documents),
         |cnts AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
         |         FROM toks GROUP BY 1),
         |bk AS (SELECT c.w, c.exact_cnt, d.d,
         |   CAST(concat('0x', substr(md5(concat('cms', CAST(d.d AS VARCHAR),
         |     '-', c.w)), 1, 8)) AS BIGINT) % $CmsWidth AS bucket
         |  FROM cnts c CROSS JOIN
         |    (SELECT unnest(range(0, $CmsDepth)) AS d) d),
         |bs AS (SELECT d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS bsum
         |       FROM bk GROUP BY 1, 2),
         |est AS (SELECT b.w, CAST(min(s.bsum) AS BIGINT) AS cms_est
         |        FROM bk b JOIN bs s ON b.d = s.d AND b.bucket = s.bucket
         |        GROUP BY 1),
         |top AS (SELECT w, exact_cnt,
         |         row_number() OVER (ORDER BY exact_cnt DESC, w ASC) AS rank
         |        FROM cnts)
         |SELECT t.w AS token, t.exact_cnt, e.cms_est,
         | CAST(e.cms_est - t.exact_cnt AS BIGINT) AS overcount,
         | CAST(t.rank AS BIGINT) AS rank
         |FROM top t JOIN est e ON t.w = e.w
         |WHERE t.rank <= $CmsTopK""".stripMargin,
    "q115_kmv_users" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT event_type,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
         |       FROM pairs GROUP BY 1),
         |rk AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |       FROM pairs),
         |kv AS (SELECT event_type, CAST(max(h) AS BIGINT) AS kth,
         |        CAST(count(*) AS BIGINT) AS nmin
         |       FROM rk WHERE rn <= $KmvUserK GROUP BY 1)
         |SELECT e.event_type,
         | CAST(CASE WHEN k.nmin < $KmvUserK THEN k.nmin
         |  ELSE CAST(${(KmvUserK - 1).toLong * KmvSpace} AS BIGINT)
         |    // greatest(k.kth, 1) END AS BIGINT) AS kmv_users,
         | e.exact_users
         |FROM ex e JOIN kv k ON e.event_type = k.event_type""".stripMargin,
    "q114_kmv_distinct" ->
      s"""WITH toks AS (
         |  SELECT source,
         |    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
         |      w -> len(w) > 0)) AS w
         |  FROM documents),
         |pairs AS (
         |  SELECT DISTINCT source,
         |    CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) AS h
         |  FROM toks),
         |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_hashes
         |       FROM pairs GROUP BY 1),
         |rk AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |       FROM pairs),
         |kv AS (SELECT source, CAST(max(h) AS BIGINT) AS kth,
         |        CAST(count(*) AS BIGINT) AS nmin
         |       FROM rk WHERE rn <= $KmvK GROUP BY 1),
         |j AS (
         | SELECT e.source,
         |  CAST(CASE WHEN k.nmin < $KmvK THEN k.nmin
         |   ELSE CAST(${(KmvK - 1).toLong * KmvSpace} AS BIGINT)
         |     // greatest(k.kth, 1) END AS BIGINT) AS kmv_estimate,
         |  e.exact_hashes
         | FROM ex e JOIN kv k ON e.source = k.source)
         |SELECT source, kmv_estimate, exact_hashes,
         | round(abs(kmv_estimate - exact_hashes)
         |   / CAST(exact_hashes AS DOUBLE), 4) AS rel_err
         |FROM j""".stripMargin,
    "q46_approx_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q43_hash_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE CAST(concat('0x', substr(md5(concat_ws('-', l_orderkey, l_linenumber)), 1, 8)) AS BIGINT) % 100 < 10""".stripMargin,
    "q44_heavy_hitters" ->
      """WITH c AS (
        | SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        | FROM documents GROUP BY lang, source),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY lang
        |   ORDER BY n_docs DESC, source ASC) AS rank FROM c)
        |SELECT lang, source, n_docs, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3""".stripMargin,
    "q65_percentiles_approx" ->
      """WITH q AS (
        | SELECT l_returnflag,
        |  CAST(quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS DOUBLE[]) AS p
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | round(p[1], 4) AS p50, round(p[2], 4) AS p90, round(p[3], 4) AS p99,
        | TRUE AS approx_ok
        |FROM q""".stripMargin,
    "q45_percentiles" ->
      """WITH q AS (
        | SELECT l_returnflag,
        |  CAST(quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS DOUBLE[]) AS p
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | round(p[1], 4) AS p50, round(p[2], 4) AS p90, round(p[3], 4) AS p99
        |FROM q""".stripMargin)
}
