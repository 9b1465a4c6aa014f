package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.functions.{DedupFunctions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the steps between a scored/deduped
  * document lake and a training run: domain-mixture resampling,
  * deterministic train/val/test splitting, character-entropy quality
  * scoring, and curriculum bucketing by quality quantile.
  *
  * All four follow the repo's portability discipline: every sampling
  * decision is md5-derived from stable keys (reproducible across
  * engines, runs, and cluster sizes), every threshold is computed with
  * integer or exact-double arithmetic shared verbatim with the DuckDB
  * oracle, and nothing does a global sort over the corpus.
  */
object CorpusQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-myriad (basis-point × 100) resolution of mixture keep-rates. */
  val MixBps = 10000

  /** q59 — domain-mixture resampling: rebalance the corpus toward a
    * UNIFORM language mixture by down-sampling over-represented
    * languages. keep_rate(lang) = min(1, target/n_lang) with
    * target = total/n_langs, quantized to [[MixBps]]ths; a document
    * survives iff md5("mix-"+doc_id) mod [[MixBps]] < quantized rate —
    * the deterministic coin every engine flips identically.
    *
    * Scale shape: the rate table is a ≤ n_langs-row aggregate
    * (partial-agg shuffle) broadcast back onto the corpus; the corpus
    * itself is touched in ONE narrow filter pass — no global sort, no
    * per-language repartition. The same plan at 100 TB broadcasts a
    * few-hundred-row rate table against every scan partition.
    */
  def q59(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
    val rates = mixtureKeepBps(
      docs.groupBy("lang").agg(count(lit(1)).as("w")))
      .withColumnRenamed("w", "n_docs")
    val kept = docs
      .join(broadcast(rates.select(col("lang"), col("keep_bps"))), "lang")
      .filter(mixCoin < col("keep_bps"))
      .groupBy("lang").agg(count(lit(1)).as("kept_docs"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("keep_bps"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"))
  }

  /** The deterministic per-document mixture coin: md5("mix-"+doc_id)
    * mod [[MixBps]] — identical on every engine, shared by q59 and q73.
    */
  private def mixCoin: Column =
    DedupFunctions.md5Hash32(
      concat(lit("mix-"), col("doc_id").cast("string"))) % MixBps

  /** Uniform-mixture keep-rates from per-language WEIGHTS `(lang, w)` —
    * the rate table both q59 (w = doc count) and q73 (w = subword
    * tokens) derive: keep_bps = round(min(1, (Σw/n_langs)/w)·[[MixBps]]).
    * A ≤ n_langs-row frame; the windows run over that aggregate, never
    * the corpus.
    */
  private[graft] def mixtureKeepBps(weights: DataFrame): DataFrame = {
    val win = Window.partitionBy()
    weights
      .withColumn("target",
        sum(col("w")).over(win).cast("double") /
          count(lit(1)).over(win).cast("double"))
      .withColumn("keep_bps",
        round(least(lit(1.0), col("target") / col("w").cast("double"))
          * MixBps, 0).cast("long"))
      .select(col("lang"), col("w"), col("keep_bps"))
  }

  /** q73 — TOKEN-weighted mixture resampling: q59's rebalance recomputed
    * on subword-accurate token counts (q70's greedy tokenizer) instead
    * of document counts. keep_rate(lang) = min(1, target/lang_tokens)
    * with target = total_tokens/n_langs; the same md5 coin decides
    * survival, and the report shows tokens kept per language. Document
    * counts and token counts are NOT proportional across languages
    * (doc-length and tokenizer-fertility both vary by language), so the
    * two rate tables genuinely differ — CorpusSpec pins the divergence;
    * this is the mixture a token-budgeted pretraining run actually
    * wants. Same scale shape as q59: one typed scoring scan, a
    * broadcast rate table, one narrow filter pass.
    */
  def q73(s: SparkSession, dir: String): DataFrame = {
    // one tokenization scan, materialized: the rate aggregate AND the
    // kept filter both read it — without the checkpoint each branch
    // would re-run the greedy subword pass over the whole corpus
    val docs = TextQueries.subwordCounts(s, dir)
      .select(col("doc_id"), col("lang"), col("n_subword"))
      .materialize()
    val rates = mixtureKeepBps(
      docs.groupBy("lang").agg(sum(col("n_subword")).as("w")))
    val kept = docs
      .join(broadcast(rates.select(col("lang"), col("keep_bps"))), "lang")
      .filter(mixCoin < col("keep_bps"))
      .groupBy("lang").agg(sum(col("n_subword")).as("kept_tokens"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("w").as("n_tokens"), col("keep_bps"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  /** Train/val/test per-cent cut points (q60): <98 train, <99 val. */
  val TrainPct = 98
  val ValPct = 99

  /** q60 — deterministic train/val/test split: every document lands in
    * exactly one split by md5("split-"+doc_id) mod 100 — stable under
    * re-runs, engine changes, and corpus growth (existing docs never
    * migrate when new ones arrive, unlike any rank- or shuffle-based
    * split). One narrow projection, no shuffle at all.
    */
  def q60(s: SparkSession, dir: String): DataFrame = {
    val h = DedupFunctions.md5Hash32(
      concat(lit("split-"), col("doc_id").cast("string"))) % 100
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        when(h < TrainPct, "train").when(h < ValPct, "val")
          .otherwise("test").as("split"))
  }

  /** q61 — character-unigram entropy (bits/char), the classic
    * gibberish/boilerplate quality signal beside q34's ratio scores and
    * q52's repetition metrics. One narrow typed pass per document: a
    * single JVM loop counts characters, then folds −Σ p·log2 p over
    * characters in codepoint order — the same left-to-right double fold
    * the oracle's `list_reduce` runs, so the rounded value is
    * engine-portable (the repo-wide fold-order discipline).
    */
  def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one narrow typed pass; the fold lives in TextJvm.charEntropyRaw
    // (codepoint iteration, ascending-codepoint left-to-right sum) so
    // the corpus scoring job shares the exact same definition
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.functions.TextJvm.lenCodepoints(text),
          graft.functions.TextJvm.charEntropyRaw(text))
      }
      .toDF("doc_id", "len_chars", "entropy_raw")
      .select(col("doc_id"), col("len_chars"),
        round(col("entropy_raw"), 4).as("entropy"))
  }

  /** Number of curriculum buckets (q62). */
  val NBuckets = 4

  /** q62 — curriculum buckets: quartile the corpus by quality score
    * WITHOUT a global sort. The heavy pass is a partial-agg groupBy on
    * the (4-dp, ≤10k distinct) quality value; the quantile thresholds
    * are extracted from that tiny histogram with pure INTEGER
    * arithmetic (cum ≥ ceil(k·N/4) as `(k·N+3) div 4` — no interpolated
    * doubles whose last-ulp could differ between engines), then
    * broadcast back for a narrow bucket-assignment pass. The same plan
    * at 100 TB is two corpus scans + a driver-sized histogram, where a
    * global `ntile` would be one giant sort.
    */
  def q62(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    val hist = scored.groupBy("quality").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val tCols = (1 until NBuckets).map { k =>
      min(when(col("cum") >= expr(s"($k * n + ${NBuckets - 1}) div $NBuckets"),
        col("quality"))).as(s"t$k")
    }
    val thresholds = cum.agg(tCols.head, tCols.tail: _*)
    scored.crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("quality"),
        (lit(1L) + (1 until NBuckets)
          .map(k => (col("quality") > col(s"t$k")).cast("long"))
          .reduce(_ + _)).as("bucket"))
  }

  /** Per-group selection size (q63). */
  val TopKDocs = 3

  /** q63 — top-[[TopKDocs]] documents by quality per source, via
    * [[graft.operators.TopKPerGroup]]'s bounded typed aggregator
    * instead of the window-sort recipe. The shuffle carries at most
    * k rows per (map partition, source) — partial aggregation bounds
    * the buffer BEFORE the exchange — and nothing sorts the corpus;
    * `row_number()` over a window would shuffle and sort every row of
    * every group for a k-row answer. Order: quality desc, doc_id asc
    * (total, deterministic).
    */
  def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = graft.operators.TopKPerGroup.topK[(Double, Long)](
      TopKDocs, Ordering.by { case (q, id) => (-q, id) })
    t(s, dir, "documents")
      .select(col("source"), TextFunctions.qualityScore(col("text")),
        col("doc_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case ((q, id), i) =>
          (src, id, q, (i + 1).toLong)
        }
      }
      .toDF("source", "doc_id", "quality", "rank")
  }

  /** Result size for the n-gram vocabulary query (q64). */
  val TopNgrams = 20

  /** q64 — corpus-level top-[[TopNgrams]] word bigrams: the vocabulary
    * mining pass behind tokenizer training and boilerplate discovery
    * (a bigram appearing in thousands of documents is template text).
    * One narrow typed flatMap per document (the column-lambda
    * `wordShingles` form runs INTERPRETED on this corpus-wide hot path
    * — measured 10× slower) → partial-agg count (map-side combined) →
    * global top-k as TakeOrderedAndProject — no global sort; ties
    * break on the bigram text so the cut is deterministic.
    */
  def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("text")).as[String]
      .flatMap { text =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 2) Iterator.empty
        else Iterator.range(0, ws.length - 1).map(i => ws(i) + " " + ws(i + 1))
      }
      .toDF("ngram")
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(TopNgrams)
  }

  /** Documents per output shard (q68). */
  val ShardDocs = 64L

  /** q68 — deterministic corpus shuffle + shard assignment: the
    * training-order randomization a pretraining run needs before
    * writing shard files. Order is md5(doc_id) — a reproducible
    * pseudo-random permutation (same everywhere, unlike `df.sample`/
    * `rand()`) — and each contiguous run of [[ShardDocs]] docs in that
    * order becomes one shard.
    *
    * Scale shape: the global rank is NOT a `row_number` over an
    * unpartitioned window (one task holding the corpus). It reuses
    * [[graft.operators.SequencePacking]]'s two-pass distributed prefix
    * sum with a single global key and unit weights: range-partition on
    * the hash order, per-partition counts to the driver, seeded narrow
    * local cumsum — the hash order spans every partition and
    * parallelism stays `numPartitions` at any corpus size. The 32-char
    * md5 is concatenated with the zero-padded doc_id so the single
    * range/order column still totally orders (hash, doc_id).
    */
  def q68(s: SparkSession, dir: String): DataFrame =
    withShards(t(s, dir, "documents").select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("global_rank"),
        col("shard_id"), col("pos_in_shard"))

  /** Append `global_rank`/`shard_id`/`pos_in_shard` to ANY frame with a
    * unique integral id — the reusable form of q68 (the corpus-prepare
    * pipeline shards its packed train split through the same code).
    * All input columns ride along untouched.
    */
  def withShards(df: DataFrame, idCol: String): DataFrame = {
    val ordered = df
      .withColumn("ord", concat(md5(col(idCol).cast("string")),
        lpad(col(idCol).cast("string"), 20, "0")))
      .withColumn("one", lit(1L))
    graft.operators.SequencePacking
      .withBins(ordered, keyCols = Seq.empty, orderCol = "ord",
        tokensCol = "one", tokensPerBin = ShardDocs)
      .withColumn("global_rank", col("cum_tokens"))
      .withColumn("shard_id", col("bin_id"))
      .withColumn("pos_in_shard", (col("cum_tokens") - 1) % ShardDocs)
      .drop("ord", "one", "cum_tokens", "bin_id")
  }

  /** TOKEN-bounded variant of [[withShards]]: the same md5-order global
    * permutation, but shards cut by a token budget instead of a doc
    * count (greedy fill, oversized docs own their shards — the
    * [[graft.operators.SequencePacking]] bin contract with one global
    * key). Real trainers provision shards by tokens/bytes, not by row
    * count: 64 docs can be 3k or 300k tokens. Rows carry `shard_id`
    * plus `cum_tokens_global` — the weighted running sum, strictly
    * increasing along the permutation (weights ≥ 1), so a consumer
    * orders within a shard by it and never relies on file order.
    */
  def withShardsByTokens(df: DataFrame, idCol: String, tokensCol: String,
                         tokensPerShard: Long): DataFrame = {
    val ordered = df
      .withColumn("ord", concat(md5(col(idCol).cast("string")),
        lpad(col(idCol).cast("string"), 20, "0")))
    graft.operators.SequencePacking
      .withBins(ordered, keyCols = Seq.empty, orderCol = "ord",
        tokensCol = tokensCol, tokensPerBin = tokensPerShard)
      .withColumn("shard_id", col("bin_id"))
      .withColumn("cum_tokens_global", col("cum_tokens"))
      .drop("ord", "cum_tokens", "bin_id")
  }

  /** Content-hash diff of two corpus versions — the primitive behind
    * incremental processing (process only `added`/`changed`, retire
    * `removed`, skip `unchanged`): one full-outer join on the id with
    * an md5 compare. Text never moves — each side reduces to (id, md5)
    * before the join, so at 100 TB the shuffle carries 48-byte rows.
    */
  def versionDiff(prev: DataFrame, cur: DataFrame): DataFrame =
    cur.join(prev, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_prev").isNull, "added")
          .when(col("h_cur").isNull, "removed")
          .when(col("h_cur") =!= col("h_prev"), "changed")
          .otherwise("unchanged").as("status"))

  /** q76's deterministic synthetic "previous version": docs whose id is
    * divisible by [[DiffAddedMod]] do not exist yet, docs divisible by
    * [[DiffChangedMod]] carried a " v1" suffix. Both engines derive the
    * same previous version, so the oracle hash-match proves the diff
    * logic — the q67-injection discipline (the lake has one version;
    * the operator under test is [[versionDiff]], not the synthesis).
    */
  val DiffAddedMod = 7
  val DiffChangedMod = 5

  /** q76 — corpus version diff: per-document added/changed/unchanged
    * status between the synthetic previous version and the current
    * corpus ("removed" has no synthetic member here; CorpusSpec
    * exercises that arm on constructed frames). This is the gate a
    * scheduled corpus-prepare run consults to touch only the delta —
    * the reference's ledger freshness idea (`idempotent_process_gtfs_
    * data.py:13-37`) applied at document granularity.
    */
  def q76(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cur = docs.select(col("doc_id"), md5(col("text")).as("h_cur"))
    val prev = docs
      .filter(col("doc_id") % DiffAddedMod =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % DiffChangedMod === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
          .as("h_prev"))
    versionDiff(prev, cur)
  }

  /** The literal target mixture (basis points per source, summing to
    * [[MixBps]]) — the hand-written "data recipe" a pretraining run
    * starts from: a few head domains carry most of the weight, a long
    * tail shares the rest. A literal constant interpolated into both
    * engines (the MinHash-constant discipline).
    */
  val TargetMixBps: Seq[(String, Long)] =
    Seq("src0" -> 3000L, "src1" -> 1500L, "src2" -> 1000L,
      "src3" -> 800L, "src4" -> 600L, "src5" -> 500L, "src6" -> 400L,
      "src7" -> 300L, "src8" -> 200L, "src9" -> 100L) ++
      (10 to 19).map(i => s"src$i" -> 160L)

  /** Max repetitions of any source before the plan caps it (the "no
    * more than N epochs over a domain" rule — repeating data much past
    * ~4 epochs stops helping and starts hurting).
    */
  val MaxEpochs = 3

  /** q82 — epoch-capped mixture PLAN: per-source repetition factors
    * that realize [[TargetMixBps]] from the measured token counts,
    * capped at [[MaxEpochs]] epochs. q59/q73 can only DOWN-sample
    * toward uniform; a real recipe also UP-samples scarce domains —
    * epochs(src) = tgt_share · total_tokens / src_tokens, expressed in
    * [[MixBps]]ths (epochs_bps 25000 = repeat 2.5×). Each document gets
    * floor(epochs) copies plus one more iff its md5 coin clears the
    * fractional remainder, so the realized counts are exact integers
    * any engine reproduces. Output: the per-source plan (tokens,
    * target, epochs, capped) and the realized copy/token counts.
    *
    * Scale shape: one tokenization scan (checkpointed — the rate agg
    * and the per-doc pass share it), a ≤ n_sources-row rate table
    * broadcast back, one narrow per-doc projection, one partial-agg
    * shuffle. The raw epochs value is computed as one left-to-right
    * double expression shared verbatim with the oracle; the final
    * round's half-way boundary is the repo's accepted 1-ulp risk
    * (CORRECTNESS gates it empirically).
    */
  def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = TextQueries.subwordCounts(s, dir)
      .select(col("doc_id"), col("source"), col("n_subword"))
      .materialize()
    val win = Window.partitionBy()
    val rates = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_subword").as("n_tokens"))
      .withColumn("total", sum(col("n_tokens")).over(win).cast("double"))
      .join(broadcast(TargetMixBps.toDF("source", "tgt_bps")), Seq("source"))
      // a zero-token source has nothing to repeat: epochs 0, not the
      // Infinity the bare division would produce (and the oracle's
      // CAST(inf AS BIGINT) would crash on)
      .withColumn("raw_bps",
        when(col("n_tokens") > 0L,
          round(col("tgt_bps").cast("double") * col("total") /
            col("n_tokens").cast("double"), 0).cast("long"))
          .otherwise(0L))
      .withColumn("epochs_bps",
        least(lit(MaxEpochs.toLong * MixBps), col("raw_bps")))
      .withColumn("capped", col("raw_bps") > MaxEpochs.toLong * MixBps)
    val coin = DedupFunctions.md5Hash32(
      concat(lit("epoch-"), col("doc_id").cast("string"))) % MixBps
    val realized = docs
      .join(broadcast(rates.select(col("source"), col("epochs_bps"))), "source")
      .withColumn("copies",
        floor(col("epochs_bps").cast("double") / MixBps) +
          when(coin < col("epochs_bps") % MixBps, 1L).otherwise(0L))
      .groupBy("source")
      .agg(sum("copies").as("realized_copies"),
        sum(col("n_subword") * col("copies")).as("realized_tokens"))
    rates.join(realized, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("tgt_bps"), col("epochs_bps"), col("capped"),
        coalesce(col("realized_copies"), lit(0L)).as("realized_copies"),
        coalesce(col("realized_tokens"), lit(0L)).as("realized_tokens"))
  }

  /** q88 — per-language ADAPTIVE quality gate: each language keeps its
    * own top three quarters. q49's absolute bar (0.5) silently keeps
    * very different fractions per language — length and punctuation
    * distributions differ by language, so a global constant is a
    * hidden mixture decision. Here the bar is each language's exact
    * 25th-percentile quality (q62's histogram-rank discipline,
    * partitioned by lang: ceil-rank over a (lang, quality) histogram,
    * never a sort of the corpus), and the output carries bar + verdict
    * per document.
    *
    * Scale shape: the histogram is ≤ langs × distinct-4dp-qualities
    * rows (bounded by construction at 10⁴ per language); the rank
    * windows run over THAT aggregate; the per-lang bars broadcast back
    * onto one narrow corpus pass.
    */
  def q88(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    val hist = scored.groupBy("lang", "quality").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.partitionBy("lang").orderBy("quality")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("lang")))
    val bars = cum.groupBy("lang")
      .agg(min(when(col("cum") >= expr("(1 * n + 3) div 4"), col("quality")))
        .as("lang_bar"))
    scored.join(broadcast(bars), "lang")
      .select(col("doc_id"), col("lang"), col("quality"), col("lang_bar"),
        (col("quality") >= col("lang_bar")).as("kept"))
  }

  /** Per-source top-ngram count for the q90 boilerplate report. */
  val TopNgramsPerSource = 5

  /** q90 — per-source boilerplate detector: the [[TopNgramsPerSource]]
    * most frequent word bigrams of EACH source (q64's global report
    * can't see a feed-local template that global frequency washes
    * out — per-source boilerplate is what per-feed cleaning rules are
    * written against). The ranking runs through the bounded
    * [[graft.operators.TopKPerGroup]] typed aggregator over the
    * (source, ngram) count relation — O(k) state per source, one
    * partial-agg shuffle, NO window sort over the corpus-sized count
    * table (the q63 discipline).
    */
  def q90(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = t(s, dir, "documents")
      .select(col("source"), col("text")).as[(String, String)]
      .flatMap { case (src, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 2) Iterator.empty
        else ws.iterator.sliding(2).withPartial(false)
          .map(p => (src, p.head + " " + p.last))
      }
      .toDF("source", "ngram")
    val agg = graft.operators.TopKPerGroup.topK[(Long, String)](
      TopNgramsPerSource, Ordering.by { case (n, g) => (-n, g) })
    grams.groupBy("source", "ngram").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.iterator.zipWithIndex.map { case ((n, g), i) =>
          (src, g, n, (i + 1).toLong)
        }
      }
      .toDF("source", "ngram", "n_occurrences", "rank")
  }

  /** Picks drawn by the q91 systematic weighted sample. */
  val SampleTarget = 100L

  /** q91 — token-weighted SYSTEMATIC sample: [[SampleTarget]] picks
    * distributed over the corpus proportional to subword-token weight,
    * with NO floating point and NO randomness beyond the fixed doc_id
    * order — a doc is picked once per sampling boundary
    * (multiples of total/target) that falls inside its cumulative-token
    * interval, so Σ n_picks is EXACTLY the target (telescoping floors)
    * and a doc holding k× the stride is picked k times (the
    * multiplicity importance sampling wants). q43/q53 sample by md5
    * coin per document — uniform over docs; this is the
    * weight-proportional complement a token-budgeted subsample needs.
    *
    * Scale shape: the cumulative weights come from the SequencePacking
    * two-pass distributed prefix sum (range partition + per-partition
    * subtotal broadcast — no global window sort); the boundary test is
    * one integer projection. Integer bounds: cum·target must fit a
    * long — with target 100, corpora to ~9×10¹⁶ tokens are exact
    * (DuckDB's window sum is HUGEINT either way).
    */
  def q91(s: SparkSession, dir: String): DataFrame = {
    val dt = TextQueries.subwordCounts(s, dir)
      .select(col("doc_id"), col("n_subword").cast("long").as("w"))
    val cum = graft.operators.SequencePacking.withBins(
        dt, keyCols = Seq.empty, orderCol = "doc_id",
        tokensCol = "w", tokensPerBin = Long.MaxValue)
      .drop("bin_id")
    // an empty (or all-zero-weight) corpus samples nothing — guard the
    // NULL max and the zero divisor (the q82/q85 empty-edge lesson)
    val totalRow = cum.agg(max(col("cum_tokens"))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    if (total == 0L)
      return cum.filter(lit(false))
        .select(col("doc_id"), col("w").as("n_tokens"),
          col("cum_tokens"), lit(0L).as("n_picks"))
    cum
      .withColumn("n_picks",
        expr(s"(cum_tokens * $SampleTarget) div $total" +
          s" - ((cum_tokens - w) * $SampleTarget) div $total"))
      .filter(col("n_picks") > 0)
      .select(col("doc_id"), col("w").as("n_tokens"),
        col("cum_tokens"), col("n_picks"))
  }

  /** q95 — the data-card ROLLUP: doc and whitespace-token counts at
    * every (source, lang) grouping level — per cell, per source, and
    * the corpus total — in ONE pass. `rollup` expands each input row
    * into its grouping sets BEFORE the exchange, so the partial
    * aggregation absorbs the fan-out map-side and the shuffle carries
    * ≤ (sources·langs + sources + 1) rows per partition — at 100 TB
    * this is the same one-exchange plan as q51, not three queries over
    * three scans (what the reference's per-level stats jobs run,
    * `stats/collect.py`-style). `lvl` is the grouping bitmask (0 cell,
    * 1 source subtotal, 3 grand total) — same bit order as DuckDB's
    * `GROUPING(source, lang)`. All aggregates are exact integers.
    */
  def q95(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("lang"),
        TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tok"))
      .rollup("source", "lang")
      .agg(grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"))
      .select(coalesce(col("source"), lit("ALL")).as("source_lvl"),
        coalesce(col("lang"), lit("ALL")).as("lang_lvl"),
        col("lvl"), col("n_docs"), col("n_tokens"))

  /** The fixed language column set of the q98 pivot — a corpus-schema
    * constant (the synthetic lake's five langs), shared with the
    * oracle's conditional-aggregation arms. Passing the value list to
    * `pivot` explicitly matters at scale: the list-less overload runs a
    * blocking distinct scan over the corpus just to discover column
    * names.
    */
  val PivotLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** q98 — the language-mix PIVOT: one row per source, one doc-count
    * column per language — the wide data-card table humans read (q95
    * is its long-form dual). groupBy+pivot with an explicit value list
    * is a single partial-agg exchange of ≤ sources·langs compact rows;
    * absent combinations surface as 0, not null, to match the
    * oracle's conditional sums.
    */
  def q98(s: SparkSession, dir: String): DataFrame = {
    val pivoted = t(s, dir, "documents")
      .groupBy("source").pivot("lang", PivotLangs)
      .agg(count(lit(1)))
    val filled = PivotLangs.foldLeft(pivoted)((d, l) =>
      d.withColumn(l, coalesce(col(l), lit(0L))))
    filled.select(
      (col("source") +:
        PivotLangs.map(l => col(l).as(s"n_$l"))) :+
        PivotLangs.map(l => col(l)).reduceLeft(_ + _).as("n_total"): _*)
  }

  /** [[q106]] window geometry: [[ChunkWindow]]-token chunks every
    * [[ChunkStride]] tokens ([[ChunkWindow]]−[[ChunkStride]] tokens of
    * overlap between neighbors). Part of the cross-engine contract.
    */
  val ChunkWindow = 64
  val ChunkStride = 48

  /** q106 — sliding-window chunking WITH OVERLAP (beyond-reference,
    * LLM-pipeline §chunking): cut every document into
    * [[ChunkWindow]]-token windows that start every [[ChunkStride]]
    * tokens — the RAG-indexing / context-window-preparation chunker,
    * where overlap keeps a sentence that straddles a boundary fully
    * inside at least one chunk. Distinct from q69/q84's NON-overlapping
    * `grouped` chunks (dedup/scrub units): start positions here are
    * `0, stride, 2·stride, …` while `start < len`, tail windows run
    * short, and each row carries its offset geometry so a retriever
    * can map hits back into the document.
    *
    * Emits (doc_id, chunk_idx, start_tok, n_tokens, chunk_md5) — the
    * md5 stands in for the chunk text so the gated output stays
    * compact while still pinning the exact chunk CONTENT cross-engine.
    *
    * Scale shape: ONE narrow typed pass, ZERO exchanges (PlanSpec pins
    * it) — the chunk strings are born and hashed inside the same task
    * that tokenizes, so at 100 TB nothing but compact hash rows ever
    * leaves the scan stage. Output size is len/stride ≈ 1.33× the
    * token count in rows — the deliberate cost of overlap.
    */
  def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        Iterator.range(0, ws.length, ChunkStride).map { st =>
          val end = math.min(st + ChunkWindow, ws.length)
          (id, (st / ChunkStride).toLong, st.toLong, (end - st).toLong,
            ws.slice(st, end).mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_idx", "start_tok", "n_tokens", "chunk")
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tokens"), md5(col("chunk")).as("chunk_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_mixture_resample" -> (q59 _),
    "q60_train_split" -> (q60 _),
    "q61_char_entropy" -> (q61 _),
    "q62_curriculum_buckets" -> (q62 _),
    "q63_topk_per_group" -> (q63 _),
    "q64_top_ngrams" -> (q64 _),
    "q68_shuffle_shard" -> (q68 _),
    "q73_token_mixture" -> (q73 _),
    "q76_version_diff" -> (q76 _),
    "q82_epoch_plan" -> (q82 _),
    "q88_adaptive_quality_gate" -> (q88 _),
    "q90_source_top_ngrams" -> (q90 _),
    "q91_weighted_sample" -> (q91 _),
    "q95_corpus_rollup" -> (q95 _),
    "q98_lang_pivot" -> (q98 _),
    "q106_overlap_chunks" -> (q106 _),
    "q136_chi2_independence" -> (q136 _),
    "q143_ks_drift" -> (q143 _),
    "q149_fair_topk" -> (q149 _),
    "q152_psi_drift" -> (q152 _),
    "q161_weighted_reservoir" -> (q161 _),
    "q196_spearman" -> (q196 _),
    "q200_dataset_card" -> (q200 _))

  /** q200 — THE DATASET CARD: one (metric, value) table summarizing
    * the whole lake — row counts for every table, the event stream's
    * user population and day span, the corpus's token mass, language
    * and source diversity, exact-duplicate count, and the embedding
    * dimensionality — the README-generator / freshness-manifest
    * query a data platform publishes with every release, and a
    * fitting q200: it touches all ten tables the engine serves.
    * Every value is an exact integer from a purpose-shaped pass
    * (count scans are column-pruned to nothing; the dup count is the
    * q28 fingerprint rollup).
    *
    * Scale shape: ten independent partial-agg passes (each reading
    * only what its metric needs) unioned driver-free into ≤ 17 rows.
    */
  def q200(s: SparkSession, dir: String): DataFrame = {
    def rowsOf(name: String): DataFrame =
      t(s, dir, name).agg(count(lit(1)).as("value"))
        .select(lit(s"rows:$name").as("metric"), col("value"))
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val ev = t(s, dir, "events")
    val docs = t(s, dir, "documents")
    val extras = Seq(
      ev.filter(col("user_id").isNotNull)
        .agg(countDistinct(col("user_id")).as("value"))
        .select(lit("events:distinct_users").as("metric"), col("value")),
      ev.filter(col("ts").isNotNull)
        .agg((datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          + lit(1)).cast("long").as("value"))
        .select(lit("events:span_days").as("metric"), col("value")),
      docs.agg(sum(size(TextFunctions.words(col("text")))).as("value"))
        .select(lit("corpus:ws_tokens").as("metric"), col("value")),
      docs.agg(countDistinct(col("lang")).as("value"))
        .select(lit("corpus:langs").as("metric"), col("value")),
      docs.agg(countDistinct(col("source")).as("value"))
        .select(lit("corpus:sources").as("metric"), col("value")),
      docs.agg((count(lit(1)) - countDistinct(md5(col("text")
          .cast("binary")))).as("value"))
        .select(lit("corpus:exact_dup_docs").as("metric"), col("value")),
      t(s, dir, "embeddings")
        .agg(max(size(col("embedding"))).cast("long").as("value"))
        .select(lit("embeddings:dim").as("metric"), col("value")))
    (tables.map(rowsOf) ++ extras).reduce(_ unionAll _)
  }

  /** q196 — SPEARMAN RANK CORRELATION between document length and
    * quality score: does the q34 quality heuristic secretly just
    * measure length? The rank correlation answers it robustly (no
    * normality assumption, monotone-invariant — Pearson on the raw
    * values would be dominated by the length tail). Exact integers to
    * the last step: tie-aware midranks DOUBLED into integers — the
    * code computes `2·rank_min + ties − 2`, i.e. `2·mid − 1`; the
    * uniform −1 shift is intentional and cancels in Pearson (any
    * affine translation of both rank vectors leaves r unchanged) —
    * then the Pearson moments of those
    * integer ranks in the n·Σxy − Σx·Σy form, and one double
    * division whose `sqrt` is IEEE-correctly-rounded in both engines.
    *
    * Scale shape: one scoring pass; two rank windows ordered by the
    * (bounded-cardinality) values; a one-row card. At corpus scale
    * the rank windows are the cost — value-histogram ranking (the
    * q185 trick) is the drop-in when lengths outgrow a sort.
    */
  def q196(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    def r2(c: String): Column =
      (lit(2L) * rank().over(Window.orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy(col(c))) - lit(2L))
    val ranked = scored
      .select(col("doc_id"), r2("n_chars").as("rx"), r2("quality").as("ry"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("n").as("n_docs"),
        expr("""CAST(round(
               | CAST(n * sxy - sx * sy AS DOUBLE) /
               | (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
               |  sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000, 0)
               | AS BIGINT)""".stripMargin).as("spearman_1e6"))
  }

  /** q161's sample size. */
  val AesK = 50

  /** q161 — WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–
    * Spirakis A-ES): keep the [[AesK]] documents with the largest
    * `u^(1/w)` keys — equivalently the largest `ln(u)/w` (u ∈ (0,1],
    * so both are ≤ 0 and the transform is monotone) — which is
    * EXACTLY a w-weighted uniform sample without replacement, as one
    * distributed top-k. Weights are `n_chars` (sample proportional to
    * size — the training-data use: longer documents carry more
    * tokens, a char-weighted doc sample IS an approximately
    * token-uniform sample). The uniform u is hash-derived
    * (`md5('aes-' ++ doc_id)`, the q43/q151 discipline), so the
    * sample is reproducible and engine-portable where a seeded RNG
    * is neither; q91's Bernoulli sampler answers "keep each row with
    * probability ∝ w", this answers "give me exactly k, weighted" —
    * the two standard weighted-sampling contracts.
    *
    * Scale shape: one projection + TakeOrderedAndProject (per-
    * partition k-heaps, driver merges k·partitions rows); the rank
    * window orders [[AesK]] rows.
    */
  def q161(s: SparkSession, dir: String): DataFrame = {
    val u = (graft.functions.DedupFunctions.md5Hash32(
      concat(lit("aes-"), col("doc_id").cast("string"))) + lit(1L))
      .cast("double") / lit(4294967296.0)
    val ranked = t(s, dir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("n_chars"),
        (log(u) / col("n_chars").cast("double")).as("skey"))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(AesK)
    ranked
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("skey").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_chars"),
        round(col("skey"), 9).as("skey"))
  }

  /** q152 — POPULATION STABILITY INDEX between [[KsSourceA]] and
    * [[KsSourceB]]'s document-length distributions over log₂ size
    * buckets: `PSI = Σ_b (p_A − p_B)·ln(p_A / p_B)` — the third leg
    * of the drift triad (q136 χ² for categorical composition, q143
    * KS for exact distribution shape, PSI for the industry-standard
    * bucketed severity score with its conventional 0.1/0.25 alarm
    * thresholds). Buckets are EXACT integer `floor(log₂ n_chars)`
    * (power-of-2 boundaries are exact in IEEE — no edge-of-bucket
    * float hazard); each bucket's term is computed from exact integer
    * counts, QUANTIZED to 10⁻⁶, then summed as longs (the q140
    * quantize-then-sum discipline). Buckets empty on either side are
    * SKIPPED and counted (the standard finite-PSI convention —
    * epsilon-padding trades one bias for another; surfacing the skip
    * count lets the reader judge).
    *
    * Scale shape: one filtered partial agg over the corpus into a
    * ≤ 64-row bucket table; everything after is bucket-table-sized.
    */
  def q152(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "documents")
      .filter(col("source").isin(KsSourceA, KsSourceB) && col("n_chars") > 0L)
      .groupBy(expr("CAST(floor(log2(CAST(n_chars AS DOUBLE))) AS BIGINT)")
        .as("bucket"))
      .agg(
        sum(when(col("source") === KsSourceA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("source") === KsSourceB, 1L).otherwise(0L)).as("cb"))
      .materialize() // two consumers: totals + the term sum
    val totals = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cells.crossJoin(broadcast(totals))
      .select(col("ca"), col("cb"), col("na"), col("nb"),
        when(col("ca") > 0L && col("cb") > 0L,
          round((col("ca").cast("double") / col("na") -
            col("cb").cast("double") / col("nb")) *
            log((col("ca").cast("double") * col("nb")) /
              (col("cb").cast("double") * col("na"))) * 1000000.0, 0)
            .cast("long")).as("term"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("term").isNull, 1L).otherwise(0L)).as("n_skipped"),
        coalesce(sum(col("term")), lit(0L)).as("psi_1e6"))
  }

  /** q149's geometry: the global cut and the per-source diversity cap.
    * Shared with the oracle.
    */
  val FairTopK = 20
  val FairPerSource = 2

  /** q149 — DIVERSITY-CAPPED FAIR TOP-K: the global top-[[FairTopK]]
    * documents by size with AT MOST [[FairPerSource]] per source — the
    * diversity-constrained ranking every curation / retrieval surface
    * applies so one prolific source cannot monopolize a shortlist
    * (search result diversification, seed-set selection, eval-set
    * sampling). Score is the exact integer `n_chars` with doc_id
    * tie-break — fully deterministic, trivially hash-gated.
    *
    * Scale shape: the per-source rank is a window PARTITIONED by
    * source (bounded state per partition), the cap cuts the corpus to
    * ≤ sources·cap rows BEFORE the global cut, and the global cut is
    * TakeOrderedAndProject over that bounded frame; the final rank
    * window orders [[FairTopK]] rows. No global sort anywhere.
    */
  def q149(s: SparkSession, dir: String): DataFrame = {
    val bySize = Seq(col("n_chars").desc, col("doc_id").asc)
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(bySize: _*)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(bySize: _*)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("src_rank", row_number().over(wSrc).cast("long"))
      .filter(col("src_rank") <= FairPerSource)
      .orderBy(bySize: _*)
      .limit(FairTopK)
      .withColumn("rank", row_number().over(wAll).cast("long"))
      .select(col("rank"), col("doc_id"), col("source"), col("n_chars"),
        col("src_rank"))
  }

  /** The q143 comparison arms — two corpus sources whose document-
    * length distributions are tested for drift. Shared with the
    * oracle.
    */
  val KsSourceA = "src0"
  val KsSourceB = "src1"

  /** q143 — two-sample KOLMOGOROV–SMIRNOV drift statistic between
    * [[KsSourceA]] and [[KsSourceB]]'s document-length distributions:
    * `D = max_x |F_A(x) − F_B(x)|`, computed EXACTLY as
    * `max |cumA(x)·N_B − cumB(x)·N_A| · 10⁶ div (N_A·N_B)` over the
    * distinct length values — all integer counts, so the statistic
    * hash-gates where a float-CDF max never would. The
    * distribution-shape drift monitor beside q136's categorical χ²:
    * χ² flags composition shifts, KS flags SHAPE shifts (truncation,
    * padding, a new boilerplate floor) that leave category counts
    * untouched. Emits D with both sample sizes for the caller's
    * critical-value lookup.
    *
    * Scale shape: one filtered partial agg over the corpus → a
    * VALUE-DOMAIN-sized cell table (distinct lengths — bounded by max
    * document length, not corpus size), one bounded ordered window
    * for the two running CDFs (the q51/q62 bounded-window class), one
    * scalar max. The arm totals ride the same cell table.
    */
  def q143(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("len"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cells = t(s, dir, "documents")
      .filter(col("source").isin(KsSourceA, KsSourceB))
      .groupBy(length(col("text")).cast("long").as("len"))
      .agg(
        sum(when(col("source") === KsSourceA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("source") === KsSourceB, 1L).otherwise(0L)).as("cb"))
      .materialize() // two consumers: arm totals + the CDF scan
    val totals = cells.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("n_values"))
    cells
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(totals))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("n_values")).as("n_values"),
        max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
          .as("dnum"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        expr("(dnum * 1000000) div (n_a * n_b)").as("ks_1e6"))
  }

  /** q136 — CHI-SQUARED INDEPENDENCE audit of the (source, language)
    * contingency table: `χ² = Σ_cells (O·N − R·C)² / (N·R·C)` over the
    * FULL source×language grid (absent combinations enter as O = 0 —
    * dropping them biases the statistic low), in 10⁻⁶ fixed point with
    * per-cell floor division (each cell's term is deterministic, the
    * sum is order-free — the q121/q128 exactness discipline; a float
    * χ² would be fold-order bait). The corpus-composition drift
    * monitor: a large χ² says language mix DEPENDS on source — the
    * mixture/curriculum stages (q59/q73) cannot treat source and
    * language as independent knobs, and a shift between snapshots
    * flags ingest drift. Emits the statistic with its degrees of
    * freedom `(n_sources−1)·(n_langs−1)` for the caller's p-value
    * lookup.
    *
    * Scale shape: ONE partial-agg shuffle over the corpus (the cell
    * counts); everything after — marginals, the full grid
    * (sources × langs, dozens of rows), the term sum — is
    * cell-table-sized arithmetic. Sums ride DECIMAL(38,0)/HUGEINT:
    * O·N at web scale exceeds 2⁶³ (the q121 overflow lesson).
    */
  def q136(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = t(s, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).cast(dec).as("o"))
      .materialize() // consumers: both marginals, N, the term join
    val rTot = cells.groupBy("source").agg(sum(col("o")).cast(dec).as("r"))
    val cTot = cells.groupBy("lang").agg(sum(col("o")).cast(dec).as("c"))
    val nTot = cells.agg(sum(col("o")).cast(dec).as("n"))
    rTot.crossJoin(cTot) // the full grid — marginal-sized, never corpus-sized
      .join(cells, Seq("source", "lang"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("source"), col("lang"), col("r"), col("c"), col("n"),
        coalesce(col("o"), lit(0L).cast(dec)).as("o"))
      .agg(
        max(col("n")).cast("long").as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(expr("((o * n - r * c) * (o * n - r * c) * 1000000) div (n * r * c)"))
          .cast("long").as("chi2_1e6"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        ((col("n_sources") - 1L) * (col("n_langs") - 1L)).as("dof"),
        col("chi2_1e6"))
  }

  // ---- oracle SQL ----

  private def md5ModSql(prefix: String, m: Int): String =
    s"CAST(concat('0x', substr(md5(concat('$prefix', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % $m"

  val oracles: Map[String, String] = Map(
    "q200_dataset_card" -> {
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      val rowCounts = tables.map(n =>
        s"SELECT 'rows:$n' AS metric, CAST(count(*) AS BIGINT) AS value FROM $n")
      val ws = TextQueries.wsSql
      val extras = Seq(
        s"""SELECT 'events:distinct_users', CAST(count(DISTINCT user_id)
           | AS BIGINT) FROM events WHERE user_id IS NOT NULL""".stripMargin,
        s"""SELECT 'events:span_days', CAST(date_diff('day',
           | min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 AS BIGINT)
           |FROM events WHERE ts IS NOT NULL""".stripMargin,
        s"SELECT 'corpus:ws_tokens', CAST(sum(len($ws)) AS BIGINT) FROM documents",
        "SELECT 'corpus:langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents",
        "SELECT 'corpus:sources', CAST(count(DISTINCT source) AS BIGINT) FROM documents",
        """SELECT 'corpus:exact_dup_docs',
          | CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
          |FROM documents""".stripMargin,
        "SELECT 'embeddings:dim', CAST(max(len(embedding)) AS BIGINT) FROM embeddings")
      (rowCounts ++ extras).mkString("\nUNION ALL\n")
    },
    "q196_spearman" -> {
      val ws = TextQueries.wsSql
      val praw = TextQueries.punctRatioSql
      s"""WITH sc AS (
        | SELECT doc_id, n_chars,
        |  round(least(CAST(len($ws) AS DOUBLE) / 100.0, 1.0)
        |    * greatest(0.0, 1.0 - ($praw) * 5.0), 4) AS quality
        | FROM documents),
        |rk AS (
        | SELECT
        |  2 * rank() OVER (ORDER BY n_chars)
        |    + count(*) OVER (PARTITION BY n_chars) - 2 AS rx,
        |  2 * rank() OVER (ORDER BY quality)
        |    + count(*) OVER (PARTITION BY quality) - 2 AS ry
        | FROM sc),
        |m AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |  CAST(sum(rx * rx) AS BIGINT) AS sxx,
        |  CAST(sum(ry * ry) AS BIGINT) AS syy,
        |  CAST(sum(rx * ry) AS BIGINT) AS sxy
        | FROM rk)
        |SELECT n AS n_docs,
        | CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |  (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |   sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1000000, 0)
        |  AS BIGINT) AS spearman_1e6
        |FROM m""".stripMargin
    },
    "q161_weighted_reservoir" ->
      s"""WITH s AS (
        | SELECT doc_id, n_chars,
        |  ln((CAST(concat('0x', substr(md5(concat('aes-',
        |    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1) / 4294967296.0)
        |   / CAST(n_chars AS DOUBLE) AS skey
        | FROM documents WHERE n_chars > 0),
        |topk AS (
        | SELECT * FROM s ORDER BY skey DESC, doc_id ASC LIMIT $AesK)
        |SELECT CAST(row_number() OVER (ORDER BY skey DESC, doc_id ASC)
        |   AS BIGINT) AS rank,
        | doc_id, n_chars, round(skey, 9) AS skey
        |FROM topk""".stripMargin,
    "q152_psi_drift" ->
      s"""WITH cells AS (
        | SELECT CAST(floor(log2(CAST(n_chars AS DOUBLE))) AS BIGINT) AS bucket,
        |  CAST(sum(CASE WHEN source = '$KsSourceA' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN source = '$KsSourceB' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        | FROM documents
        | WHERE source IN ('$KsSourceA', '$KsSourceB') AND n_chars > 0
        | GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |terms AS (
        | SELECT c.ca, c.cb, t.na, t.nb,
        |  CASE WHEN c.ca > 0 AND c.cb > 0 THEN
        |   CAST(round((CAST(c.ca AS DOUBLE) / t.na - CAST(c.cb AS DOUBLE) / t.nb)
        |     * ln((CAST(c.ca AS DOUBLE) * t.nb) / (CAST(c.cb AS DOUBLE) * t.na))
        |     * 1000000.0) AS BIGINT)
        |  END AS term
        | FROM cells c CROSS JOIN tot t)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        | CAST(count(*) AS BIGINT) AS n_buckets,
        | CAST(sum(CASE WHEN term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        | CAST(coalesce(sum(term), 0) AS BIGINT) AS psi_1e6
        |FROM terms""".stripMargin,
    "q149_fair_topk" ->
      s"""WITH ranked AS (
        | SELECT doc_id, source, n_chars,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS src_rank
        | FROM documents),
        |capped AS (
        | SELECT * FROM ranked WHERE src_rank <= $FairPerSource
        | ORDER BY n_chars DESC, doc_id ASC LIMIT $FairTopK)
        |SELECT CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
        |   AS BIGINT) AS rank,
        | doc_id, source, n_chars, src_rank
        |FROM capped""".stripMargin,
    "q143_ks_drift" ->
      s"""WITH cells AS (
        | SELECT CAST(len(text) AS BIGINT) AS l,
        |  CAST(sum(CASE WHEN source = '$KsSourceA' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN source = '$KsSourceB' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        | FROM documents WHERE source IN ('$KsSourceA', '$KsSourceB')
        | GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |  CAST(sum(cb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_values FROM cells),
        |cdf AS (
        | SELECT CAST(sum(ca) OVER (ORDER BY l ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER (ORDER BY l ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
        | FROM cells)
        |SELECT t.n_a, t.n_b, t.n_values,
        | CAST((max(abs(c.cuma * t.n_b - c.cumb * t.n_a)) * 1000000)
        |   // (t.n_a * t.n_b) AS BIGINT) AS ks_1e6
        |FROM cdf c CROSS JOIN tot t
        |GROUP BY t.n_a, t.n_b, t.n_values""".stripMargin,
    "q136_chi2_independence" ->
      """WITH cells AS (
        | SELECT source, lang, CAST(count(*) AS HUGEINT) AS o
        | FROM documents GROUP BY 1, 2),
        |rt AS (SELECT source, CAST(sum(o) AS HUGEINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT lang, CAST(sum(o) AS HUGEINT) AS c FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM cells),
        |grid AS (
        | SELECT rt.source, ct.lang, rt.r, ct.c, nt.n,
        |  CAST(coalesce(cl.o, 0) AS HUGEINT) AS o
        | FROM rt CROSS JOIN ct CROSS JOIN nt
        | LEFT JOIN cells cl ON cl.source = rt.source AND cl.lang = ct.lang)
        |SELECT CAST(max(n) AS BIGINT) AS n_docs,
        | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        | CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1) AS BIGINT) AS dof,
        | CAST(sum(((o * n - r * c) * (o * n - r * c) * 1000000) // (n * r * c)) AS BIGINT) AS chi2_1e6
        |FROM grid""".stripMargin,
    "q59_mixture_resample" ->
      s"""WITH c AS (
         | SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         | FROM documents GROUP BY lang),
         |s AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
         |             CAST(count(*) AS DOUBLE) AS nl FROM c),
         |r AS (SELECT lang, n_docs,
         |  CAST(round(least(1.0, (s.total / s.nl) / CAST(n_docs AS DOUBLE))
         |    * $MixBps) AS BIGINT) AS keep_bps
         | FROM c, s),
         |k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS kept_docs
         | FROM documents d JOIN r ON d.lang = r.lang
         | WHERE ${md5ModSql("mix-", MixBps)} < r.keep_bps
         | GROUP BY d.lang)
         |SELECT r.lang, r.n_docs, r.keep_bps,
         | coalesce(k.kept_docs, CAST(0 AS BIGINT)) AS kept_docs
         |FROM r LEFT JOIN k ON r.lang = k.lang""".stripMargin,
    "q60_train_split" ->
      s"""SELECT doc_id, source,
         | CASE WHEN ${md5ModSql("split-", 100)} < $TrainPct THEN 'train'
         |      WHEN ${md5ModSql("split-", 100)} < $ValPct THEN 'val'
         |      ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "q68_shuffle_shard" ->
      s"""WITH h AS (
         | SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |r AS (
         | SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS global_rank
         | FROM h)
         |SELECT doc_id, global_rank,
         | (global_rank - 1) // $ShardDocs AS shard_id,
         | (global_rank - 1) % $ShardDocs AS pos_in_shard
         |FROM r""".stripMargin,
    "q73_token_mixture" ->
      s"""WITH ${TextQueries.subwordCtesSql},
         |dt AS (
         | SELECT d.doc_id, d.lang,
         |  CAST(coalesce(a.n_subword, 0) AS BIGINT) AS nt
         | FROM docs d LEFT JOIN swagg a ON d.doc_id = a.doc_id),
         |c AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS w FROM dt GROUP BY lang),
         |s AS (SELECT CAST(sum(w) AS DOUBLE) AS total,
         |             CAST(count(*) AS DOUBLE) AS nl FROM c),
         |r AS (SELECT lang, w,
         |  CAST(round(least(1.0, (s.total / s.nl) / CAST(w AS DOUBLE))
         |    * $MixBps) AS BIGINT) AS keep_bps
         | FROM c, s),
         |k AS (SELECT dt.lang, CAST(sum(dt.nt) AS BIGINT) AS kept_tokens
         | FROM dt JOIN r ON dt.lang = r.lang
         | WHERE ${md5ModSql("mix-", MixBps)} < r.keep_bps
         | GROUP BY dt.lang)
         |SELECT r.lang, r.w AS n_tokens, r.keep_bps,
         | coalesce(k.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens
         |FROM r LEFT JOIN k ON r.lang = k.lang""".stripMargin,
    "q76_version_diff" ->
      s"""WITH cur AS (
         | SELECT doc_id, md5(text) AS h_cur FROM documents),
         |prev AS (
         | SELECT doc_id,
         |  md5(CASE WHEN doc_id % $DiffChangedMod = 0
         |      THEN text || ' v1' ELSE text END) AS h_prev
         | FROM documents WHERE doc_id % $DiffAddedMod <> 0)
         |SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
         | CASE WHEN p.h_prev IS NULL THEN 'added'
         |      WHEN c.h_cur IS NULL THEN 'removed'
         |      WHEN c.h_cur <> p.h_prev THEN 'changed'
         |      ELSE 'unchanged' END AS status
         |FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id""".stripMargin,
    // q82 replays the tokenization CTEs, the literal target VALUES, the
    // identical left-to-right raw-epochs double expression, and the
    // per-doc floor+coin replication
    "q82_epoch_plan" -> {
      val valuesSql = TargetMixBps
        .map { case (src, bps) => s"('$src', CAST($bps AS BIGINT))" }
        .mkString(",\n    ")
      val capBps = MaxEpochs.toLong * MixBps
      s"""WITH ${TextQueries.subwordCtesSql},
         |dt AS (
         | SELECT d.doc_id, d.source,
         |  CAST(coalesce(a.n_subword, 0) AS BIGINT) AS nt
         | FROM docs d LEFT JOIN swagg a ON d.doc_id = a.doc_id),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(nt) AS BIGINT) AS n_tokens
         |      FROM dt GROUP BY source),
         |s AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM c),
         |tgt(source, tgt_bps) AS (VALUES $valuesSql),
         |r AS (SELECT c.source, c.n_docs, c.n_tokens, t.tgt_bps,
         |  CASE WHEN c.n_tokens = 0 THEN CAST(0 AS BIGINT)
         |   ELSE CAST(round(CAST(t.tgt_bps AS DOUBLE) * s.total
         |    / CAST(c.n_tokens AS DOUBLE)) AS BIGINT) END AS raw_bps
         | FROM c JOIN tgt t ON c.source = t.source, s),
         |r2 AS (SELECT source, n_docs, n_tokens, tgt_bps,
         |  least(CAST($capBps AS BIGINT), raw_bps) AS epochs_bps,
         |  raw_bps > $capBps AS capped FROM r),
         |cp AS (SELECT dt.source, dt.nt,
         |  CAST(floor(r2.epochs_bps / $MixBps.0) AS BIGINT)
         |   + CASE WHEN ${md5ModSql("epoch-", MixBps)} < r2.epochs_bps % $MixBps
         |     THEN 1 ELSE 0 END AS copies
         | FROM dt JOIN r2 ON dt.source = r2.source),
         |k AS (SELECT source, CAST(sum(copies) AS BIGINT) AS realized_copies,
         |             CAST(sum(nt * copies) AS BIGINT) AS realized_tokens
         |      FROM cp GROUP BY source)
         |SELECT r2.source, r2.n_docs, r2.n_tokens, r2.tgt_bps,
         | r2.epochs_bps, r2.capped,
         | coalesce(k.realized_copies, CAST(0 AS BIGINT)) AS realized_copies,
         | coalesce(k.realized_tokens, CAST(0 AS BIGINT)) AS realized_tokens
         |FROM r2 LEFT JOIN k ON r2.source = k.source""".stripMargin
    },
    "q64_top_ngrams" -> {
      val wsSql = TextQueries.wsSql
      s"""WITH base AS (SELECT $wsSql AS ws FROM documents),
         |grams AS (
         | SELECT unnest(list_transform(range(1, len(ws)),
         |   i -> concat(ws[i], ' ', ws[i+1]))) AS ngram
         | FROM base WHERE len(ws) >= 2)
         |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM grams GROUP BY ngram
         |ORDER BY n_occurrences DESC, ngram ASC
         |LIMIT $TopNgrams""".stripMargin
    },
    "q61_char_entropy" ->
      """WITH ch AS (
        | SELECT doc_id, substr(text, CAST(i + 1 AS INT), 1) AS c
        | FROM documents CROSS JOIN unnest(range(0, length(text))) AS t(i)
        | WHERE length(text) > 0),
        |cnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k
        |        FROM ch GROUP BY doc_id, c),
        |l AS (SELECT doc_id, list(k ORDER BY c) AS ks FROM cnt GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len_chars
        |      FROM documents)
        |SELECT n.doc_id, n.len_chars,
        | CASE WHEN n.len_chars = 0 THEN NULL
        |  ELSE round(-list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
        |    list_transform(l.ks,
        |      k -> (k / n.len_chars) * (ln(k / n.len_chars) / ln(2.0)))),
        |    (a, x) -> a + x), 4)
        | END AS entropy
        |FROM n LEFT JOIN l ON n.doc_id = l.doc_id""".stripMargin,
    "q63_topk_per_group" -> {
      val wsSql = TextQueries.wsSql
      val praw = TextQueries.punctRatioSql
      s"""WITH s AS (
         | SELECT doc_id, source,
         |  round(least(CAST(len($wsSql) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - ($praw) * 5.0), 4) AS quality
         | FROM documents),
         |r AS (
         | SELECT source, doc_id, quality,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
         | FROM s)
         |SELECT source, doc_id, quality, rank
         |FROM r WHERE rank <= $TopKDocs""".stripMargin
    },
    // q91 replays the cumulative weights with a window sum (DuckDB's
    // HUGEINT arithmetic; the ENGINE avoids the global window via the
    // distributed prefix sum) and the identical floor-boundary test
    "q91_weighted_sample" ->
      s"""WITH ${TextQueries.subwordCtesSql},
         |dt AS (
         | SELECT d.doc_id, CAST(coalesce(a.n_subword, 0) AS BIGINT) AS w
         | FROM docs d LEFT JOIN swagg a ON d.doc_id = a.doc_id),
         |c AS (SELECT doc_id, w,
         |  sum(w) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM dt),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM dt)
         |SELECT c.doc_id, c.w AS n_tokens,
         | CAST(c.cum AS BIGINT) AS cum_tokens,
         | CAST((c.cum * $SampleTarget) // t.total
         |  - ((c.cum - c.w) * $SampleTarget) // t.total AS BIGINT) AS n_picks
         |FROM c, t
         |WHERE (c.cum * $SampleTarget) // t.total
         |    > ((c.cum - c.w) * $SampleTarget) // t.total""".stripMargin,
    // q90 replays the bigram explode per source; DuckDB ranks with a
    // row_number window (fine for the oracle — the ENGINE is the side
    // that must avoid the corpus-sized window sort)
    "q90_source_top_ngrams" -> {
      val wsSql = TextQueries.wsSql
      s"""WITH base AS (SELECT source, $wsSql AS ws FROM documents),
         |grams AS (
         | SELECT source, unnest(list_transform(range(1, len(ws)),
         |   i -> concat(ws[i], ' ', ws[i+1]))) AS ngram
         | FROM base WHERE len(ws) >= 2),
         |c AS (SELECT source, ngram, CAST(count(*) AS BIGINT) AS n_occurrences
         |      FROM grams GROUP BY 1, 2),
         |r AS (SELECT source, ngram, n_occurrences,
         |  row_number() OVER (PARTITION BY source
         |    ORDER BY n_occurrences DESC, ngram ASC) AS rank
         | FROM c)
         |SELECT source, ngram, n_occurrences, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= $TopNgramsPerSource""".stripMargin
    },
    // q88 replays q62's ceil-rank percentile partitioned by language
    "q88_adaptive_quality_gate" -> {
      val wsSql = TextQueries.wsSql
      val praw = TextQueries.punctRatioSql
      s"""WITH s AS (
         | SELECT doc_id, lang,
         |  round(least(CAST(len($wsSql) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - ($praw) * 5.0), 4) AS quality
         | FROM documents),
         |h AS (SELECT lang, quality, CAST(count(*) AS BIGINT) AS c
         |      FROM s GROUP BY lang, quality),
         |cum AS (SELECT lang, quality,
         |  sum(c) OVER (PARTITION BY lang ORDER BY quality
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(c) OVER (PARTITION BY lang) AS n
         | FROM h),
         |b AS (SELECT lang,
         |  min(CASE WHEN cum >= (1 * n + 3) // 4 THEN quality END) AS lang_bar
         | FROM cum GROUP BY lang)
         |SELECT s.doc_id, s.lang, s.quality, b.lang_bar,
         | (s.quality >= b.lang_bar) AS kept
         |FROM s JOIN b ON s.lang = b.lang""".stripMargin
    },
    "q62_curriculum_buckets" -> {
      val wsSql = TextQueries.wsSql
      val praw = TextQueries.punctRatioSql
      s"""WITH s AS (
         | SELECT doc_id,
         |  round(least(CAST(len($wsSql) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - ($praw) * 5.0), 4) AS quality
         | FROM documents),
         |h AS (SELECT quality, CAST(count(*) AS BIGINT) AS c
         |      FROM s GROUP BY quality),
         |cum AS (SELECT quality,
         |  sum(c) OVER (ORDER BY quality
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(c) OVER () AS n
         | FROM h),
         |t AS (SELECT
         |  min(CASE WHEN cum >= (1 * n + 3) // 4 THEN quality END) AS t1,
         |  min(CASE WHEN cum >= (2 * n + 3) // 4 THEN quality END) AS t2,
         |  min(CASE WHEN cum >= (3 * n + 3) // 4 THEN quality END) AS t3
         | FROM cum)
         |SELECT s.doc_id, s.quality,
         | 1 + CAST(s.quality > t.t1 AS BIGINT)
         |   + CAST(s.quality > t.t2 AS BIGINT)
         |   + CAST(s.quality > t.t3 AS BIGINT) AS bucket
         |FROM s CROSS JOIN t""".stripMargin
    },
    "q95_corpus_rollup" -> {
      val wsSql = TextQueries.wsSql
      s"""SELECT coalesce(source, 'ALL') AS source_lvl,
         | coalesce(lang, 'ALL') AS lang_lvl,
         | CAST(GROUPING(source, lang) AS BIGINT) AS lvl,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(len($wsSql)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin
    },
    "q98_lang_pivot" -> {
      val arms = PivotLangs.map(l =>
        s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l")
        .mkString(",\n ")
      val total = PivotLangs.map(l =>
        s"sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END)").mkString(" + ")
      s"""SELECT source,
         | $arms,
         | CAST($total AS BIGINT) AS n_total
         |FROM documents GROUP BY source""".stripMargin
    },
    "q106_overlap_chunks" -> {
      val wsSql = TextQueries.wsSql
      s"""WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |st AS (
         | SELECT doc_id, ws, unnest(range(0, len(ws), $ChunkStride)) AS s
         | FROM d)
         |SELECT doc_id,
         | CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
         | CAST(s AS BIGINT) AS start_tok,
         | CAST(least(len(ws) - s, $ChunkWindow) AS BIGINT) AS n_tokens,
         | md5(array_to_string(ws[s + 1 : s + $ChunkWindow], ' ')) AS chunk_md5
         |FROM st""".stripMargin
    })
}
