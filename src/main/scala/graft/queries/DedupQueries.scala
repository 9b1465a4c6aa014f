package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.functions.{DedupFunctions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication pipelines over the `documents` / `embeddings` corpus —
  * the training-data-scale operators beyond the reference's inventory
  * (SURVEY.md §7.6 north star): exact hash dedup, MinHash+LSH candidate
  * generation, SimHash, LSH-candidate n-gram Jaccard verification, and
  * embedding-cosine near-dup.
  *
  * Everything is pure column expressions (codegen'd, no UDFs). The hash
  * constants (MinHash permutation coefficients, primes) live in
  * [[DedupFunctions]] and are interpolated into the DuckDB oracle SQL
  * from the SAME Scala values, so both engines run the same math.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - signatures/fingerprints are a single projection over the corpus —
  *    no shuffle, no driver round-trips;
  *  - LSH banding shuffles `nBands × corpus` small (band_idx, band_key)
  *    rows and joins them — O(n·bands) instead of the O(n²) pairwise
  *    compare of naive dedup;
  *  - the exact-Jaccard verify runs ONLY on LSH candidates (the classic
  *    two-phase near-dup pipeline);
  *  - embedding near-dup blocks on `label` (the stand-in for a coarse
  *    cluster id) so the pairwise cosine stays within-bucket.
  */
object DedupQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val ShingleN = 3
  val NPerms = 16
  val NBands = 8
  val RowsPerBand = 2
  val EmbDims = 64
  val NearDupCos = 0.35

  /** q28 — exact dedup by content hash (hash-groupBy).
    * One shuffle of (md5, doc_id); the canonical id is the group min —
    * deterministic. `n_copies > 1` marks exact duplicates.
    */
  def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("content_md5", md5(col("text").cast("binary")))
      .groupBy("content_md5")
      .agg(min("doc_id").as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Per-doc distinct word shingles, computed in one JVM pass (plain
    * `sliding(n)`): the `transform(sequence...)` column form is
    * interpreted per element (higher-order lambdas get no codegen) and
    * measured several times slower at sf0.1. Semantics identical to
    * [[TextFunctions.wordShingles]] + `array_distinct`.
    */
  private def shingleSet(text: String): Array[String] = {
    val out = text.split("\\s+").iterator.filter(_.nonEmpty).toSeq
      .sliding(ShingleN).filter(_.size == ShingleN)
      .map(_.mkString(" ")).distinct.toArray
    // sorted in CODE-POINT order (== UTF8String binary order) so the
    // candidate-verify intersections run as allocation-free merge
    // walks ([[graft.expressions.SortedStringIntersectSize]]); every
    // consumer is order-insensitive in value (intersect SIZE, size,
    // explode-to-set, MinHash min-fold), so only artifact bytes change
    java.util.Arrays.sort(out,
      (x: String, y: String) => DedupFunctions.codePointCompare(x, y))
    out
  }

  /** Per-doc distinct shingle sets as arrays — q31's exact-Jaccard
    * inputs. Narrow typed map, no shuffle.
    */
  private[queries] def shingleSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, shingleSet(text)) }
      .filter(_._2.nonEmpty)
      .toDF("doc_id", "sh")
  }

  /** The per-doc 16-slot MinHash fold over an in-memory distinct
    * shingle array — THE one copy of the permutation math (the oracle
    * SQL is generated from the same constants). Callers pass the
    * shingles they already hold, so signature and shingle-set passes
    * can share one tokenization.
    */
  private def sigOf(shingles: Array[String]): Array[Long] = {
    val P = DedupFunctions.MinHashPrime
    val coeffs = SigCoeffs
    val mins = Array.fill(NPerms)(Long.MaxValue)
    shingles.foreach { sh =>
      val h = DedupFunctions.md5Hash32Jvm(sh) % P
      var i = 0
      while (i < NPerms) {
        val v = (h * coeffs(i)._1 + coeffs(i)._2) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    mins
  }

  private val SigCoeffs: Array[(Long, Long)] =
    DedupFunctions.permCoeffs(NPerms).toArray

  /** MinHash signatures in ONE narrow pass per doc: each distinct
    * shingle md5-hashed once JVM-side, 16 permuted minima folded
    * in-place — no explode, no aggregation shuffle (the doc row IS the
    * aggregation boundary). Same signatures as the declarative
    * `array_min(transform(...))` form, which re-hashes per permutation
    * interpreted (measured 16× slower), and as the explode→groupBy form,
    * which shuffles tokens×docs rows. Shared by q29/q48.
    */
  private def signaturesOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val shingles = shingleSet(text)
        if (shingles.isEmpty) None else Some((id, sigOf(shingles)))
      }
      .toDF("doc_id", "sig")
  }

  private[graft] def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(t(s, dir, "documents"))

  /** Band buckets holding more documents than this are dropped from
    * candidate generation. A bucket of m members yields ~m²/2 pairs, so
    * one pathological key (boilerplate near-identical at corpus scale)
    * otherwise owns the join. The cap trades recall ONLY on content so
    * common that a 10k-member near-dup bucket exists — content the
    * exact-dup collapse in [[clusterLabels]] has already contracted
    * unless the copies differ slightly; the cutoff is far above any
    * test-SF bucket, so gated outputs are unaffected, and
    * [[oversizedBandBuckets]] makes the drop observable (no silent
    * caps — DedupSpec exercises the cap with a tiny threshold).
    */
  val MaxBandBucket = 10000

  /** The dropped (band_idx, band_key) keys at a given cap — tiny frame
    * for logging/monitoring; empty at every gated SF. Derived from the
    * SAME windowed band frame as [[lshCandidates]] (`bucket_n >` is the
    * complement of the cap filter), so a DAG that runs both per-run
    * shares the single (band_idx, band_key) exchange instead of paying
    * a second full band pass.
    */
  private[graft] def oversizedBandBuckets(sig: DataFrame,
                                          maxBucket: Int): DataFrame =
    windowedBands(sig)
      .filter(col("bucket_n") > maxBucket)
      .select(col("band_idx"), col("band_key"), col("bucket_n").as("n"))
      .distinct()

  private def bandsOf(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
        explode(DedupFunctions.lshBands(col("sig"), NBands, RowsPerBand)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))

  /** One band row per (doc, band) with its bucket's member count — the
    * shared frame behind both the candidate cap (`<= maxBucket`, hot
    * path) and the oversize monitor (`> maxBucket`). The window keys on
    * (band_idx, band_key) — the self-join key — so the exchange it
    * introduces is the one the join needs anyway.
    */
  private def windowedBands(sig: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_key")
    bandsOf(sig).withColumn("bucket_n", count(lit(1)).over(w))
  }

  /** LSH candidate pairs (doc_a < doc_b sharing ≥1 band), from an
    * already-built signature relation. Buckets over `maxBucket` are
    * excluded via a window count over (band_idx, band_key) — the SAME
    * key the self-join shuffles on, so the cap costs no extra pass: the
    * window's exchange carries the join, the b-side reuses the a-side's
    * exchange (ReusedExchange — identical subplans), and the band
    * relation is computed ONCE per query, versus the m² blowup an
    * uncapped hot bucket feeds into the self-join. The dropped keys
    * stay observable through [[oversizedBandBuckets]] (a separate
    * monitoring pass, off the candidate hot path).
    */
  private[graft] def lshCandidates(sig: DataFrame,
                                   maxBucket: Int = MaxBandBucket): DataFrame = {
    val kept = windowedBands(sig)
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    kept.alias("a")
      .join(kept.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Signatures materialized once via the [[graft.Materialize]] seam AND memoized per
    * (session, dataset): the relation feeds four plan branches inside
    * q29 (both sides of the band self-join + both est_sim lookups) and
    * is shared ACROSS q29/q58 — without the memo each of those
    * queries re-runs the corpus shingle/md5/fold pass. (q48's
    * clustering runs its own smaller pass over one representative per
    * distinct content — see [[collapsedLshInputs]].) Materialization
    * (not persist) so evicted/unreferenced blocks self-release via the
    * ContextCleaner — a `persist()` here would sit in the CacheManager
    * until someone remembered to unpersist (the round-1 leak).
    */
  /** Memo key for a `documents`-derived frame, carrying the table's
    * content fingerprint (file names + sizes + mtimes): a dataset
    * rewritten in place changes the key, so a memo hit can never serve
    * signatures/labels computed over the old corpus. One driver-side FS
    * listing per lookup — metadata only, no data read.
    */
  private def docsKey(name: String, s: SparkSession, dir: String): String =
    s"$name:$dir:" +
      graft.sources.DatasetFingerprint.ofTable(s, dir, "documents")

  /** docsKey's sibling for artifacts derived from the `part` table —
    * one definition shared by the memoizing site and the force-cold
    * hook so the key shape cannot drift between them.
    */
  private def partKey(name: String, s: SparkSession, dir: String): String =
    s"$name:$dir:" +
      graft.sources.DatasetFingerprint.ofTable(s, dir, "part")

  private[graft] def checkpointedSignatures(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-signatures", s, dir)) {
      signatures(s, dir).materialize()
    }

  /** Same materialize-once-and-memoize treatment as
    * [[checkpointedSignatures]] for the shingle sets: q50 reads them on
    * three plan branches, and the memo shares the tokenization pass
    * across repeated q50 invocations (a bench loop, a DAG rerun) —
    * without it every call re-tokenizes the corpus.
    */
  private def checkpointedShingleSets(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-shingle-sets", s, dir)) {
      shingleSets(s, dir).materialize()
    }

  /** q29 — MinHash+LSH near-dup candidates with estimated similarity
    * (fraction of equal signature slots). shingle→minhash→band→bucket-join.
    */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val sig = checkpointedSignatures(s, dir)
    lshCandidates(sig)
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / NPerms, 4).as("est_sim"))
  }

  /** q30 — SimHash fingerprints + Hamming distance to a reference doc
    * (doc_id 0). Near-dup test is `hamming <= k`; the reference-doc
    * compare keeps the output linear while exercising the distance.
    */
  def q30(s: SparkSession, dir: String): DataFrame = {
    // Scale form of [[DedupFunctions.simHash]]: one NARROW typed map —
    // per doc, a single pass over token md5s accumulating 32 bit
    // counters, no explode, no shuffle at all until the tiny reference
    // join. (The column-lambda form re-filters the hash array 32×
    // interpreted; the explode+agg form shuffles tokens×docs rows. This
    // beats both — and the single-node DuckDB baseline.) Bit b is set
    // when ≥ half the token hashes set it; hashes are md5Hash32 mod the
    // MinHash prime (a no-op for 32-bit values, kept for formula parity
    // with the oracle SQL).
    import s.implicits._
    val sims = t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        if (ws.isEmpty) (id, None: Option[Long])
        else {
          val counts = new Array[Int](32)
          ws.foreach { w =>
            val h = DedupFunctions.md5Hash32Jvm(w)
            var b = 0
            while (b < 32) { if (((h >> b) & 1L) != 0L) counts(b) += 1; b += 1 }
          }
          var sim = 0L
          var b = 0
          while (b < 32) { if (2 * counts(b) >= ws.length) sim |= 1L << b; b += 1 }
          (id, Some(sim))
        }
      }
      .toDF("doc_id", "simhash")
    val ref = sims.filter(col("doc_id") === 0)
      .select(col("simhash").as("ref_simhash"))
    sims.crossJoin(broadcast(ref))
      .select(col("doc_id"), col("simhash"),
        DedupFunctions.hammingDist(col("simhash"), col("ref_simhash"))
          .cast("long").as("hamming_to_doc0"))
  }

  /** One corpus pass emitting BOTH the distinct shingle set and the
    * MinHash signature per doc (the signature is folded from the same
    * in-memory shingle array), checkpointed once — q31 needs both and
    * would otherwise tokenize the corpus twice.
    */
  private def shingleSigs(s: SparkSession, dir: String): DataFrame =
    // memoized like [[checkpointedSignatures]]: q31 (Jaccard verify)
    // and q107 (weighted PageRank) both need the shingle-set + sig
    // pass, and the shared-corpus-pass discipline (q94/q103's
    // termStats, q48/q49's clustering) says tokenization runs ONCE per
    // dataset, not once per consumer
    QueryMemo.get(s, docsKey("dedup-shingle-sigs", s, dir)) {
      import s.implicits._
      t(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val shingles = shingleSet(text)
          if (shingles.isEmpty) None else Some((id, shingles, sigOf(shingles)))
        }
        .toDF("doc_id", "sh", "sig")
        .materialize()
    }

  /** q31 — exact n-gram Jaccard on the LSH candidate pairs (the verify
    * phase of the two-phase near-dup pipeline). Union size via
    * |A|+|B|−|A∩B| so both engines do identical integer math.
    */
  def q31(s: SparkSession, dir: String): DataFrame = {
    // shingle sets + signatures from ONE tokenization pass; the exact
    // intersection only ever runs on the (few) LSH candidate pairs
    val both = shingleSigs(s, dir)
    val inter = graft.expressions.SetExpressions.intersectSizeSorted(col("sh_a"), col("sh_b"))
    lshCandidates(both.select(col("doc_id"), col("sig")))
      .join(both.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(both.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      // two projections — the q113 CollapseProject discipline: the
      // merge walk is aliased once and the union algebra references
      // the alias, so the walk runs once per pair
      .select(col("doc_a"), col("doc_b"), inter.as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).as("szsum"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("szsum") - col("inter")), 4).as("jaccard"))
  }

  /** q113 — shingle CONTAINMENT (asymmetric Jaccard) on the LSH
    * candidate pairs: `|A∩B| / |A|` and `|A∩B| / |B|` separately,
    * plus exact subset flags. Symmetric Jaccard (q31) under-scores
    * the pair "short quote ⊂ long article" (small union overlap);
    * containment is the standard signal for QUOTE / SUBSET detection
    * — a training-data pipeline treats "B contains all of A" very
    * differently from "A and B half-overlap" (drop the quote, keep
    * the article vs near-dup arbitration). Same one-tokenization
    * memoized pass and candidate-bounded verify join as q31; the
    * subset flags are exact integer comparisons, the ratios the
    * q31-precedent round-4 doubles.
    */
  def q113(s: SparkSession, dir: String): DataFrame = {
    val both = shingleSigs(s, dir)
    val inter = graft.expressions.SetExpressions.intersectSizeSorted(col("sh_a"), col("sh_b"))
    lshCandidates(both.select(col("doc_id"), col("sig")))
      .join(both.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(both.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      // TWO projections: the merge walk lands in its own select so the
      // five consumers reference the `n_shared` ALIAS — CollapseProject
      // refuses to inline a non-cheap alias with multiple references,
      // so the walk runs once per pair. The r17 probe measured the
      // single-projection form re-evaluating it per consumer (q113
      // solo 9.96 → 6.0 task-s at sf1 on this split alone; codegen
      // subexpression elimination did NOT catch it there).
      .select(col("doc_a"), col("doc_b"), inter.cast("long").as("n_shared"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") / col("na"), 4)
          .as("containment_a"),
        round(col("n_shared").cast("double") / col("nb"), 4)
          .as("containment_b"),
        (col("n_shared") === col("na")).as("a_in_b"),
        (col("n_shared") === col("nb")).as("b_in_a"))
  }

  /** q32 — embedding-cosine near-dup, blocked by `label` (coarse cluster)
    * so the pairwise compare is per-bucket, not corpus².
    */
  /** Memory cap for one cosine block: a group buffers at most
    * 2 × this many vectors (two sub-buckets), ~2 MB at 64-dim floats.
    */
  val MaxCosBlock = 4096

  def q32(s: SparkSession, dir: String): DataFrame =
    blockedCosinePairs(s, t(s, dir, "embeddings"), MaxCosBlock)

  /** Blocked pairwise cosine with SIZE-CAPPED blocks: a label larger
    * than `maxBlock` is split into `nb = ceil(count/maxBlock)` hash
    * sub-buckets and every unordered sub-bucket pair (i ≤ j) becomes
    * its own group, so an executor buffers at most two sub-buckets
    * (never a whole hot label — the unbounded-block OOM the round-1
    * form risked). Each vector is replicated `nb` times (the standard
    * blocked all-pairs fanout); with in-cap labels nb = 1 and the plan
    * degenerates to one group per label, zero replication.
    *
    * The per-group work is a primitive-array loop: the declarative
    * pairwise-join form evaluates the 64-dim dot through Catalyst
    * expression trees per pair — interpreted (higher-order) or
    * JIT-hostile (unrolled), both measured ~5× slower at sf0.1.
    * Arithmetic is bit-identical to the oracle: double products
    * accumulated left-to-right, HALF_UP round. Sub-bucketing uses
    * engine-side xxhash64 — it only routes work; the output pair set is
    * hash-choice-independent (DedupSpec pins it against brute force).
    */
  private[graft] def blockedCosinePairs(s: SparkSession, embeddings: DataFrame,
                                        maxBlock: Int): DataFrame = {
    import s.implicits._
    val nb = embeddings.groupBy(col("label")).agg(
      ceil(count(lit(1)).cast("double") / maxBlock).cast("int").as("nb"))
    embeddings.join(nb, "label")
      .withColumn("k", pmod(xxhash64(col("vec_id")), col("nb")).cast("int"))
      .withColumn("o", explode(sequence(lit(0), col("nb") - 1)))
      .select(col("label"),
        least(col("k"), col("o")).as("i"), greatest(col("k"), col("o")).as("j"),
        col("vec_id"), col("k"), col("embedding"))
      .as[(Int, Int, Int, Long, Int, Array[Float])]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Int, Int, Int), it: Iterator[(Int, Int, Int, Long, Int, Array[Float])]) =>
        val (label, bi, bj) = key
        val sorted = it.toArray.sortBy(_._4)
        val norms = sorted.map(v => math.sqrt(dotD(v._6, v._6)))
        for {
          x <- sorted.indices.iterator
          y <- (x + 1) until sorted.length
          // same-bucket pairs belong to the (i, i) group only
          if bi == bj || sorted(x)._5 != sorted(y)._5
          cos = dotD(sorted(x)._6, sorted(y)._6) / (norms(x) * norms(y))
          if cos >= NearDupCos
        } yield (label, sorted(x)._4, sorted(y)._4, roundHalfUp(cos, 6))
      }
      .toDF("label", "vec_a", "vec_b", "cos_sim")
  }

  /** Left-to-right double dot product — bit-equal to
    * [[VectorFunctions.dot]]/`dotUnrolled` and the oracle's fold.
    */
  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Spark `round(col, n)` semantics for doubles: decimal-string
    * BigDecimal, HALF_UP.
    */
  private def roundHalfUp(d: Double, scale: Int): Double =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The (doc_id, canonical_doc_id) dedup-decision map — signatures →
    * LSH candidates → connected components — computed ONCE per
    * (session, sf-dir) and memoized as a materialized frame. Both
    * q48 (which ships it) and q49 (which filters the corpus with it)
    * read the same materialized result; round 1 recomputed the whole
    * clustering inside q49 (41.8 s of pure duplicate work at sf0.1).
    *
    * Freshness: the memo key carries the documents table's content
    * fingerprint ([[graft.sources.DatasetFingerprint]]), so a dataset
    * rewritten in place misses the memo and recomputes automatically —
    * no manual invalidate to forget.
    * Lifetime is bounded by [[QueryMemo]] (fixed-size LRU);
    * `spark.catalog.clearCache()` between bench queries cannot evict a
    * live entry (checkpoint blocks are not CacheManager state).
    */
  /** The collapsed clustering inputs: (doc_id → rep_id mapping for
    * groups that shingle, representative candidate pairs). Exact
    * duplicates are contracted BEFORE LSH: identical text means an
    * identical signature and identical band keys, so m copies of one
    * template (boilerplate, scraped mirrors — the common corpus-scale
    * skew) otherwise contribute m²·bands/2 candidate rows and m
    * tokenization passes for zero information. One md5 pass groups
    * them (q28's shuffle of (hash, id)); tokenization, banding and the
    * bucket self-join see ONE representative (the group-min doc id) per
    * distinct content. Contracting a clique preserves connectivity
    * exactly, and because each representative is its group's min, the
    * component-min labels are unchanged — DedupSpec pins both the
    * equivalence and the O(groups) candidate count on a 1k-copy
    * template.
    *
    * Groups whose text is too short to shingle are EXCLUDED from the
    * mapping: such docs produce no bands, so the uncollapsed graph
    * never links them — they stay their own canonical (redirecting them
    * to the group min would invent duplicates the LSH semantics don't
    * define).
    */
  private[graft] def collapsedLshInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val hashed = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val reps = hashed.groupBy("h").agg(min("doc_id").as("rep_id"))
    val mapping = hashed.join(reps, "h").select("doc_id", "rep_id")
      .materialize()
    val repSigs = signaturesOf(
        docs.join(mapping.filter(col("doc_id") === col("rep_id"))
          .select("doc_id"), Seq("doc_id"), "left_semi"))
      .materialize()
    val shingledMapping = mapping.join(
        repSigs.select(col("doc_id").as("rep_id")), Seq("rep_id"), "left_semi")
      .select(col("doc_id"), col("rep_id"))
    (shingledMapping, lshCandidates(repSigs))
  }

  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-cluster-labels", s, dir)) {
      val (mapping, cand0) = collapsedLshInputs(s, dir)
      // checkpoint the candidate frame ONCE: the degree sketch below
      // and the CC rounds both consume it, and without materialization
      // each would re-run the whole band self-join pipeline
      val cand = cand0.materialize()
      // `auto`: the degree sketch picks pointer doubling here (the LSH
      // candidate graph is low-skew once exact dups are collapsed) but
      // keeps the star variant armed for a boilerplate hub — the sketch
      // itself is one tiny aggregation over the materialized candidates,
      // amortized by the surrounding memo
      val comp = graft.operators.ConnectedComponents.auto(cand, "doc_a", "doc_b")
      // member → representative → component (groups with no near-dup
      // neighbours have no component row: the group min IS the label)
      val redirect = mapping
        .join(comp.withColumnRenamed("v", "rep_id"), Seq("rep_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("rep_id")).as("canon"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(redirect, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canon"), col("doc_id")).as("canonical_doc_id"))
        .materialize()
    }

  /** Force-drop every memoized derivation for a dataset at its CURRENT
    * fingerprint: the clustering, the signatures it derives from, and
    * the shingle sets (q50). Rewritten-in-place data no longer needs
    * this (the fingerprinted keys miss automatically); it remains for
    * forcing a recompute over unchanged data (e.g. a test that wants a
    * cold path).
    */
  /** Every docsKey-family memo name this module registers. The
    * force-cold hook iterates THIS list, so adding a memoized
    * derivation means adding one name here — not remembering a second
    * call site (the r10 ADVICE gap, twice: sorted-neighborhood-pairs,
    * then dedup-lpa-labels).
    */
  private val DocsMemoFamilies = Seq(
    "dedup-cluster-labels", "dedup-signatures", "dedup-shingle-sets",
    "dedup-shingle-sigs", "dedup-pagerank-ranks", "dedup-pagerank-weighted",
    "dedup-weighted-cands", "dedup-lsh-cands", "dedup-lsh-edges",
    "dedup-lpa-labels")

  def invalidateClusterLabels(s: SparkSession, dir: String): Unit = {
    DocsMemoFamilies.foreach(n => QueryMemo.invalidate(s, docsKey(n, s, dir)))
    // q168/q184's near-miss pair table is fingerprinted on `part`, not
    // `documents` — without this line the force-cold hook could not
    // drop it over unchanged data (r10 ADVICE).
    QueryMemo.invalidate(s, partKey("sorted-neighborhood-pairs", s, dir))
  }

  /** q48 — dedup clustering: LSH candidate pairs → connected components
    * → one canonical id per document (min doc id of its component;
    * un-clustered docs are their own canonical). The decision artifact a
    * dedup pipeline actually ships — "keep doc_id == canonical_doc_id".
    */
  def q48(s: SparkSession, dir: String): DataFrame = clusterLabels(s, dir)

  /** Corpus-filter quality cutoff (q49). */
  val KeepQuality = 0.5

  /** q49 — the end-to-end corpus filter: a document survives iff its
    * quality score clears the bar AND it is its near-dup cluster's
    * canonical member. Composes the text-scoring pass (q34) with the
    * dedup-clustering pass (q48) — the actual keep/drop decision a
    * training-data pipeline emits.
    */
  def q49(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .join(clusterLabels(s, dir), Seq("doc_id"))
      .select(col("doc_id"), col("quality"),
        (col("doc_id") === col("canonical_doc_id")).as("is_canonical"),
        (col("quality") >= KeepQuality &&
          col("doc_id") === col("canonical_doc_id")).as("kept"))

  /** Eval-set source and flag threshold for contamination checking. */
  val EvalSource = "src1"
  val ContamThreshold = 0.2

  /** q50 — benchmark-contamination check: for every non-eval document,
    * the fraction of its distinct word shingles that also appear
    * anywhere in the eval subset (source = [[EvalSource]]), flagged at
    * [[ContamThreshold]]. The decontamination pass every pretraining
    * pipeline runs before shipping a corpus against held-out benchmarks.
    *
    * Scale shape: shingles explode to (doc, shingle) pairs once; the
    * eval vocabulary is a distinct projection of the same relation; the
    * membership test is a semi-join on the shingle (no payload moves)
    * followed by a per-doc count — O(corpus shingles), no pairwise
    * document comparison anywhere.
    */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val sets = checkpointedShingleSets(s, dir).join(docs, "doc_id")
    val pairs = sets.select(col("doc_id"), col("source"),
      explode(col("sh")).as("shingle"))
    val evalShingles = pairs.filter(col("source") === EvalSource)
      .select("shingle").distinct()
    val overlap = pairs.filter(col("source") =!= EvalSource)
      .join(evalShingles, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sets.filter(col("source") =!= EvalSource)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contam_ratio",
        round(col("n_overlap").cast("double") / col("n_shingles"), 4))
      .withColumn("contaminated",
        col("n_overlap").cast("double") / col("n_shingles") >= ContamThreshold)
  }

  /** False-positive budget for the q85 bloom blocklist. */
  val BloomFpp = 0.01

  /** q85 — broadcast-Bloom contamination BLOCKLIST: the shuffle-free
    * alternative to q50's semi-join. The eval set's distinct shingles
    * (a bounded reference set — benchmarks are millions of shingles,
    * never corpus-scale) are folded into one Spark-native
    * `BloomFilter` sketch (`Dataset.stat.bloomFilter`, a mergeable
    * treeAggregate) and broadcast as KBs of bits; the 100 TB corpus
    * side then probes it in a pure projection — per-shingle membership
    * with NO join and NO shuffle of corpus data, where q50 must move
    * every corpus shingle through an exchange. The price is false
    * positives, so the gate row carries the exact hit count (oracle-
    * replayable) plus two Spark-verified bounds, q46-style: Bloom
    * guarantees zero false negatives, and the false-positive excess
    * must sit within 3× the [[BloomFpp]] budget.
    *
    * Driver state is the sketch itself — sized by the EVAL set's
    * cardinality, independent of corpus size — the same bounded-
    * driver-work contract as the IVF centroids.
    */
  def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val pairs = checkpointedShingleSets(s, dir).join(docs, "doc_id")
      .select(col("doc_id"), col("source"), explode(col("sh")).as("shingle"))
    // three consumers (cardinality count, sketch build, gate join) —
    // materialize the bounded eval set once instead of re-running the
    // explode+distinct per action
    val evalShingles = pairs.filter(col("source") === EvalSource)
      .select("shingle").distinct().materialize()
    val bloom = evalShingles.stat.bloomFilter(
      "shingle", math.max(evalShingles.count(), 1L), BloomFpp)
    val bc = s.sparkContext.broadcast(bloom)
    val probed = pairs.filter(col("source") =!= EvalSource)
      .select(col("doc_id"), col("shingle")).as[(Long, String)]
      .map { case (id, sh) => (id, sh, bc.value.mightContain(sh)) }
      .toDF("doc_id", "shingle", "hit")
    // the exact truth rides a broadcast of the same bounded eval set —
    // only for the gate's verification columns, not the decision path
    probed
      .join(broadcast(evalShingles.withColumn("ex", lit(true))),
        Seq("shingle"), "left")
      .agg(count(lit(1)).as("n_checked"),
        // coalesce: a corpus with nothing to probe (every non-eval doc
        // below shingle width) sums over zero rows → NULL, and the
        // gate booleans must still read TRUE like the oracle's
        coalesce(sum(when(col("ex"), 1L).otherwise(0L)), lit(0L))
          .as("n_exact_hits"),
        coalesce(sum(when(col("hit"), 1L).otherwise(0L)), lit(0L))
          .as("n_bloom_hits"),
        coalesce(sum(when(col("ex") && !col("hit"), 1L).otherwise(0L)),
          lit(0L)).as("n_fn"))
      .select(col("n_checked"), col("n_exact_hits"),
        (col("n_fn") === 0L).as("no_false_negatives"),
        ((col("n_bloom_hits") - col("n_exact_hits")).cast("double") <=
          lit(3.0 * BloomFpp) *
            (col("n_checked") - col("n_exact_hits")).cast("double"))
          .as("fp_rate_ok"))
  }

  /** q86 — cross-source duplication MATRIX: which sources mirror each
    * other. For every unordered source pair, the number of near-dup
    * document pairs the two sources share (q48's clusters), computed
    * WITHOUT enumerating member pairs: per (cluster, source) member
    * counts m, then Σ over clusters of m_a·m_b (off-diagonal) or
    * m·(m−1)/2 (within-source) — integer `div`, no doubles. The
    * billion-member boilerplate cluster contributes one compact
    * (cluster, source, m) row per source, and the self-join that forms
    * the pair terms is keyed on the cluster id with ≤ n_sources rows a
    * side — the matrix costs O(clusters · sources), never O(docs²).
    * This is the "where do my mirrors come from" report that decides
    * which ingest feeds to cut.
    */
  def q86(s: SparkSession, dir: String): DataFrame =
    sourceDupMatrix(
      t(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(clusterLabels(s, dir), Seq("doc_id"))
        .select(col("source"), col("canonical_doc_id").as("cluster_id")))

  /** The matrix core, factored for the stress harness: members is any
    * (source, cluster_id) frame; output is the per-source-pair dup-pair
    * count. See [[q86]] for the arithmetic.
    */
  private[graft] def sourceDupMatrix(members: DataFrame): DataFrame = {
    val m = members
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("m"))
      // two self-join consumers; the cluster agg upstream is the
      // expensive part (memoized clustering + one shuffle)
      .materialize()
    val a = m.select(col("cluster_id"), col("source").as("src_a"),
      col("m").as("m_a"))
    val b = m.select(col("cluster_id"), col("source").as("src_b"),
      col("m").as("m_b"))
    // cluster-keyed sort-merge: both sides are O(clusters·sources) and
    // stats-blind behind the checkpoint (the q77 lesson)
    a.join(b.hint("merge"), Seq("cluster_id"))
      .filter(col("src_a") <= col("src_b"))
      .withColumn("pairs",
        expr("CASE WHEN src_a = src_b THEN (m_a * (m_a - 1)) div 2" +
          " ELSE m_a * m_b END"))
      .filter(col("pairs") > 0)
      .groupBy("src_a", "src_b")
      .agg(sum("pairs").as("dup_pairs"),
        count(lit(1)).as("n_clusters"))
  }

  /** q87 — DECONTAMINATION scrub: the transform q50's report
    * motivates. q50 *flags* documents whose shingles overlap the eval
    * set; this drops the offending text — each document is re-chunked
    * ([[ChunkWords]] windows) and a chunk is removed iff any of its
    * word [[ShingleN]]-grams appears anywhere in the eval subset, so a
    * benchmark passage pasted into a web page is cut while the rest of
    * the page survives. Receipt per doc: chunk counts, scrubbed md5
    * (byte-identity proved by the oracle hash), tokens after.
    *
    * The eval set's distinct shingles ride the closure as a broadcast
    * set — bounded by the REFERENCE set (benchmarks, not the corpus),
    * the same driver-state contract as q85's sketch; where a blocklist
    * outgrows exact broadcast, q85's bloom is the drop-in (at the cost
    * of fp chunk drops). The corpus side is one narrow typed pass,
    * zero exchanges.
    */
  def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val evalSh = docs.filter(col("source") === EvalSource)
      .select(col("text")).as[String]
      .flatMap(shingleSet(_)).distinct().collect()
    val bcSet = s.sparkContext.broadcast(evalSh.toSet)
    docs.filter(col("source") =!= EvalSource)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val chunks = wsChunks(text)
        val set = bcSet.value
        scrubReceipt(id, chunks,
          chunks.filterNot(chunkShingleHit(_, set.contains)))
      }
      .toDF("doc_id", "n_chunks", "n_dropped", "scrubbed", "n_tokens_after")
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        md5(col("scrubbed")).as("scrubbed_md5"), col("n_tokens_after"))
  }

  /** q92 — split-LEAKAGE audit: how many near-dup clusters does the
    * per-document split (q60's md5 hash) tear across train/val/test?
    * A near-duplicate of a test document sitting in train is silent
    * eval contamination that document-level decontamination (q50/q87)
    * cannot see — the texts differ, only the cluster knows. One
    * summary row: clusters, multi-doc clusters, leaky clusters, docs
    * inside leaky clusters. Shapes: the (cluster, split) roll-up is
    * two partial-agg shuffles over compact ids; nothing pairwise.
    */
  def q92(s: SparkSession, dir: String): DataFrame = {
    val labeled = t(s, dir, "documents")
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"))
      .join(clusterLabels(s, dir), Seq("doc_id"))
    val per = labeled
      .groupBy(col("canonical_doc_id").as("cluster_id"), col("split"))
      .agg(count(lit(1)).as("n"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_splits"), sum("n").as("n_docs"))
    per.agg(count(lit(1)).as("n_clusters"),
      coalesce(sum(when(col("n_docs") > 1, 1L).otherwise(0L)), lit(0L))
        .as("n_multi_doc"),
      coalesce(sum(when(col("n_splits") > 1, 1L).otherwise(0L)), lit(0L))
        .as("n_leaky"),
      coalesce(sum(when(col("n_splits") > 1, col("n_docs")).otherwise(0L)),
        lit(0L)).as("n_docs_in_leaky"))
  }

  /** q93 — cluster-safe split: the fix for q92's finding. The split
    * hash keys on the CLUSTER id (the canonical doc id), so every
    * member of a near-dup cluster lands in the same split by
    * construction — zero leakage, proven by DedupSpec running the q92
    * audit over these assignments. Canonical documents keep exactly
    * the split q60 gives them (same "split-" prefix on the same id);
    * only non-canonical members move.
    */
  def q93(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .select(col("doc_id"), col("canonical_doc_id").as("cluster_id"),
        splitCol(col("canonical_doc_id")).as("split"))

  /** The "new batch" sources for incremental dedup (q58). */
  val IncomingSources: Seq[String] = Seq("src18", "src19")

  /** q58 — INCREMENTAL dedup: the decision for a new batch against an
    * already-deduped corpus WITHOUT re-clustering the corpus. Candidate
    * edges involving only existing docs are never generated or
    * clustered — the 100 TB side contributes exactly its band keys —
    * and connected components run over the (tiny) incoming-incoming
    * edge set only. Policy: an incoming doc linked to ANY existing doc
    * is a duplicate (`linked_existing`); the survivors keep one
    * canonical per incoming-only cluster (min doc id). A cluster whose
    * canonical matched the corpus drops entirely — its members are
    * transitive duplicates of existing content.
    */
  /** LSH candidate pairs with AT LEAST ONE member in `seedIds`: the
    * seed side's bands join against the full band relation, so pairs
    * internal to the non-seed remainder are never generated — the
    * remainder contributes exactly its band keys. The asymmetric form
    * incremental dedup needs (q58): seed = the new batch.
    */
  private[graft] def lshCandidatesSeeded(sig: DataFrame, seedIds: DataFrame): DataFrame = {
    val bands = sig
      .select(col("doc_id"),
        explode(DedupFunctions.lshBands(col("sig"), NBands, RowsPerBand)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
    bands.join(seedIds, Seq("doc_id"), "left_semi").alias("a")
      .join(bands.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
  }

  /** The incremental keep/drop decision from a flagged candidate-pair
    * relation — the ONE definition of the q58 policy, shared by the
    * batch path (q58, candidates from [[lshCandidatesSeeded]]) and the
    * streaming path ([[graft.streaming.StreamingCorpus]], candidates
    * materialized from [[graft.streaming.StreamingDedup]] through the
    * lake): both surfaces ship the same artifact because they run the
    * same code. `cand` columns: doc_a, doc_b, a_inc, b_inc;
    * existing-existing pairs (both flags false) are ignored by
    * construction, so a candidate source that also observes them (the
    * streaming band state does) needs no pre-filter.
    */
  private[graft] def decisionFromCandidates(inc: DataFrame,
                                            cand: DataFrame): DataFrame = {
    val linked = cand.filter(col("a_inc") =!= col("b_inc"))
      .select(when(col("a_inc"), col("doc_a")).otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    val comp = graft.operators.ConnectedComponents.run(
      cand.filter(col("a_inc") && col("b_inc")), "doc_a", "doc_b")
    inc
      .join(linked.withColumn("linked_existing", lit(true)), Seq("doc_id"), "left")
      .join(comp.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("linked_existing"), lit(false)).as("linked_existing"),
        coalesce(col("comp"), col("doc_id")).as("canonical_doc_id"))
      .withColumn("kept",
        !col("linked_existing") && col("doc_id") === col("canonical_doc_id"))
  }

  def q58(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val inc = docs.filter(col("source").isin(IncomingSources: _*))
      .select(col("doc_id"))
    val cand = lshCandidatesSeeded(checkpointedSignatures(s, dir), inc)
      .join(docs.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .withColumn("a_inc", col("src_a").isin(IncomingSources: _*))
      .withColumn("b_inc", col("src_b").isin(IncomingSources: _*))
      .materialize()
    decisionFromCandidates(inc, cand)
  }

  /** Chunk size in whitespace words for paragraph-level dedup (q69). */
  val ChunkWords = 20

  /** q69 — chunk-level (paragraph) dedup report: split every document
    * into non-overlapping [[ChunkWords]]-word chunks, find chunks whose
    * md5 appears in MORE THAN ONE distinct document, and report each
    * document's duplicated-chunk fraction. This is the boilerplate
    * signal document-level dedup (q28/q29) cannot see: two near-dup
    * docs share most chunks but hash differently as wholes, and a
    * boilerplate header shared by thousands of otherwise-unique pages
    * only ever shows up at chunk granularity.
    *
    * Scale shape: chunking is a narrow typed pass; the chunk STRING
    * dies inside it — only (doc_id, md5) pairs ever shuffle. One
    * partial-agg shuffle on the hash finds cross-doc chunks, a
    * semi-join marks them, and the per-doc counts shuffle compact
    * (doc_id, count) pairs. Nothing pairwise, no text movement.
    * "Shared by ≥2 distinct docs" is decided by `min(doc_id) !=
    * max(doc_id)` — O(1) aggregation state per hash — NOT
    * `countDistinct`, whose per-key distinct set would make the one
    * boilerplate chunk shared by a billion documents a one-reducer
    * billion-id hot key.
    */
  def q69(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        wsChunks(text).iterator.map(c => (id, c))
      }
      .toDF("doc_id", "chunk")
      .select(col("doc_id"), md5(col("chunk")).as("h"))
      .materialize()
    val shared = chunks
      .groupBy("h")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select("h")
    val nChunks = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"))
    // merge hints on BOTH corpus-scaling joins: `shared` (cross-doc
    // chunk hashes) and `nDup` (per-doc counts) grow with the corpus,
    // and the typed chunking pass upstream leaves Catalyst stats-blind
    // — an estimate-driven broadcast of either side is a driver OOM at
    // scale (the q77 lesson, SCALE.md §7); sort-merge on the already-
    // shuffled keys is the plan that survives any corpus size
    val nDup = chunks.join(shared.hint("merge"), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_chunks"))
    nChunks.join(nDup.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        round(coalesce(col("n_dup_chunks"), lit(0L)).cast("double") /
          col("n_chunks").cast("double"), 4).as("dup_chunk_ratio"))
  }

  /** [[ChunkWords]]-word whitespace chunks, single-space re-joined —
    * the ONE chunking definition the chunk-granularity operators
    * (q69/q84/q87) share with their oracles; a chunking change here is
    * a change everywhere or the byte-identity hashes break.
    */
  private def wsChunks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)
      .grouped(ChunkWords).map(_.mkString(" ")).toArray

  /** The cleaning receipt both scrub transforms (q84/q87) emit:
    * (doc_id, n_chunks, n_dropped, scrubbed text, tokens after).
    */
  private def scrubReceipt(id: Long, chunks: Array[String],
                           kept: Array[String])
      : (Long, Long, Long, String, Long) = {
    val scrubbed = kept.mkString(" ")
    (id, chunks.length.toLong, (chunks.length - kept.length).toLong,
      scrubbed, scrubbed.split("\\s+").count(_.nonEmpty).toLong)
  }

  /** True iff any word [[ShingleN]]-gram wholly inside `chunk`
    * satisfies `hit` — the probe q87 and the streaming blocklist share
    * in shape.
    */
  private def chunkShingleHit(chunk: String, hit: String => Boolean): Boolean =
    chunk.split(" ").iterator.sliding(ShingleN).withPartial(false)
      .exists(g => hit(g.mkString(" ")))

  /** q84 — within-document duplicate-chunk SCRUB: the transform q69's
    * report motivates. Each document is re-chunked ([[ChunkWords]]-word
    * windows, q69's granularity) and repeated chunks are dropped
    * keeping the FIRST occurrence, so the boilerplate header pasted
    * five times into one page survives once. Output is the cleaning
    * receipt per document — chunk counts before/after and the md5 of
    * the scrubbed text (the q67 discipline: the hash-match proves the
    * rebuilt BYTES are engine-identical, not just the counts). The
    * scrub canonicalizes whitespace (chunks re-join with single
    * spaces) — documented contract, same as the packing/chunking path.
    *
    * Scale shape: a pure per-document typed pass — no shuffle, no
    * join, nothing leaves the partition; the only state is one doc's
    * chunk set.
    */
  def q84(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val chunks = wsChunks(text)
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        chunks.foreach(seen += _)
        scrubReceipt(id, chunks, seen.toArray)
      }
      .toDF("doc_id", "n_chunks", "n_dropped", "scrubbed", "n_tokens_after")
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        md5(col("scrubbed")).as("scrubbed_md5"), col("n_tokens_after"))
  }

  /** The survivor-selection core, factored for spec coverage on
    * constructed frames: given (doc_id, quality, cluster_id) rows, pick
    * each cluster's highest-quality member (ties broken by min doc_id)
    * as its survivor. One partial-agg shuffle on the cluster key —
    * `max(struct(quality, -doc_id))` carries both the max quality AND
    * the tie-break in O(1) aggregation state, so the billion-member
    * boilerplate cluster stays one compact reducer key (no window sort
    * over the cluster, no two-pass max-then-min) — then one same-key
    * join back to mark members.
    */
  private[graft] def survivorSelect(labeled: DataFrame): DataFrame = {
    val best = labeled.groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg"))).as("b"))
      .select(col("cluster_id"), (-col("b.neg")).as("survivor_id"))
    // both sides are cluster-keyed and corpus-sized; the labeled input
    // descends from a materialized memo frame (stats-blind), so pin
    // sort-merge rather than risk an estimate-driven broadcast of a
    // corpus-scaling side (the q77 lesson, SCALE.md §7)
    labeled.join(best.hint("merge"), Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        col("survivor_id"),
        (col("doc_id") === col("survivor_id")).as("is_survivor"))
  }

  /** q81 — quality-aware survivor selection: the dedup decision a
    * production pipeline actually wants. q48/q49 keep each near-dup
    * cluster's MIN-ID member — an arbitrary survivor; here the cluster
    * keeps its HIGHEST-QUALITY member (q34's score; ties → min doc_id),
    * so deduplication stops discarding the best copy of duplicated
    * content (scraped mirrors differ in boilerplate/truncation, and the
    * min-id copy is often the worst one). Composes the memoized
    * clustering (q48) with the scoring pass (q34); the reference has no
    * notion of this — beyond-reference corpus surface.
    */
  def q81(s: SparkSession, dir: String): DataFrame = {
    val labeled = t(s, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .join(clusterLabels(s, dir), Seq("doc_id"))
      .select(col("doc_id"), col("quality"),
        col("canonical_doc_id").as("cluster_id"))
      // two consumers (the per-cluster agg and the member join): without
      // materialization each re-runs the scoring scan + label join
      .materialize()
    survivorSelect(labeled)
  }

  /** Sliding-window width (words) of the q97 repeated-span scan. */
  val SpanW = 8

  /** Every [[SpanW]]-word window's 32-bit md5 hash, stride 1 — the
    * substring-granular unit below q69's paragraph chunks. One narrow
    * typed flatMap; only (doc_id, hash) longs leave the pass.
    */
  private[queries] def spanHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty)
        if (ws.length < SpanW) Iterator.empty
        else {
          // words UTF-8-encode ONCE per doc; each window then
          // assembles into one reusable byte buffer via arraycopy —
          // the old `sliding(SpanW)` + `mkString` form allocated a
          // collection, a builder, a String, AND its getBytes copy
          // per window position before the digest started (the q167
          // allocation-tax discipline; SCALE.md §33). md5 input bytes
          // are identical because UTF-8 concatenation is
          // byte-concatenation (property-pinned in PropertySpec).
          val wb = ws.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var cap = 0
          var w = 0
          while (w < wb.length) {
            cap = math.max(cap, wb(w).length); w += 1
          }
          val buf = new Array[Byte](SpanW * (cap + 1))
          Iterator.range(0, ws.length - SpanW + 1).map { i =>
            var len = 0
            var j = i
            val end = i + SpanW
            while (j < end) {
              if (j > i) { buf(len) = ' '; len += 1 }
              val wj = wb(j)
              System.arraycopy(wj, 0, buf, len, wj.length)
              len += wj.length
              j += 1
            }
            (id, DedupFunctions.md5Hash32JvmBytes(buf, len))
          }
        }
      }
      .toDF("doc_id", "h")
  }

  /** q97 — cross-document repeated-SPAN detection (the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", at fixed window width): for every
    * document, how many of its [[SpanW]]-word windows (stride 1) also
    * occur verbatim in ANOTHER document. Chunk dedup (q69) sees only
    * aligned paragraph duplication; this catches a sentence quoted
    * mid-paragraph at any offset. Per doc: total windows, windows whose
    * hash is cross-doc shared, and the shared fraction — the
    * "duplicated text inside me" score a scrub pass thresholds on.
    *
    * Scale shape: text dies inside the flatMap; the (doc_id, h) pair
    * frame aggregates to per-(doc, hash) counts (one exchange on the
    * compact pair key), the cross-doc decision is `min(doc_id) !=
    * max(doc_id)` over that frame (O(1) agg state — a billion-doc
    * boilerplate span stays one reducer key, the q69 discipline), and
    * the join back is on the 8-byte hash. Nothing pairwise, nothing
    * driver-side. 32-bit hashes are the engine-wide md5 convention
    * (collision odds ~n²/2³³ per corpus — a production run widens to
    * 64/128-bit by taking more md5 hex chars, same plan).
    */
  def q97(s: SparkSession, dir: String): DataFrame = {
    val perPair = spanHashes(s, dir)
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      // two consumers: the hash-level roll-up and the join back
      .materialize()
    val shared = perPair.groupBy("h")
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("is_shared"))
    val perDoc = perPair.join(shared.hint("merge"), Seq("h"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_spans"),
        sum(when(col("is_shared"), col("c")).otherwise(0L)).as("n_shared"))
    t(s, dir, "documents").select(col("doc_id"))
      // perDoc is corpus-sized and stats-blind behind the checkpoint —
      // pin sort-merge so no estimate ever broadcasts it (q77 lesson)
      .join(perDoc.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_spans"), lit(0L)) === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("n_shared").cast("double") /
            col("n_spans").cast("double"), 4)).as("shared_ratio"))
  }

  /** Fixed iteration count for [[q104]] — part of the cross-engine
    * contract (the oracle unrolls exactly this many rounds).
    */
  val PageRankIters = 5

  /** q104 — PageRank over the near-dup candidate graph (beyond-
    * reference, LLM-pipeline §graph): rank each document by how
    * central it is among its near-duplicates — the authority signal a
    * survivor-selection policy can prefer over q81's length/source
    * heuristics (the most-linked variant of a boilerplate family is
    * usually the canonical one). Demonstrates the engine's SECOND
    * iterative graph primitive beyond [[q48]]'s connected components.
    *
    * The graph is [[lshCandidates]] over the SAME memoized signature
    * pass q29/q58 share, undirected (both edge directions), ranked by
    * [[graft.operators.PageRank]] in exact integer fixed-point — every
    * iteration is order-free long arithmetic, so the 5-round result is
    * bit-identical on any engine and the oracle replays it as 5
    * unrolled SQL stages (see PageRank's scaladoc for why FLOATING
    * PageRank can never pass a cross-engine hash gate).
    *
    * Scale shape: one shuffle per iteration (partial-agg on dst) plus
    * the shared candidate machinery; the 5 fixed iterations chain into
    * ONE declarative action (AQE sizes every exchange — see
    * PageRank.CheckpointInterval for why fixed-k does NOT checkpoint
    * per round like the unbounded CC loop must). Output is one row per
    * node of the candidate graph — dedup-family-sized, not
    * corpus-sized.
    */
  /** The memoized q104 rank artifact: like [[clusterLabels]], the
    * candidate-graph rank pass is a per-dataset derivation with two
    * consumers (q104's report, q108/`keep_policy=authority`'s
    * survivor selection) — it runs once per dataset fingerprint, not
    * once per consumer.
    */
  /** The LSH candidate pair frame over the memoized signatures —
    * itself memoized so the graph consumers (PageRank, triangles,
    * LPA, PPR, k-core, random walks, k-hop, clustering coefficients)
    * share ONE band bucket-join instead of re-running it per query.
    */
  private[graft] def candidatePairs(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-lsh-cands", s, dir)) {
      lshCandidates(checkpointedSignatures(s, dir)).materialize()
    }

  /** The undirected edge list over [[candidatePairs]] — memoized and
    * checkpointed so every iterative graph consumer reads one doubled
    * materialized frame instead of re-expanding and re-checkpointing
    * its own copy per query.
    */
  private def candidateEdges(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-lsh-edges", s, dir)) {
      val cand = candidatePairs(s, dir)
      cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .materialize()
    }

  private[graft] def pageRankRanks(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-pagerank-ranks", s, dir)) {
      val edges = candidateEdges(s, dir)
      graft.operators.PageRank.run(edges, PageRankIters)
        .select(col("id").as("doc_id"), col("rank").as("pr_rank"),
          col("outdeg").as("degree"))
        .materialize()
    }

  def q104(s: SparkSession, dir: String): DataFrame = pageRankRanks(s, dir)

  /** q112 — TRIANGLE COUNTING on the near-dup candidate graph (the
    * third graph primitive beside CC and PageRank): a node's triangle
    * count measures how CLIQUE-LIKE its dup family is — mutual
    * near-dups (mirror sets) triangle densely, chain-shaped false-
    * positive runs (A~B~C without A~C) do not, so the count separates
    * "true mirror family" from "LSH chaining artifact" before anything
    * is dropped. Exact integers, trivially hash-gateable.
    *
    * Algorithm: the ordered-edge (forward) join — candidates already
    * arrive as `doc_a < doc_b`, so triangles a<b<c are exactly
    * `ab ⋈ bc ⋈ ac` on the ordered edge set: each triangle counted
    * once, no orientation pass needed. Work is bounded by
    * Σ d⁺(v)² over the ID-ordered orientation, and the band cap
    * already bounds degrees — the standard scale story for triangle
    * enumeration, on a graph that is dup-family-sized to begin with.
    */
  def q112(s: SparkSession, dir: String): DataFrame =
    graft.operators.TriangleCount.perNode(
        candidatePairs(s, dir)
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("n_triangles"))

  /** Fixed-point scale for q107's edge weights: verified Jaccard in
    * units of 10⁻⁶, floored at 1 so every LSH-verified candidate edge
    * keeps the graph connected (a hash-collision pair with zero true
    * overlap degrades to the minimum weight instead of vanishing).
    * `PageRank.DefaultScale · 10⁶ < 2⁶³`, the overflow bound
    * [[graft.operators.PageRank.runWeighted]] documents.
    */
  val JaccardWeightScale = 1000000L

  /** q107 — WEIGHTED PageRank over the near-dup candidate graph: q104
    * ranks the topology alone; here each edge carries its q31-verified
    * Jaccard as an integer fixed-point weight, so a source's damped
    * mass splits `(damped · w) div Σw` — rank now reflects HOW similar
    * a doc is to its neighbors, not just how many neighbors it has
    * (the 0.95-Jaccard twin of a boilerplate family outranks a
    * tangentially-colliding page of equal degree). Same integer
    * discipline end-to-end — weights, splits, and sums are all
    * non-negative long floor arithmetic — so the 5-round result
    * hash-gates against the unrolled weighted SQL replay.
    *
    * Scale shape: identical to q104 (one partial-agg shuffle per
    * iteration, candidates bounded by the band cap) plus q31's
    * verify join, which only ever touches the candidate pairs.
    */
  /** Authority-based survivor selection over precomputed cluster
    * labels and PageRank ranks — the frame-level op
    * [[graft.jobs.CorpusPrepare]]'s `keep_policy=authority` shares
    * with [[q108]]: per cluster keep the member with the highest
    * graph-authority rank (ties and rankless members → min doc_id).
    * Members outside the candidate graph (exact-dup collapsees,
    * singletons) carry no rank and lose to any ranked member — a
    * doc with near-dup edges is by construction better-attested than
    * one reached only through exact collapse. groupBy-argmax like
    * [[survivorSelect]] (bounded agg state, no per-cluster window),
    * merge-hinted join for the same stats-blind-memo reason.
    */
  private[graft] def authoritySurvivors(labels: DataFrame,
                                        ranks: DataFrame): DataFrame = {
    val labeled = labels
      .select(col("doc_id"), col("canonical_doc_id").as("cluster_id"))
      .join(ranks.select(col("doc_id"), col("pr_rank")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("pr_rank"), lit(-1L)).as("rank_or"))
    val best = labeled.groupBy("cluster_id")
      .agg(max(struct(col("rank_or"), (-col("doc_id")).as("neg"))).as("b"))
      .select(col("cluster_id"), (-col("b.neg")).as("survivor_id"))
    labeled.join(best.hint("merge"), Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"),
        when(col("rank_or") >= 0L, col("rank_or")).as("pr_rank"),
        col("survivor_id"),
        (col("doc_id") === col("survivor_id")).as("is_survivor"))
  }

  /** Core-depth survivor selection over precomputed cluster labels and
    * [[q131]] peel results — `keep_policy=core`'s frame-level op: per
    * cluster keep the member with the greatest k-core ONION DEPTH
    * (in-core = ∞, peel round otherwise; ties → max degree, then min
    * doc_id). Where authority ([[authoritySurvivors]]) keeps the
    * most-LINKED member, core depth keeps the best-SUPPORTED one —
    * the member whose near-dup attestations survive the most rounds
    * of pendant-stripping, i.e. the least likely to be an LSH
    * chaining artifact. Members outside the candidate graph carry
    * depth −1 and lose to any graph-attested member (the
    * authority-policy precedent). Same groupBy-argmax shape: bounded
    * agg state, no per-cluster window, merge-hinted join back.
    */
  private[graft] def coreSurvivors(labels: DataFrame,
                                   peels: DataFrame): DataFrame = {
    val labeled = labels
      .select(col("doc_id"), col("canonical_doc_id").as("cluster_id"))
      .join(peels.select(col("doc_id"),
        when(col("in_core"), Long.MaxValue).otherwise(col("peel_round"))
          .as("depth0"),
        col("degree").as("degree0")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("depth0"), lit(-1L)).as("depth"),
        coalesce(col("degree0"), lit(0L)).as("degree"))
    val best = labeled.groupBy("cluster_id")
      .agg(max(struct(col("depth"), col("degree"), (-col("doc_id")).as("neg")))
        .as("b"))
      .select(col("cluster_id"), (-col("b.neg")).as("survivor_id"))
    labeled.join(best.hint("merge"), Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("depth"), col("degree"),
        col("survivor_id"),
        (col("doc_id") === col("survivor_id")).as("is_survivor"))
  }

  /** q108 — authority survivor selection: q81 keeps each near-dup
    * cluster's highest-QUALITY member; here the cluster keeps its
    * highest-AUTHORITY member by q104's integer PageRank (the
    * most-linked variant of a near-dup family is usually the canonical
    * one — link authority where q81 is content quality). Composes the
    * memoized clustering (q48) with the rank pass (q104); the exact
    * integer ranks make the whole selection hash-gateable. The DAG's
    * `keep_policy=authority` runs this same selection (JobsSpec pins
    * the equality).
    */
  def q108(s: SparkSession, dir: String): DataFrame =
    authoritySurvivors(clusterLabels(s, dir), q104(s, dir))

  def q107(s: SparkSession, dir: String): DataFrame =
    // memoized like [[pageRankRanks]] — the weighted rank artifact is
    // a per-dataset derivation (one verify join + 5 rank iterations)
    QueryMemo.get(s, docsKey("dedup-pagerank-weighted", s, dir)) {
      q107Cold(s, dir).materialize()
    }

  /** The Jaccard-weighted candidate edge list (doc_a, doc_b, weight)
    * q107 and q127 share: LSH candidates verified against the true
    * shingle sets, similarity in [[JaccardWeightScale]] fixed point,
    * floored at 1 so hash-collision pairs degrade instead of
    * vanishing.
    */
  /** Jaccard-weighted candidate pairs — memoized (the signature-pass
    * discipline) so q107's weighted PageRank and q127's weighted
    * communities share one bucket-join + intersect-verify pass.
    */
  private def weightedCandidates(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-weighted-cands", s, dir)) {
      weightedCandidatesCold(s, dir).materialize()
    }

  private[graft] def weightedCandidatesCold(s: SparkSession, dir: String): DataFrame = {
    val both = shingleSigs(s, dir)
    lshCandidates(both.select(col("doc_id"), col("sig")))
      .join(both.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(both.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.expressions.SetExpressions.intersectSizeSorted(col("sh_a"), col("sh_b")).cast("long").as("inter"),
        (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("szsum"))
      .select(col("doc_a"), col("doc_b"),
        greatest(lit(1L),
          expr(s"(inter * ${JaccardWeightScale}L) div (szsum - inter)"))
          .as("weight"))
  }

  private def q107Cold(s: SparkSession, dir: String): DataFrame = {
    val wcand = weightedCandidates(s, dir)
    val edges = wcand
      .select(col("doc_a").as("src"), col("doc_b").as("dst"), col("weight"))
      .union(wcand
        .select(col("doc_b").as("src"), col("doc_a").as("dst"), col("weight")))
    graft.operators.PageRank.runWeighted(edges, PageRankIters)
      .select(col("id").as("doc_id"), col("rank").as("pr_rank"),
        col("outdeg").as("w_degree"))
  }

  /** q127 — WEIGHTED label-propagation communities: q117's majority
    * vote with each neighbor's vote weighted by its q31-verified
    * Jaccard (1e-6 fixed point, floor 1) — a 0.95-similarity twin
    * outvotes a pile of minimum-weight hash-collision edges, so
    * communities track similarity STRENGTH, not just adjacency (the
    * q107-vs-q104 refinement applied to partitioning instead of
    * ranking). Same determinism contract (synchronous rounds, integer
    * weight sums, min-label ties), same unrolled-SQL replay.
    *
    * Scale shape: q117's per-round cost plus q107's verify join,
    * which only touches candidate pairs.
    */
  def q127(s: SparkSession, dir: String): DataFrame = {
    val wcand = weightedCandidates(s, dir)
    val edges = wcand
      .select(col("doc_a").as("src"), col("doc_b").as("dst"), col("weight"))
      .union(wcand
        .select(col("doc_b").as("src"), col("doc_a").as("dst"), col("weight")))
    val comm = graft.operators.LabelPropagation.runWeighted(edges, LpaIters)
      .select(col("id").as("doc_id"), col("community"))
      .materialize() // two consumers: member rows + the size roll-up
    val sizes = comm.groupBy("community").agg(count(lit(1)).as("n_members"))
    comm.join(sizes.hint("merge"), Seq("community"))
      .select(col("doc_id"), col("community"), col("n_members"))
  }

  /** Fixed synchronous round count for [[q117]] — part of the
    * cross-engine contract (the oracle unrolls exactly this many
    * rounds; see [[graft.operators.LabelPropagation]] for why LPA
    * fixes rounds instead of running to convergence).
    */
  val LpaIters = 3

  /** q117 — label-propagation COMMUNITIES over the near-dup candidate
    * graph: the fourth graph primitive (CC q48, PageRank q104/q107,
    * triangles q112). Where q48's components merge everything
    * reachable — one LSH chaining edge fuses two unrelated mirror
    * families into a single cluster — LPA's majority vote keeps
    * densely-connected families apart: a vertex adopts the label most
    * of ITS neighbors carry, so a single bridge edge loses the vote
    * against a family's internal edges. Comparing q117 communities
    * against q48 components is exactly the "is this cluster one family
    * or a chaining artifact?" diagnostic q112's triangle density
    * scores pointwise, now as an actual partition of the graph.
    *
    * Deterministic by construction (synchronous rounds, min-label
    * tie-break, integer labels — see the operator scaladoc), so the
    * [[LpaIters]]-round result hash-gates against the unrolled SQL
    * replay. Output: each candidate-graph member, its community label,
    * and the community size.
    *
    * Scale shape: per round one |E|-pair join + two partial-agg
    * exchanges (the PageRank iteration cost), chained into one
    * AQE-sized action; the size roll-up is one more partial agg plus a
    * merge-hinted join (stats-blind memo input — the q77 lesson).
    */
  def q117(s: SparkSession, dir: String): DataFrame = {
    val edges = candidateEdges(s, dir)
    val comm = graft.operators.LabelPropagation.run(edges, LpaIters)
      .select(col("id").as("doc_id"), col("community"))
      // two consumers (member rows + the size roll-up): materialize the
      // fixed-round derivation once
      .materialize()
    val sizes = comm.groupBy("community").agg(count(lit(1)).as("n_members"))
    comm.join(sizes.hint("merge"), Seq("community"))
      .select(col("doc_id"), col("community"), col("n_members"))
  }

  /** LPA-community cluster labels — the [[clusterLabels]] twin with
    * [[graft.operators.LabelPropagation]] in place of connected
    * components: same exact-dup collapse, same member→rep redirect,
    * but the rep graph is partitioned by majority-vote communities
    * instead of transitive reachability, so one LSH chaining edge no
    * longer fuses two unrelated mirror families into a single cluster
    * (the q117 rationale, as a DAG-consumable dedup artifact). The
    * canonical is pinned to the MIN MEMBER of each community — an LPA
    * label itself need not survive as a member, and
    * `keep_policy=canonical` keeps `doc_id === canonical_doc_id` rows,
    * so an absent-label canonical would silently drop whole
    * communities (JobsSpec pins membership). Because labels only ever
    * travel along edges, every community is contained in one CC
    * component: the LPA partition REFINES q48's clustering —
    * `cluster_policy=lpa` can only keep MORE documents, never fewer
    * (JobsSpec pins the refinement).
    *
    * Memoized per dataset fingerprint like [[clusterLabels]]; same
    * per-round cost anatomy as the CC pass it replaces.
    */
  private[graft] def lpaClusterLabels(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, docsKey("dedup-lpa-labels", s, dir)) {
      val (mapping, cand0) = collapsedLshInputs(s, dir)
      val cand = cand0.materialize()
      val edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val comm = graft.operators.LabelPropagation.run(edges, LpaIters)
        .materialize() // two consumers: the canon agg + the member join
      val canon = comm.groupBy("community").agg(min(col("id")).as("canon"))
      val repCanon = comm.join(canon.hint("merge"), Seq("community"))
        .select(col("id").as("rep_id"), col("canon"))
      val redirect = mapping
        .join(repCanon, Seq("rep_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canon"), col("rep_id")).as("canon"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(redirect, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canon"), col("doc_id")).as("canonical_doc_id"))
        .materialize()
    }

  /** q124 — local clustering coefficient per candidate-graph node:
    * `cc = 2·T / (d·(d−1))` — the triangle count (q112) normalized by
    * the node's possible wedge count, in 10⁻⁶ fixed point (exact
    * integers end-to-end; NULL for degree < 2, where the coefficient
    * is undefined). This is the per-node DENSITY SCORE the q112
    * scaladoc motivates, made scale-free: a 3-clique member and a
    * 50-clique member both score 1.0, while a chain vertex scores 0 —
    * the direct "is my dup family a mirror set or an LSH chaining
    * artifact?" number, comparable across family sizes.
    *
    * Scale shape: q112's bounded forward-join plus one degree
    * aggregation over the same checkpointed candidate frame and a
    * merge-hinted id join — no new shuffle class.
    */
  def q124(s: SparkSession, dir: String): DataFrame = {
    val cand = candidatePairs(s, dir) // memo frame is already checkpointed
    val tri = graft.operators.TriangleCount.perNode(
      cand.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val deg = cand.select(col("doc_a").as("id"))
      .union(cand.select(col("doc_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    tri.join(deg.hint("merge"), Seq("id"))
      .select(col("id").as("doc_id"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2L,
          expr("(2 * n_triangles * 1000000) div (degree * (degree - 1))"))
          .as("cc_1e6"))
  }

  /** q125 — PERSONALIZED PageRank from a seed document: rank every
    * candidate-graph member by graph proximity to the seed (the
    * random surfer restarts at the seed, so mass concentrates in ITS
    * dup family and decays with distance) — "what else is effectively
    * this document?" asked of the graph rather than of pairwise
    * similarity, and the query-side twin of the global authority rank
    * (q104 ranks the whole graph; PPR ranks around one point). Seed =
    * the smallest doc_id in the candidate graph (deterministic; any
    * doc_id works the same way). Exact integer fixed point like the
    * whole PageRank family — the [[LpaIters]]-style unrolled SQL
    * replay hash-gates every rank.
    *
    * Scale shape: identical per-round cost to q104 (one partial-agg
    * shuffle), one broadcast seed-marker join at setup; at 100 TB a
    * deployment batches many seeds through
    * [[graft.operators.PageRank.runPersonalized]] by widening the
    * seed frame — the plan is seed-count-free.
    */
  def q125(s: SparkSession, dir: String): DataFrame = {
    val edges = candidateEdges(s, dir) // seed agg + every rank round
    val seeds = edges.agg(min(col("src")).as("id"))
    graft.operators.PageRank.runPersonalized(edges, PageRankIters, seeds)
      .select(col("id").as("doc_id"), col("rank").as("ppr_rank"),
        col("outdeg").as("degree"), col("is_seed"))
  }

  /** k-core threshold and fixed synchronous round count for [[q131]] —
    * like [[LpaIters]], part of the cross-engine contract (the oracle
    * unrolls exactly [[KCoreRounds]] peels; see
    * [[graft.operators.KCore]] for why fixed rounds, not fixpoint).
    */
  val KCoreK = 2
  val KCoreRounds = 4

  /** q131 — fixed-round k-core peel of the near-dup candidate graph:
    * the fifth graph primitive (CC q48, PageRank q104/q107, triangles
    * q112, LPA q117). The 2-core strips pendants and chains — every
    * vertex LSH banding attached by a single collision edge — leaving
    * only members with ≥2 independent near-dup witnesses, and the peel
    * round is each vertex's onion depth (round-1 casualties are
    * pendants; survivors sit inside mutually-supporting families).
    * Where q124's clustering coefficient scores density POINTWISE,
    * the k-core answers it as a subgraph: the support-floor complement
    * to LPA's partition and the triangle census.
    *
    * Exact integers and set membership end-to-end — the
    * [[KCoreRounds]]-round peel hash-gates against the unrolled SQL
    * replay. Output: every candidate-graph member, its initial degree,
    * its peel round (NULL = survived), and the in-core flag.
    *
    * Scale shape: per round one |E|-pair equi-join + partial-agg
    * degree count + semi/anti pair, on an alive set that only shrinks;
    * fixed rounds chain into one AQE-sized action (the q117 anatomy).
    */
  def q131(s: SparkSession, dir: String): DataFrame = {
    val edges = candidateEdges(s, dir) // every peel round consumes it
    graft.operators.KCore.peel(edges, KCoreK, KCoreRounds)
      .select(col("id").as("doc_id"), col("degree"), col("peel_round"),
        col("in_core"))
  }

  /** q147 — MINHASH ESTIMATOR CALIBRATION: for every LSH candidate
    * pair, the matched-signature-slot count (the q29 estimate, kept as
    * an exact INTEGER 0..[[NPerms]] instead of its rounded ratio)
    * against the exact verified Jaccard, rolled up per estimate value
    * — the calibration table that says how biased the 16-permutation
    * estimator is at each similarity level (MinHash is unbiased in
    * expectation; at k=16 the per-pair quantization is ±0.0625 and
    * candidate selection CONDITIONS on banding collisions, so the
    * observed conditional bias is exactly what a dedup-threshold
    * tuner needs to see). All integer fixed point — mean true Jaccard
    * is a floored 10⁻⁶ ratio — so the table hash-gates.
    *
    * Scale shape: the one memoized tokenization pass (q31's
    * discipline), the candidate-bounded verify join, and a ≤ 17-row
    * roll-up. Nothing corpus-quadratic anywhere.
    */
  def q147(s: SparkSession, dir: String): DataFrame = {
    val both = shingleSigs(s, dir)
    val matched = (0 until NPerms)
      .map(i => when(col("sig_a").getItem(i) === col("sig_b").getItem(i), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    val inter = graft.expressions.SetExpressions.intersectSizeSorted(col("sh_a"), col("sh_b")).cast("long")
    lshCandidates(both.select(col("doc_id"), col("sig")))
      .join(both.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("sh").as("sh_a")), "doc_a")
      .join(both.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("sh").as("sh_b")), "doc_b")
      .select(matched.as("est_sixteenths"),
        expr("size(sh_a)").cast("long").as("na"),
        expr("size(sh_b)").cast("long").as("nb"), inter.as("inter"))
      .select(col("est_sixteenths"),
        expr("(inter * 1000000) div (na + nb - inter)").as("tj"))
      .groupBy("est_sixteenths")
      .agg(count(lit(1)).as("n_pairs"), sum(col("tj")).as("stj"))
      .select(col("est_sixteenths"), col("n_pairs"),
        expr("stj div n_pairs").as("mean_true_j_1e6"),
        expr(s"(est_sixteenths * 1000000) div $NPerms").as("est_1e6"),
        expr(s"(est_sixteenths * 1000000) div $NPerms - stj div n_pairs")
          .as("bias_1e6"))
  }

  /** q148 — DEDUP SAVINGS report: per multi-member cluster, how many
    * members and characters the canonical-only keep policy removes —
    * the ROI table a data-engineering review reads BEFORE running a
    * destructive dedup ("this family is 40% of the corpus bytes; that
    * one is noise"), and the per-cluster breakdown behind the q49
    * end-to-end filter's aggregate effect. Character counts ride the
    * lake's exact `n_chars` column — all integer, hash-gated.
    *
    * Scale shape: the memoized clustering (q48) joined once against
    * the (doc_id, n_chars) projection, one partial-agg shuffle on
    * cluster id; the `n_members ≥ 2` cut bounds output to actual dup
    * families. The conditional canonical-chars sum rides the same
    * aggregation — no second join.
    */
  def q148(s: SparkSession, dir: String): DataFrame =
    q48(s, dir)
      .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
      .groupBy(col("canonical_doc_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("doc_id") === col("canonical_doc_id"), col("n_chars"))
          .otherwise(0L)).as("canonical_chars"))
      .filter(col("n_members") >= 2L)
      .select(col("cluster_id"), col("n_members"), col("total_chars"),
        col("canonical_chars"),
        (col("total_chars") - col("canonical_chars")).as("saved_chars"),
        expr("((total_chars - canonical_chars) * 1000000) div total_chars")
          .as("saved_share_1e6"))

  /** Fixed walk length for [[q151]] — like [[LpaIters]], part of the
    * cross-engine contract (the oracle unrolls exactly this many
    * hops).
    */
  val WalkLen = 3

  /** q151 — DETERMINISTIC RANDOM WALKS over the near-dup candidate
    * graph: one [[WalkLen]]-hop walk from every node, next hop chosen
    * by `md5('walk-' ++ cur ++ '-' ++ step) mod degree` over the
    * node's SORTED neighbor list — the DeepWalk/node2vec walk-corpus
    * generator (walks are the training data graph-embedding models
    * consume), made hash-gateable: hash-driven choice over a sorted
    * adjacency is a pure function of the edge set, so both engines
    * produce bit-identical walks where a seeded RNG never could
    * across runtimes (the q43/q60 hash-sampling discipline applied to
    * graph traversal — and per-(node, step) hashing is exactly how a
    * distributed walker avoids coordinating RNG state across
    * executors at 100 TB).
    *
    * Scale shape: adjacency build is one partial agg over the
    * candidate edges (neighbor arrays band-cap-bounded); each hop is
    * one equi-join against the checkpointed adjacency — [[WalkLen]]
    * joins chained into one AQE-sized action, the fixed-k loop shape.
    */
  def q151(s: SparkSession, dir: String): DataFrame = {
    val edges = candidateEdges(s, dir)
    val adj = edges.groupBy("src")
      .agg(sort_array(collect_set(col("dst"))).as("nbrs"))
      .materialize() // one consumer per hop
    var walk = adj.select(col("src").as("start_id"), col("src").as("cur"))
    (1 to WalkLen).foreach { t =>
      val h = DedupFunctions.md5Hash32(
        concat(lit("walk-"), col("cur").cast("string"), lit(s"-$t")))
      val kept = (Seq(col("start_id")) ++
        (1 until t).map(i => col(s"s$i"))) :+
        col("nxt").as(s"s$t") :+ col("nxt").as("cur")
      walk = walk
        .join(adj.withColumnRenamed("src", "cur"), Seq("cur"))
        .withColumn("nxt", element_at(col("nbrs"),
          (pmod(h, size(col("nbrs"))) + 1).cast("int")))
        .select(kept: _*)
    }
    walk.select(col("start_id") +:
      (1 to WalkLen).map(i => col(s"s$i")): _*)
  }

  /** q153 — per-source PIPELINE FUNNEL card: how many documents each
    * source contributes at every curation stage — raw → quality pass
    * (q34/q49's bar) → dedup canonical (q48) → kept (both) → train
    * split (q60's hash) — the observability table a 100 TB intake
    * review reads to see WHERE each source's documents die ("src7
    * loses 60% to dedup: it's a mirror; src3 loses everything to
    * quality: it's spam"). Pure exact counts over the shared memoized
    * derivations; one row per source, one partial-agg shuffle.
    */
  def q153(s: SparkSession, dir: String): DataFrame =
    q49(s, dir)
      .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("quality") >= KeepQuality, 1L).otherwise(0L))
          .as("n_quality"),
        sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept") && col("split") === "train", 1L).otherwise(0L))
          .as("n_train"))

  /** Fixed hop budget for [[q155]] — the oracle unrolls exactly this
    * many frontier expansions.
    */
  val ReachHops = 3

  /** q155 — K-HOP REACH (hop-bounded BFS) from the seed document:
    * every candidate-graph member within [[ReachHops]] hops of the
    * q125 seed (min doc_id), labeled with its exact hop distance —
    * the hop-count complement to q125's personalized PageRank (PPR
    * ranks proximity by random-walk mass; BFS answers the sharper
    * "HOW FAR is this near-dup, transitively?" that a contamination
    * investigation walks: doc → its dups → THEIR dups). Frontier
    * expansion with min-hop retention is exact integers — unrolled
    * SQL replay, hash-gated.
    *
    * Scale shape: per hop one frontier⋈edges equi-join + a min-hop
    * partial agg against the visited set — frontier-sized, not
    * graph-sized; [[ReachHops]] hops chain into one AQE-sized action
    * (the fixed-k loop shape). At 100 TB a deployment widens the
    * seed frame exactly like PPR's batched seeds.
    */
  def q155(s: SparkSession, dir: String): DataFrame = {
    val edges = candidateEdges(s, dir) // seed agg + every hop
    val seed = edges.agg(min(col("src")).as("id"))
    var reach = seed.select(col("id"), lit(0L).as("hop"))
    (1 to ReachHops).foreach { h =>
      val frontier = reach.filter(col("hop") === (h - 1).toLong)
        .select(col("id").as("src"))
      val next = edges.join(frontier, Seq("src"))
        .select(col("dst").as("id"), lit(h.toLong).as("hop"))
      reach = reach.union(next)
        .groupBy("id").agg(min(col("hop")).as("hop"))
    }
    reach.select(col("id").as("doc_id"), col("hop"))
  }

  /** q168's neighborhood width (records ahead compared per pass) and
    * edit-distance verification ceiling. Shared with the oracle.
    */
  val SnWindow = 2
  val SnMaxEdit = 2

  /** q168 — MULTI-PASS SORTED-NEIGHBORHOOD blocking (Hernández–
    * Stolfo): find near-miss name pairs by sorting the name DICTIONARY
    * on two keys (the name, and its reversal — a prefix typo sorts far
    * apart on pass 1 but adjacent on pass 2), comparing each entry
    * only with its [[SnWindow]] successors inside a first-character
    * block, and verifying survivors with exact edit distance ≤
    * [[SnMaxEdit]] — the classic O(n·w) entity-resolution candidate
    * generator where all-pairs would be O(n²), and the string-typo
    * complement to q100's numeric fuzzy join and q29's set-similarity
    * LSH. Dedup to the dictionary FIRST: neighbors are computed over
    * distinct names (with record counts carried), so a million rows of
    * "blue bolt" cost one dictionary entry, not a million window rows.
    *
    * Scale shape: one partial-agg rollup to the dictionary, two
    * block-partitioned windows over it (blocks keep every sort
    * task-local — no global sort), a distinct on oriented pairs, and
    * the edit-distance verify runs ONLY on 2·w·|dict| candidates.
    */
  def q168(s: SparkSession, dir: String): DataFrame =
    // the verified near-miss pair table is a per-dataset artifact
    // (the basket-tables discipline): q184's entity resolution
    // consumes exactly this frame, so the two sort passes and the
    // edit-distance verify run once per lake
    QueryMemo.get(s, partKey("sorted-neighborhood-pairs", s, dir)) {
      q168Cold(s, dir).materialize()
    }

  private[graft] def q168Cold(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val names = t(s, dir, "part")
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("cnt"))
      .materialize() // dictionary-sized; two sort passes + 2 joins
    def pass(key: Column): DataFrame = {
      val w = Window.partitionBy(substring(key, 1, 1))
        .orderBy(key.asc, col("name").asc)
      names.select(col("name") +: (1 to SnWindow).map(k =>
          lead(col("name"), k).over(w).as(s"c$k")): _*)
        .select(col("name"), explode(array((1 to SnWindow).map(k =>
          col(s"c$k")): _*)).as("cand"))
        .filter(col("cand").isNotNull && col("cand") =!= col("name"))
    }
    val pairs = pass(col("name")).unionAll(pass(reverse(col("name"))))
      .select(least(col("name"), col("cand")).as("name_a"),
        greatest(col("name"), col("cand")).as("name_b"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= SnMaxEdit)
      .join(names.select(col("name").as("name_a"), col("cnt").as("n_a")),
        Seq("name_a"))
      .join(names.select(col("name").as("name_b"), col("cnt").as("n_b")),
        Seq("name_b"))
      .select(col("name_a"), col("name_b"), col("dist").cast("long")
        .as("dist"), col("n_a"), col("n_b"))
  }

  /** q169's rolling-hash geometry: a boundary fires where the
    * [[CdcWindow]]-char gear hash ≡ 0 (mod [[CdcMask]]) — expected
    * chunk ≈ [[CdcMask]] chars. Shared with the oracle.
    */
  val CdcWindow = 6
  val CdcMask = 64L

  /** q169 — CONTENT-DEFINED CHUNKING dedup (the rsync/LBFS/FastCDC
    * primitive): cut every document where a rolling gear hash of the
    * last [[CdcWindow]] chars hits 0 mod [[CdcMask]], hash the
    * chunks, and report the corpus-wide duplicated-chunk mass — the
    * shift-robust sub-document dedup that fixed-grid chunking (q69)
    * cannot do: insert one char and a fixed grid re-cuts EVERY
    * downstream chunk, while CDC boundaries (a pure function of local
    * content) re-align after one chunk. The classic sequential
    * formulation (`h = 2h + gear(c)` carried char-to-char) looks
    * unparallelizable — but `2^(i-j) ≡ 0 (mod 2^m)` for `i-j ≥ m`, so
    * the boundary test at position i depends on ONLY the trailing
    * log₂(mask) chars: the scan is embarrassingly parallel and fully
    * declarative in both engines. No min-chunk floor (that clause IS
    * sequential — each cut's acceptance would depend on the previous
    * accepted cut); the mask sets expected chunk size instead, and
    * tiny chunks just dilute savings slightly.
    *
    * Scale shape: ONE narrow typed pass — each doc's O(len) rolling
    * loop ([[graft.functions.TextJvm.cdcChunks]]) emits its chunks
    * directly (a per-position SQL `substring` would re-seek from the
    * string head and go O(len²) per doc — measured 8 s vs 0.9 s at
    * sf0.1); chars cross the one exchange as whole chunk strings into
    * the (hash, len) partial agg; the report is one row.
    *
    * Units: savings are measured in CHARACTERS (Spark/DuckDB
    * `length()` both count codepoints) and the columns say so —
    * byte ROI on a non-ASCII corpus would need octet lengths.
    */
  def q169(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perChunk = t(s, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("text")).as[String]
      .flatMap(graft.functions.TextJvm.cdcChunks(_, CdcWindow, CdcMask))
      .toDF("chunk")
      .groupBy(md5(col("chunk").cast("binary")).as("h"),
        length(col("chunk")).as("l"))
      .agg(count(lit(1)).as("n"))
    perChunk.agg(
      sum(col("n")).as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      (sum(col("n")) - count(lit(1))).as("dup_instances"),
      sum(col("l").cast("bigint") * col("n")).as("chars_total"),
      sum(col("l").cast("bigint")).as("chars_distinct"))
      .withColumn("savings_1e6",
        expr("((chars_total - chars_distinct) * 1000000) div chars_total"))
  }

  /** q182's guards: a chunk shared by more than [[CdcMaxChunkDocs]]
    * docs is boilerplate (excluded from pairing, the q133 degenerate-
    * basket discipline); a pair must share ≥ [[CdcMinShared]] chunks.
    */
  val CdcMaxChunkDocs = 50L
  val CdcMinShared = 2L

  /** q182 — CDC CHUNK CONTAINMENT pairs: which documents share
    * content-defined chunks, and how much — `containment =
    * |A∩B| / min(|A|,|B|)` over each doc's distinct chunk SET — the
    * Broder resemblance/containment measure computed on q169's
    * shift-robust chunks: it catches partial inclusion (one doc
    * embedded in another, quote farms, template + payload) that
    * whole-doc MinHash (q29) dilutes away and fixed-grid chunks (q69)
    * miss under any insertion. Ultra-common chunks are excluded
    * before pairing ([[CdcMaxChunkDocs]] — boilerplate pairs
    * everything with everything; the q133 guard), and pairs need
    * [[CdcMinShared]] shared chunks.
    *
    * Scale shape: one O(len) typed chunking pass; the pair join is on
    * chunk hashes with per-hash fan-out provably ≤
    * [[CdcMaxChunkDocs]]² — candidate generation bounded the LSH way,
    * never all-pairs; sizes broadcast back onto the pair rollup.
    */
  def q182(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunkSets = t(s, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, tx) =>
        graft.functions.TextJvm.cdcChunks(tx, CdcWindow, CdcMask)
          .map(c => (id, c)) }
      .toDF("doc_id", "chunk")
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("h"))
      .distinct()
      .materialize() // (doc, chunk-hash) set; sizes + pairing
    val sizes = chunkSets.groupBy("doc_id").agg(count(lit(1)).as("nch"))
    val kept = chunkSets.join(
      chunkSets.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2L && col("df") <= CdcMaxChunkDocs)
        .select("h"),
      Seq("h"))
    val pairs = kept.toDF("h", "doc_a")
      .join(kept.toDF("h", "doc_b"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= CdcMinShared)
    pairs
      .join(broadcast(sizes.toDF("doc_a", "n_a")), Seq("doc_a"))
      .join(broadcast(sizes.toDF("doc_b", "n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"),
        col("n_b"),
        expr("shared * 1000000 div least(n_a, n_b)").as("containment_1e6"))
  }

  /** q184 — ER GOLDEN RECORDS: close the entity-resolution loop that
    * q168 opens — verified near-miss name pairs become edges, edges
    * become entity clusters ([[graft.operators.ConnectedComponents]],
    * its sixth consumer), and each cluster elects a canonical
    * survivor (most records, then lexicographically first — the
    * "survivorship rule" of every MDM/golden-record pipeline).
    * Names touched by no pair remain their own singleton entities.
    * The cluster label itself is engine-internal (min dictionary id
    * here, min name in the oracle — the SAME cluster SETS because
    * ids are assigned in name order) and is dropped from the output:
    * only (canonical, sizes) cross the engine boundary.
    *
    * Scale shape: everything downstream of the record rollup runs on
    * the name DICTIONARY (ids via one dictionary-sized sort window,
    * documented q62-style as bounded); CC iterates on the verified
    * pair graph only — at 100 TB that graph is ~|typo clusters|,
    * not |records|.
    */
  def q184(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val names = t(s, dir, "part")
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("cnt"))
    val ids = names
      .withColumn("id", row_number().over(Window.orderBy("name")).cast("long"))
      .materialize() // dictionary-sized; edges + labeling
    val pairs = q168(s, dir)
    val edges = pairs
      .join(ids.select(col("name").as("name_a"), col("id").as("ia")),
        Seq("name_a"))
      .join(ids.select(col("name").as("name_b"), col("id").as("ib")),
        Seq("name_b"))
      .select("ia", "ib")
    val comp = graft.operators.ConnectedComponents.run(edges, "ia", "ib")
    val labeled = ids
      .join(comp.withColumnRenamed("v", "id"), Seq("id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("id")))
    labeled
      .withColumn("rn", row_number().over(Window.partitionBy("comp")
        .orderBy(col("cnt").desc, col("name").asc)))
      .groupBy("comp")
      .agg(max(when(col("rn") === 1, col("name"))).as("canonical_name"),
        count(lit(1)).as("n_names"), sum(col("cnt")).as("n_records"))
      .select("canonical_name", "n_names", "n_records")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_golden_records" -> (q184 _),
    "q182_cdc_containment" -> (q182 _),
    "q168_sorted_neighborhood" -> (q168 _),
    "q169_cdc_dedup" -> (q169 _),
    "q155_khop_reach" -> (q155 _),
    "q153_pipeline_funnel" -> (q153 _),
    "q151_random_walks" -> (q151 _),
    "q148_dedup_savings" -> (q148 _),
    "q147_minhash_calibration" -> (q147 _),
    "q131_kcore" -> (q131 _),
    "q127_weighted_communities" -> (q127 _),
    "q125_personalized_pagerank" -> (q125 _),
    "q124_clustering_coeff" -> (q124 _),
    "q28_dedup_exact" -> (q28 _),
    "q29_minhash_lsh" -> (q29 _),
    "q30_simhash" -> (q30 _),
    "q31_jaccard_verify" -> (q31 _),
    "q32_embedding_neardup" -> (q32 _),
    "q48_dedup_clusters" -> (q48 _),
    "q49_corpus_filter" -> (q49 _),
    "q50_contamination" -> (q50 _),
    "q58_incremental_dedup" -> (q58 _),
    "q69_chunk_dedup" -> (q69 _),
    "q81_survivor_select" -> (q81 _),
    "q84_chunk_scrub" -> (q84 _),
    "q85_bloom_blocklist" -> (q85 _),
    "q86_source_dup_matrix" -> (q86 _),
    "q87_decontam_scrub" -> (q87 _),
    "q92_split_leakage" -> (q92 _),
    "q93_cluster_split" -> (q93 _),
    "q97_repeated_spans" -> (q97 _),
    "q104_pagerank" -> (q104 _),
    "q107_weighted_pagerank" -> (q107 _),
    "q108_authority_survivors" -> (q108 _),
    "q112_triangle_count" -> (q112 _),
    "q113_containment" -> (q113 _),
    "q117_label_propagation" -> (q117 _))

  // ---- oracle SQL (DuckDB), generated from the same constants ----

  private val P = DedupFunctions.MinHashPrime

  /** `[list_min(...), ...]` — the 16-slot signature array in SQL. */
  private val sigArraySql: String =
    DedupFunctions.permCoeffs(NPerms)
      .map { case (a, b) => s"list_min(list_transform(hs, h -> (h * $a + $b) % $P))" }
      .mkString("[", ",\n    ", "]")

  /** Tokenize → shingle CTE pair, mirroring [[shingleSet]]. */
  private val tokShingleCte: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> len(w) > 0) AS ws
       |  FROM documents),
       |shingled AS (
       |  SELECT doc_id, CASE WHEN len(ws) < $ShingleN THEN []
       |    ELSE list_transform(range(1, len(ws) - ${ShingleN - 2}),
       |           i -> array_to_string(ws[i:i+${ShingleN - 1}], ' ')) END AS shingles
       |  FROM toks)""".stripMargin

  /** Shared CTE prefix: tokenize → shingle → hash → signature → bands →
    * candidate pairs. Mirrors [[signatures]]/[[lshCandidates]] exactly.
    */
  private val lshCteSql: String =
    s"""WITH $tokShingleCte,
       |hashed AS (
       |  SELECT doc_id, list_transform(list_distinct(shingles),
       |      s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % $P) AS hs
       |  FROM shingled WHERE len(shingles) > 0),
       |sig AS (SELECT doc_id, $sigArraySql AS sig FROM hashed),
       |bands AS (
       |  SELECT doc_id, b AS band_idx,
       |    array_to_string(sig[b*$RowsPerBand+1 : b*$RowsPerBand+$RowsPerBand], '-') AS band_key
       |  FROM sig, (SELECT unnest(range(0, $NBands)) AS b)),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** The connected-components replay over `cand` — THE one copy of the
    * clustering oracle SQL (edges → transitive reach → min-label
    * comp), shared by every oracle that composes with q48's clusters
    * (q48/q49/q81/q86/q92/q93). Callers prepend
    * `lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")`.
    */
  private val ccCompCte: String =
    """edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM cand
      |  UNION SELECT doc_b, doc_a FROM cand),
      |reach AS (
      |  SELECT a AS v, a AS r FROM edges
      |  UNION
      |  SELECT e.a, re.r FROM edges e JOIN reach re ON e.b = re.v),
      |comp AS (SELECT v, min(r) AS comp FROM reach GROUP BY v)""".stripMargin

  /** q60's hash-split CASE over any id expression — the one SQL copy
    * of the split formula, shared by the q92 (doc id) and q93 (cluster
    * id) oracles; the engine side shares [[splitCol]].
    */
  private def splitCaseSql(idExpr: String): String = {
    def mod = s"""CAST(concat('0x', substr(md5(concat('split-',
                 |    CAST($idExpr AS VARCHAR))), 1, 8)) AS BIGINT) % 100""".stripMargin
    s"""CASE WHEN $mod < ${CorpusQueries.TrainPct} THEN 'train'
       |  WHEN $mod < ${CorpusQueries.ValPct} THEN 'val'
       |  ELSE 'test' END""".stripMargin
  }

  /** q60's hash-split as a Column over any id column — the engine twin
    * of [[splitCaseSql]], shared by q92/q93.
    */
  private def splitCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = DedupFunctions.md5Hash32(
      concat(lit("split-"), id.cast("string"))) % 100
    when(h < CorpusQueries.TrainPct, "train")
      .when(h < CorpusQueries.ValPct, "val")
      .otherwise("test")
  }

  /** Sequential 0.0-seeded double dot product — bit-equal to
    * [[VectorFunctions.dot]]'s fold.
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |    list_transform(range(1, ${EmbDims + 1}),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |    (x, y) -> x + y)""".stripMargin

  private[queries] def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** L2 norm in SQL — the `sqrt(dot(a,a))` twin of
    * [[graft.functions.VectorFunctions.normUnrolled]]'s fold.
    */
  private[queries] def normSql(a: String): String =
    s"sqrt(${dotSql(a, a)})"

  private val simhashTermsSql: String =
    (0 until 32).map { b =>
      val mask = 1L << b
      s"CASE WHEN 2 * len(list_filter(hs, h -> (h & $mask) != 0)) >= len(hs) THEN $mask ELSE 0 END"
    }.mkString(" +\n    ")

  /** One unrolled LPA round (neighbor-label counts → row_number
    * argmax), generated per round index so the oracle replays exactly
    * [[LpaIters]] synchronous rounds of [[q117]].
    */
  private def lpaRoundSql(i: Int): String = {
    val prev = s"l${i - 1}"
    s"""i$i AS (SELECT e.dst AS v, l.lbl, count(*) AS c
       |  FROM edges e JOIN $prev l ON l.v = e.src GROUP BY 1, 2),
       |r$i AS (SELECT v, lbl, row_number() OVER (PARTITION BY v
       |    ORDER BY c DESC, lbl ASC) AS rn FROM i$i),
       |l$i AS (SELECT v, lbl FROM r$i WHERE rn = 1)""".stripMargin
  }

  /** One unrolled k-core peel round (alive-filtered degree count →
    * threshold), generated per round index so the oracle replays
    * exactly [[KCoreRounds]] synchronous peels of [[q131]].
    */
  private def kcoreRoundSql(i: Int): String = {
    val prev = s"a${i - 1}"
    s"""d$i AS (SELECT e.dst AS v, count(*) AS d
       |  FROM edges e JOIN $prev s ON e.src = s.v JOIN $prev t ON e.dst = t.v
       |  GROUP BY 1),
       |a$i AS (SELECT v FROM d$i WHERE d >= $KCoreK)""".stripMargin
  }

  private def q131OracleSql: String = {
    val joins = (1 to KCoreRounds)
      .map(i => s"LEFT JOIN a$i ON g.v = a$i.v").mkString("\n")
    val cases = (1 to KCoreRounds)
      .map(i => s"WHEN a$i.v IS NULL THEN $i").mkString(" ")
    s"""$lshCteSql,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand),
       |deg0 AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS degree
       |         FROM edges GROUP BY 1),
       |a1 AS (SELECT v FROM deg0 WHERE degree >= $KCoreK),
       |${(2 to KCoreRounds).map(kcoreRoundSql).mkString(",\n")}
       |SELECT g.v AS doc_id, g.degree,
       | CAST(CASE $cases ELSE NULL END AS BIGINT) AS peel_round,
       | (a$KCoreRounds.v IS NOT NULL) AS in_core
       |FROM deg0 g
       |$joins""".stripMargin
  }

  private def q117OracleSql: String =
    s"""$lshCteSql,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand),
       |l0 AS (SELECT DISTINCT dst AS v, dst AS lbl FROM edges),
       |${(1 to LpaIters).map(lpaRoundSql).mkString(",\n")},
       |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
       |       FROM l$LpaIters GROUP BY 1)
       |SELECT l.v AS doc_id, l.lbl AS community, sz.n_members
       |FROM l$LpaIters l JOIN sz ON l.lbl = sz.lbl""".stripMargin

  private def q147OracleSql: String =
    s"""$lshCteSql,
       |ver AS (
       | SELECT
       |  CAST(len(list_filter(range(1, ${NPerms + 1}),
       |    i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS m,
       |  CAST(len(list_filter(list_distinct(sha.shingles),
       |    x -> list_contains(list_distinct(shb.shingles), x))) AS BIGINT) AS inter,
       |  CAST(len(list_distinct(sha.shingles)) AS BIGINT) AS na,
       |  CAST(len(list_distinct(shb.shingles)) AS BIGINT) AS nb
       | FROM cand c
       | JOIN sig sa ON c.doc_a = sa.doc_id
       | JOIN sig sb ON c.doc_b = sb.doc_id
       | JOIN shingled sha ON c.doc_a = sha.doc_id
       | JOIN shingled shb ON c.doc_b = shb.doc_id),
       |b AS (
       | SELECT m AS est_sixteenths, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum((inter * 1000000) // (na + nb - inter)) AS BIGINT) AS stj
       | FROM ver GROUP BY 1)
       |SELECT est_sixteenths, n_pairs,
       | CAST(stj // n_pairs AS BIGINT) AS mean_true_j_1e6,
       | CAST((est_sixteenths * 1000000) // $NPerms AS BIGINT) AS est_1e6,
       | CAST((est_sixteenths * 1000000) // $NPerms - stj // n_pairs AS BIGINT)
       |   AS bias_1e6
       |FROM b""".stripMargin

  /** One unrolled walk hop: hash-mod-degree pick over the sorted
    * adjacency, generated per step so the oracle replays exactly
    * [[WalkLen]] hops.
    */
  private def walkHopSql(t: Int): String = {
    val prev = if (t == 1) "w0" else s"w${t - 1}"
    val curCol = if (t == 1) "cur" else s"s${t - 1}"
    val carried = (1 until t).map(i => s"w.s$i, ").mkString
    s"""w$t AS (
       | SELECT w.start_id, $carried
       |  a.nbrs[CAST((CAST(concat('0x', substr(md5(concat('walk-',
       |    CAST(w.$curCol AS VARCHAR), '-$t')), 1, 8)) AS BIGINT)
       |    % len(a.nbrs)) AS INT) + 1] AS s$t
       | FROM $prev w JOIN adj a ON w.$curCol = a.src)""".stripMargin
  }

  private def q151OracleSql: String =
    s"""$lshCteSql,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand),
       |adj AS (SELECT src, list_sort(list(DISTINCT dst)) AS nbrs
       |        FROM edges GROUP BY 1),
       |w0 AS (SELECT src AS start_id, src AS cur FROM adj),
       |${(1 to WalkLen).map(walkHopSql).mkString(",\n")}
       |SELECT start_id, ${(1 to WalkLen).map(i => s"s$i").mkString(", ")}
       |FROM w$WalkLen""".stripMargin

  /** One unrolled BFS hop (frontier join → min-hop merge), generated
    * per hop so the oracle replays exactly [[ReachHops]] expansions.
    */
  private def reachHopSql(h: Int): String =
    s"""f$h AS (
       | SELECT e.dst AS id, CAST($h AS BIGINT) AS hop
       | FROM edges e JOIN r${h - 1} r ON e.src = r.id AND r.hop = ${h - 1}),
       |r$h AS (
       | SELECT id, CAST(min(hop) AS BIGINT) AS hop
       | FROM (SELECT * FROM r${h - 1} UNION ALL SELECT * FROM f$h)
       | GROUP BY id)""".stripMargin

  private def q155OracleSql: String =
    s"""$lshCteSql,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION ALL SELECT doc_b, doc_a FROM cand),
       |r0 AS (SELECT min(src) AS id, CAST(0 AS BIGINT) AS hop FROM edges),
       |${(1 to ReachHops).map(reachHopSql).mkString(",\n")}
       |SELECT id AS doc_id, hop FROM r$ReachHops""".stripMargin

  /** The oracle's CDC chunk extraction (q169's windowed-sum form of
    * the rolling gear hash) as a CTE list ending in
    * `chunks(doc_id, chunk)` — shared by q169 and q182.
    */
  private def cdcChunksSqlCte: String = {
    val gearSum = (0 until CdcWindow).map { k =>
      s"(((ascii(substr(text, CAST(i - $k AS INT), 1)) * 2654435761)" +
        s" % 4294967296) * ${1L << k})"
    }.mkString("(", " + ", s") % $CdcMask")
    s"""pos AS (
       | SELECT doc_id, text, CAST(i AS BIGINT) AS i
       | FROM documents
       |  CROSS JOIN unnest(range($CdcWindow, length(text) + 1)) AS t(i)
       | WHERE length(text) >= $CdcWindow),
       |b AS (SELECT doc_id, i FROM pos WHERE $gearSum = 0),
       |cuts AS (SELECT doc_id, list_sort(list(i)) AS cs FROM b GROUP BY 1),
       |bounds AS (
       | SELECT d.doc_id, d.text,
       |  list_sort(list_distinct(list_concat(list_concat(
       |    [CAST(0 AS BIGINT)], coalesce(c.cs, [])),
       |    [CAST(length(d.text) AS BIGINT)]))) AS bs
       | FROM documents d LEFT JOIN cuts c USING (doc_id)
       | WHERE length(d.text) > 0),
       |chunks AS (
       | SELECT doc_id, substr(text, CAST(bs[j] + 1 AS INT),
       |   CAST(bs[j + 1] - bs[j] AS INT)) AS chunk
       | FROM bounds CROSS JOIN unnest(range(1, len(bs))) AS t(j))""".stripMargin
  }

  /** q168's oracle (dictionary, two-pass neighborhoods, verified
    * pairs) as a CTE list ending in
    * `snp(name_a, name_b, dist, n_a, n_b)` — shared by q168 and q184.
    */
  private def snPairsSqlCte: String = {
    def pass(key: String): String =
      (1 to SnWindow).map { k =>
        s"""SELECT name, lead(name, $k) OVER
           |  (PARTITION BY substr($key, 1, 1)
           |   ORDER BY $key ASC, name ASC) AS cand
           |FROM names""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""names AS (
       | SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt
       | FROM part GROUP BY 1),
       |cand AS (
       | SELECT DISTINCT least(name, cand) AS name_a,
       |  greatest(name, cand) AS name_b
       | FROM (
       |${pass("name")}
       |UNION ALL
       |${pass("reverse(name)")}
       | ) WHERE cand IS NOT NULL AND cand <> name),
       |vv AS (
       | SELECT name_a, name_b,
       |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
       | FROM cand WHERE levenshtein(name_a, name_b) <= $SnMaxEdit),
       |snp AS (
       | SELECT vv.name_a, vv.name_b, vv.dist, a.cnt AS n_a, b.cnt AS n_b
       | FROM vv JOIN names a ON vv.name_a = a.name
       |         JOIN names b ON vv.name_b = b.name)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q184_golden_records" ->
      s"""WITH RECURSIVE $snPairsSqlCte,
        |e AS (
        | SELECT name_a AS a, name_b AS b FROM snp
        | UNION SELECT name_b, name_a FROM snp),
        |reach AS (
        | SELECT a AS v, a AS r FROM e
        | UNION
        | SELECT e.a, re.r FROM e JOIN reach re ON e.b = re.v),
        |comp AS (SELECT v, min(r) AS comp FROM reach GROUP BY v),
        |labeled AS (
        | SELECT n.name, n.cnt, coalesce(c.comp, n.name) AS comp
        | FROM names n LEFT JOIN comp c ON n.name = c.v),
        |rk AS (
        | SELECT *, row_number() OVER (PARTITION BY comp
        |   ORDER BY cnt DESC, name ASC) AS rn
        | FROM labeled)
        |SELECT max(CASE WHEN rn = 1 THEN name END) AS canonical_name,
        | CAST(count(*) AS BIGINT) AS n_names,
        | CAST(sum(cnt) AS BIGINT) AS n_records
        |FROM rk GROUP BY comp""".stripMargin,
    "q182_cdc_containment" ->
      s"""WITH $cdcChunksSqlCte,
        |cset AS (SELECT DISTINCT doc_id, chunk FROM chunks),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nch
        |          FROM cset GROUP BY 1),
        |kepth AS (SELECT chunk FROM cset GROUP BY chunk
        |          HAVING count(*) >= 2 AND count(*) <= $CdcMaxChunkDocs),
        |kept AS (SELECT c.doc_id, c.chunk FROM cset c
        |         JOIN kepth USING (chunk)),
        |pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS shared
        | FROM kept a JOIN kept b
        |  ON a.chunk = b.chunk AND a.doc_id < b.doc_id
        | GROUP BY 1, 2 HAVING count(*) >= $CdcMinShared)
        |SELECT p.doc_a, p.doc_b, p.shared, sa.nch AS n_a, sb.nch AS n_b,
        | CAST(p.shared * 1000000 // least(sa.nch, sb.nch) AS BIGINT)
        |   AS containment_1e6
        |FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id
        |             JOIN sizes sb ON p.doc_b = sb.doc_id""".stripMargin,
    "q168_sorted_neighborhood" ->
      s"""WITH $snPairsSqlCte
        |SELECT name_a, name_b, dist, n_a, n_b FROM snp""".stripMargin,
    "q169_cdc_dedup" -> {
      s"""WITH $cdcChunksSqlCte,
        |agg AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT chunk) AS BIGINT) AS n_distinct,
        |  CAST(count(*) - count(DISTINCT chunk) AS BIGINT) AS dup_instances,
        |  CAST(sum(length(chunk)) AS BIGINT) AS chars_total
        | FROM chunks),
        |dis AS (
        | SELECT CAST(sum(length(chunk)) AS BIGINT) AS chars_distinct
        | FROM (SELECT DISTINCT chunk FROM chunks))
        |SELECT agg.*, dis.chars_distinct,
        | CAST((agg.chars_total - dis.chars_distinct) * 1000000
        |   // agg.chars_total AS BIGINT) AS savings_1e6
        |FROM agg, dis""".stripMargin
    },
    "q155_khop_reach" -> q155OracleSql,
    "q153_pipeline_funnel" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |q AS (
         | SELECT doc_id,
         |  round(least(CAST(len(${TextQueries.wsSql}) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - (${TextQueries.punctRatioSql}) * 5.0), 4) AS quality
         | FROM documents),
         |st AS (
         | SELECT d.source, q.quality,
         |  (d.doc_id = coalesce(c.comp, d.doc_id)) AS is_canonical,
         |  (q.quality >= $KeepQuality
         |    AND d.doc_id = coalesce(c.comp, d.doc_id)) AS kept,
         |  ${splitCaseSql("d.doc_id")} AS split
         | FROM documents d
         | JOIN q ON d.doc_id = q.doc_id
         | LEFT JOIN comp c ON d.doc_id = c.v)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
         | CAST(sum(CASE WHEN quality >= $KeepQuality THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_quality,
         | CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_canonical,
         | CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(sum(CASE WHEN kept AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_train
         |FROM st GROUP BY source""".stripMargin,
    "q151_random_walks" -> q151OracleSql,
    "q148_dedup_savings" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |lab AS (
         | SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cid, d.n_chars
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
         |agg AS (
         | SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(CASE WHEN doc_id = cid THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS canonical_chars
         | FROM lab GROUP BY 1 HAVING count(*) >= 2)
         |SELECT cluster_id, n_members, total_chars, canonical_chars,
         | total_chars - canonical_chars AS saved_chars,
         | CAST(((total_chars - canonical_chars) * 1000000) // total_chars
         |   AS BIGINT) AS saved_share_1e6
         |FROM agg""".stripMargin,
    "q147_minhash_calibration" -> q147OracleSql,
    "q131_kcore" -> q131OracleSql,
    "q117_label_propagation" -> q117OracleSql,
    "q28_dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS canonical_doc_id,
        | CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q69_chunk_dedup" ->
      s"""WITH w AS (
         | SELECT doc_id, ${graft.queries.TextQueries.wsSql} AS ws FROM documents),
         |chunks AS (
         | SELECT doc_id, unnest(list_transform(
         |   range(0, CAST(ceil(len(ws) / ${ChunkWords}.0) AS BIGINT)),
         |   i -> md5(array_to_string(
         |     ws[i * $ChunkWords + 1 : least((i + 1) * $ChunkWords, len(ws))],
         |     ' ')))) AS h
         | FROM w WHERE len(ws) > 0),
         |shared AS (
         | SELECT h FROM chunks GROUP BY h
         | HAVING min(doc_id) <> max(doc_id)),
         |agg AS (
         | SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(s.h) AS BIGINT) AS n_dup_chunks
         | FROM chunks c LEFT JOIN shared s ON c.h = s.h
         | GROUP BY c.doc_id)
         |SELECT doc_id, n_chunks, n_dup_chunks,
         | round(CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE), 4)
         |   AS dup_chunk_ratio
         |FROM agg""".stripMargin,
    // q84 rebuilds the scrubbed text in SQL: the indexed-lambda filter
    // keeps a chunk iff its first occurrence index is its own index
    // (order-preserving dedup), and the md5 of the single-space rejoin
    // must hash-match the engine's bytes
    "q84_chunk_scrub" ->
      s"""WITH w AS (
         | SELECT doc_id, ${graft.queries.TextQueries.wsSql} AS ws FROM documents),
         |ch AS (
         | SELECT doc_id, list_transform(
         |   range(0, CAST(ceil(len(ws) / ${ChunkWords}.0) AS BIGINT)),
         |   i -> array_to_string(
         |     ws[i * $ChunkWords + 1 : least((i + 1) * $ChunkWords, len(ws))],
         |     ' ')) AS chunks
         | FROM w),
         |k AS (
         | SELECT doc_id, chunks,
         |  list_filter(chunks, (c, i) -> list_position(chunks, c) = i) AS kept
         | FROM ch)
         |SELECT doc_id,
         | CAST(len(chunks) AS BIGINT) AS n_chunks,
         | CAST(len(chunks) - len(kept) AS BIGINT) AS n_dropped,
         | md5(array_to_string(kept, ' ')) AS scrubbed_md5,
         | CAST(len(list_filter(
         |   regexp_split_to_array(array_to_string(kept, ' '), '\\s+'),
         |   x -> len(x) > 0)) AS BIGINT) AS n_tokens_after
         |FROM k""".stripMargin,
    "q29_minhash_lsh" ->
      s"""$lshCteSql
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_filter(range(1, ${NPerms + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / $NPerms.0, 4) AS est_sim
         |FROM cand
         |JOIN sig sa ON doc_a = sa.doc_id
         |JOIN sig sb ON doc_b = sb.doc_id""".stripMargin,
    "q30_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), w -> len(w) > 0) AS ws
         |  FROM documents),
         |hashed AS (
         |  SELECT doc_id, list_transform(ws,
         |      s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % $P) AS hs
         |  FROM toks),
         |sims AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) > 0 THEN $simhashTermsSql
         |    ELSE NULL END AS simhash
         |  FROM hashed)
         |SELECT doc_id, simhash,
         |  CAST(bit_count(xor(simhash, (SELECT simhash FROM sims WHERE doc_id = 0))) AS BIGINT) AS hamming_to_doc0
         |FROM sims""".stripMargin,
    "q31_jaccard_verify" ->
      s"""$lshCteSql,
         |sets AS (
         |  SELECT doc_id, list_distinct(shingles) AS sh
         |  FROM shingled WHERE len(shingles) > 0)
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
         |FROM cand
         |JOIN sets sa ON doc_a = sa.doc_id
         |JOIN sets sb ON doc_b = sb.doc_id""".stripMargin,
    "q48_dedup_clusters" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte
         |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canonical_doc_id
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.v""".stripMargin,
    "q49_corpus_filter" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |q AS (
         | SELECT doc_id,
         |  round(least(CAST(len(${TextQueries.wsSql}) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - (${TextQueries.punctRatioSql}) * 5.0), 4) AS quality
         | FROM documents)
         |SELECT d.doc_id, q.quality,
         | (d.doc_id = coalesce(c.comp, d.doc_id)) AS is_canonical,
         | (q.quality >= $KeepQuality AND d.doc_id = coalesce(c.comp, d.doc_id)) AS kept
         |FROM documents d
         |JOIN q ON d.doc_id = q.doc_id
         |LEFT JOIN comp c ON d.doc_id = c.v""".stripMargin,
    // q81 replays q48's clustering + q34's scoring, then re-derives the
    // survivor with portable two-step SQL (max quality per cluster, min
    // doc_id among the maxima) — value-identical to the engine's
    // single-pass max(struct(quality, -doc_id)) tie-break. Quality is
    // round(.,4) on both sides (the q49 parity), so the equality join
    // on it is exact.
    "q81_survivor_select" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |q AS (
         | SELECT doc_id,
         |  round(least(CAST(len(${TextQueries.wsSql}) AS DOUBLE) / 100.0, 1.0)
         |    * greatest(0.0, 1.0 - (${TextQueries.punctRatioSql}) * 5.0), 4) AS quality
         | FROM documents),
         |lab AS (
         | SELECT d.doc_id, q.quality, coalesce(c.comp, d.doc_id) AS cluster_id
         | FROM documents d
         | JOIN q ON d.doc_id = q.doc_id
         | LEFT JOIN comp c ON d.doc_id = c.v),
         |best AS (SELECT cluster_id, max(quality) AS mq FROM lab GROUP BY cluster_id),
         |surv AS (
         | SELECT l.cluster_id, min(l.doc_id) AS survivor_id
         | FROM lab l JOIN best b
         |   ON l.cluster_id = b.cluster_id AND l.quality = b.mq
         | GROUP BY l.cluster_id)
         |SELECT l.doc_id, l.cluster_id, l.quality, s.survivor_id,
         | (l.doc_id = s.survivor_id) AS is_survivor
         |FROM lab l JOIN surv s ON l.cluster_id = s.cluster_id""".stripMargin,
    "q32_embedding_neardup" ->
      s"""SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $NearDupCos""".stripMargin,
    "q58_incremental_dedup" -> {
      val incList = IncomingSources.map(x => s"'$x'").mkString(", ")
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |inc AS (SELECT doc_id FROM documents WHERE source IN ($incList)),
         |tagged AS (
         |  SELECT c.doc_a, c.doc_b,
         |    (da.source IN ($incList)) AS a_inc,
         |    (db.source IN ($incList)) AS b_inc
         |  FROM cand c
         |  JOIN documents da ON c.doc_a = da.doc_id
         |  JOIN documents db ON c.doc_b = db.doc_id
         |  WHERE (da.source IN ($incList)) OR (db.source IN ($incList))),
         |linked AS (
         |  SELECT DISTINCT CASE WHEN a_inc THEN doc_a ELSE doc_b END AS doc_id
         |  FROM tagged WHERE a_inc != b_inc),
         |ie AS (SELECT doc_a, doc_b FROM tagged WHERE a_inc AND b_inc),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM ie
         |  UNION SELECT doc_b, doc_a FROM ie),
         |reach AS (
         |  SELECT a AS v, a AS r FROM edges
         |  UNION
         |  SELECT e.a, re.r FROM edges e JOIN reach re ON e.b = re.v),
         |comp AS (SELECT v, min(r) AS comp FROM reach GROUP BY v)
         |SELECT i.doc_id,
         |  (l.doc_id IS NOT NULL) AS linked_existing,
         |  coalesce(c.comp, i.doc_id) AS canonical_doc_id,
         |  (l.doc_id IS NULL AND i.doc_id = coalesce(c.comp, i.doc_id)) AS kept
         |FROM inc i
         |LEFT JOIN linked l ON i.doc_id = l.doc_id
         |LEFT JOIN comp c ON i.doc_id = c.v""".stripMargin
    },
    "q50_contamination" ->
      s"""WITH $tokShingleCte,
         |sets AS (
         |  SELECT sh.doc_id, d.source, list_distinct(shingles) AS sh
         |  FROM shingled sh JOIN documents d ON sh.doc_id = d.doc_id
         |  WHERE len(shingles) > 0),
         |pairs AS (SELECT doc_id, source, unnest(sh) AS shingle FROM sets),
         |ev AS (SELECT DISTINCT shingle FROM pairs WHERE source = '$EvalSource'),
         |ov AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
         |  FROM pairs
         |  WHERE source != '$EvalSource'
         |    AND shingle IN (SELECT shingle FROM ev)
         |  GROUP BY doc_id)
         |SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_shingles,
         |  coalesce(ov.n_overlap, 0) AS n_overlap,
         |  round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / len(s.sh), 4) AS contam_ratio,
         |  (CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / len(s.sh)) >= $ContamThreshold AS contaminated
         |FROM sets s LEFT JOIN ov ON s.doc_id = ov.doc_id
         |WHERE s.source != '$EvalSource'""".stripMargin,
    // q85's exact columns replay q50's shingle/eval machinery; the two
    // sketch bounds are literal TRUE (the q46 discipline: the Bloom
    // bits are engine-specific, the bound they must satisfy is not)
    "q85_bloom_blocklist" ->
      s"""WITH $tokShingleCte,
         |sets AS (
         |  SELECT sh.doc_id, d.source, list_distinct(shingles) AS sh
         |  FROM shingled sh JOIN documents d ON sh.doc_id = d.doc_id
         |  WHERE len(shingles) > 0),
         |pairs AS (SELECT doc_id, source, unnest(sh) AS shingle FROM sets),
         |ev AS (SELECT DISTINCT shingle FROM pairs WHERE source = '$EvalSource'),
         |c AS (
         |  SELECT e.shingle AS es
         |  FROM pairs p LEFT JOIN ev e ON p.shingle = e.shingle
         |  WHERE p.source != '$EvalSource')
         |SELECT CAST(count(*) AS BIGINT) AS n_checked,
         | CAST(coalesce(sum(CASE WHEN es IS NOT NULL THEN 1 ELSE 0 END), 0)
         |   AS BIGINT) AS n_exact_hits,
         | TRUE AS no_false_negatives,
         | TRUE AS fp_rate_ok
         |FROM c""".stripMargin,
    // q92/q93 replay q48's clustering plus q60's split hash — q92 on
    // the document id (the audit), q93 on the cluster id (the fix)
    "q92_split_leakage" -> {
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |lab AS (
         | SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id,
         |  ${splitCaseSql("d.doc_id")} AS split
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
         |m AS (SELECT cluster_id, split, CAST(count(*) AS BIGINT) AS n
         |      FROM lab GROUP BY 1, 2),
         |per AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_splits,
         |        CAST(sum(n) AS BIGINT) AS n_docs FROM m GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         | CAST(coalesce(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END), 0)
         |   AS BIGINT) AS n_multi_doc,
         | CAST(coalesce(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END), 0)
         |   AS BIGINT) AS n_leaky,
         | CAST(coalesce(sum(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END), 0)
         |   AS BIGINT) AS n_docs_in_leaky
         |FROM per""".stripMargin
    },
    "q93_cluster_split" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |lab AS (
         | SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.v)
         |SELECT doc_id, cluster_id, ${splitCaseSql("cluster_id")} AS split
         |FROM lab""".stripMargin,
    // q86 replays q48's clustering, then the same count-based pair
    // arithmetic (integer //, one triangle including the diagonal)
    "q86_source_dup_matrix" ->
      s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$ccCompCte,
         |lab AS (
         | SELECT d.doc_id, d.source, coalesce(c.comp, d.doc_id) AS cluster_id
         | FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
         |m AS (SELECT cluster_id, source, CAST(count(*) AS BIGINT) AS m
         |      FROM lab GROUP BY 1, 2),
         |p AS (
         | SELECT a.cluster_id, a.source AS src_a, b.source AS src_b,
         |  CASE WHEN a.source = b.source THEN (a.m * (a.m - 1)) // 2
         |       ELSE a.m * b.m END AS pairs
         | FROM m a JOIN m b
         |   ON a.cluster_id = b.cluster_id AND a.source <= b.source)
         |SELECT src_a, src_b, CAST(sum(pairs) AS BIGINT) AS dup_pairs,
         | CAST(count(*) AS BIGINT) AS n_clusters
         |FROM p WHERE pairs > 0 GROUP BY 1, 2""".stripMargin,
    // q87 replays the chunking with ordinality (CROSS JOIN unnest), the
    // per-chunk shingles, an exact join against the eval shingles, and
    // the order-preserving rebuild (list(... ORDER BY idx)); the hash
    // proves byte-identical scrubbed output
    "q87_decontam_scrub" -> {
      def shOf(lst: String): String =
        s"""CASE WHEN len($lst) < $ShingleN THEN []
           | ELSE list_transform(range(1, len($lst) - ${ShingleN - 2}),
           |   j -> array_to_string($lst[j:j+${ShingleN - 1}], ' ')) END""".stripMargin
      s"""WITH w AS (
         | SELECT doc_id, source, ${graft.queries.TextQueries.wsSql} AS ws
         | FROM documents),
         |ev AS (SELECT DISTINCT unnest(${shOf("ws")}) AS s
         |       FROM w WHERE source = '$EvalSource'),
         |base AS (
         | SELECT doc_id, ws,
         |  CAST(ceil(len(ws) / ${ChunkWords}.0) AS BIGINT) AS nch
         | FROM w WHERE source <> '$EvalSource'),
         |ch AS (
         | SELECT doc_id, i AS idx,
         |  ws[i * $ChunkWords + 1 : least((i + 1) * $ChunkWords, len(ws))] AS cw
         | FROM base CROSS JOIN unnest(range(0, nch)) AS t(i)),
         |cs AS (SELECT doc_id, idx, unnest(${shOf("cw")}) AS s FROM ch),
         |bad AS (SELECT DISTINCT cs.doc_id, cs.idx
         |        FROM cs JOIN ev ON cs.s = ev.s),
         |kept AS (
         | SELECT ch.doc_id, ch.idx, array_to_string(ch.cw, ' ') AS chunk
         | FROM ch LEFT JOIN bad
         |   ON ch.doc_id = bad.doc_id AND ch.idx = bad.idx
         | WHERE bad.idx IS NULL),
         |reb AS (
         | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  array_to_string(list(chunk ORDER BY idx), ' ') AS scrubbed
         | FROM kept GROUP BY doc_id)
         |SELECT b.doc_id, b.nch AS n_chunks,
         | CAST(b.nch - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
         | md5(coalesce(r.scrubbed, '')) AS scrubbed_md5,
         | CAST(CASE WHEN r.scrubbed IS NULL THEN 0
         |  ELSE len(list_filter(regexp_split_to_array(r.scrubbed, '\\s+'),
         |    x -> len(x) > 0)) END AS BIGINT) AS n_tokens_after
         |FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id""".stripMargin
    },
    "q97_repeated_spans" ->
      s"""WITH d AS (SELECT doc_id, ${TextQueries.wsSql} AS ws FROM documents),
         |sp AS (
         | SELECT doc_id, unnest(list_transform(range(1, len(ws) - $SpanW + 2),
         |   i -> CAST(concat('0x', substr(md5(
         |     array_to_string(ws[i : i + ${SpanW - 1}], ' ')), 1, 8)) AS BIGINT))) AS h
         | FROM d WHERE len(ws) >= $SpanW),
         |pp AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) AS c
         |       FROM sp GROUP BY doc_id, h),
         |sh AS (SELECT h, (min(doc_id) <> max(doc_id)) AS is_shared
         |       FROM pp GROUP BY h),
         |pd AS (
         | SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN s.is_shared THEN p.c ELSE 0 END) AS BIGINT) AS n_shared
         | FROM pp p JOIN sh s ON p.h = s.h GROUP BY p.doc_id)
         |SELECT d.doc_id,
         | coalesce(pd.n_spans, CAST(0 AS BIGINT)) AS n_spans,
         | coalesce(pd.n_shared, CAST(0 AS BIGINT)) AS n_shared,
         | CASE WHEN pd.n_spans IS NULL THEN NULL
         |  ELSE round(CAST(pd.n_shared AS DOUBLE) / CAST(pd.n_spans AS DOUBLE), 4)
         | END AS shared_ratio
         |FROM d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin,
    "q104_pagerank" -> q104OracleSql,
    "q125_personalized_pagerank" -> q125OracleSql,
    "q127_weighted_communities" -> q127OracleSql,
    "q107_weighted_pagerank" -> q107OracleSql,
    "q108_authority_survivors" -> q108OracleSql,
    "q113_containment" ->
      s"""$lshCteSql,
         |sets AS (
         |  SELECT doc_id, list_distinct(shingles) AS sh
         |  FROM shingled WHERE len(shingles) > 0)
         |SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_shared,
         |  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / len(sa.sh), 4) AS containment_a,
         |  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |    / len(sb.sh), 4) AS containment_b,
         |  (len(list_intersect(sa.sh, sb.sh)) = len(sa.sh)) AS a_in_b,
         |  (len(list_intersect(sa.sh, sb.sh)) = len(sb.sh)) AS b_in_a
         |FROM cand
         |JOIN sets sa ON doc_a = sa.doc_id
         |JOIN sets sb ON doc_b = sb.doc_id""".stripMargin,
    "q112_triangle_count" ->
      s"""$lshCteSql,
         |tri AS (
         | SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         | FROM cand ab
         | JOIN cand bc ON ab.doc_b = bc.doc_a
         | JOIN cand ac ON ab.doc_a = ac.doc_a AND bc.doc_b = ac.doc_b),
         |pn AS (
         | SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         | FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
         |       UNION ALL SELECT c FROM tri)
         | GROUP BY 1),
         |nd AS (
         | SELECT DISTINCT v AS doc_id
         | FROM (SELECT doc_a AS v FROM cand UNION ALL
         |       SELECT doc_b FROM cand))
         |SELECT nd.doc_id,
         | CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles
         |FROM nd LEFT JOIN pn USING (doc_id)""".stripMargin,
    "q124_clustering_coeff" ->
      s"""$lshCteSql,
         |tri AS (
         | SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         | FROM cand ab
         | JOIN cand bc ON ab.doc_b = bc.doc_a
         | JOIN cand ac ON ab.doc_a = ac.doc_a AND bc.doc_b = ac.doc_b),
         |pn AS (
         | SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         | FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
         |       UNION ALL SELECT c FROM tri)
         | GROUP BY 1),
         |dg AS (
         | SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS degree
         | FROM (SELECT doc_a AS v FROM cand UNION ALL
         |       SELECT doc_b FROM cand)
         | GROUP BY 1),
         |j AS (
         | SELECT dg.doc_id, dg.degree,
         |  CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles
         | FROM dg LEFT JOIN pn USING (doc_id))
         |SELECT doc_id, degree, n_triangles,
         | CASE WHEN degree >= 2
         |  THEN CAST((2 * n_triangles * 1000000) // (degree * (degree - 1))
         |    AS BIGINT)
         |  ELSE NULL END AS cc_1e6
         |FROM j""".stripMargin)

  /** Unrolled [[PageRankIters]]-stage PageRank replay, generated from
    * the same constants the operator runs ([[graft.operators.PageRank]]
    * damping rational + scale): every stage is integer floor
    * arithmetic over non-negative longs, so DuckDB `//` and Spark
    * `div` agree term-for-term and the final ranks hash-match exactly.
    */
  /** The shared `rK` iteration CTEs of the PageRank unroll (q104/q107/
    * q108): `mass = Σ (damped // outdeg)` unweighted, `Σ ((damped · w)
    * // Σw)` weighted — generated from the operator's own constants.
    * Expects CTEs `und` (src, dst[, w]), `nd`, `deg`, `tp`, `r0`.
    */
  private def prIterCtesSql(weighted: Boolean): String = {
    val dn = graft.operators.PageRank.DampNum
    val dd = graft.operators.PageRank.DampDen
    val contrib =
      if (weighted) s"(((r.rank * $dn) // $dd) * u.w) // d.outdeg"
      else s"((r.rank * $dn) // $dd) // d.outdeg"
    (1 to PageRankIters).map { k =>
      s"""r$k AS (
         | SELECT b.id, CAST(t.tp + coalesce(m.mass, 0) AS BIGINT) AS rank
         | FROM nd b CROSS JOIN tp t LEFT JOIN (
         |  SELECT u.dst AS id,
         |   CAST(sum($contrib) AS BIGINT) AS mass
         |  FROM und u JOIN r${k - 1} r ON u.src = r.id
         |  JOIN deg d ON u.src = d.id
         |  GROUP BY 1) m ON b.id = m.id)""".stripMargin
    }.mkString(",\n")
  }

  /** The unweighted graph-prep CTEs q104 and q108 share: undirected
    * edges, node set, degree, node count, teleport, uniform init.
    */
  private def prGraphCtesSql: String = {
    val dn = graft.operators.PageRank.DampNum
    val dd = graft.operators.PageRank.DampDen
    val scale = graft.operators.PageRank.DefaultScale
    s"""und AS (
       | SELECT doc_a AS src, doc_b AS dst FROM cand
       | UNION ALL
       | SELECT doc_b AS src, doc_a AS dst FROM cand),
       |nd AS (SELECT DISTINCT src AS id FROM und),
       |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM und GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
       |tp AS (SELECT CAST((($scale // n) * ${dd - dn}) // $dd AS BIGINT) AS tp
       |       FROM nn),
       |r0 AS (SELECT id, CAST($scale // n AS BIGINT) AS rank
       |       FROM nd CROSS JOIN nn)""".stripMargin
  }

  /** The q125 PPR replay: seed = min graph id, seed-only teleport,
    * same damped walk as [[prIterCtesSql]] (unweighted).
    */
  private def q125OracleSql: String = {
    val dn = graft.operators.PageRank.DampNum
    val dd = graft.operators.PageRank.DampDen
    val scale = graft.operators.PageRank.DefaultScale
    val iters = (1 to PageRankIters).map { k =>
      s"""p$k AS (
         | SELECT b.id,
         |  CAST((CASE WHEN b.id = s.sid THEN ${(scale * (dd - dn)) / dd}
         |        ELSE 0 END) + coalesce(m.mass, 0) AS BIGINT) AS rank
         | FROM nd b CROSS JOIN sd s LEFT JOIN (
         |  SELECT u.dst AS id,
         |   CAST(sum(((r.rank * $dn) // $dd) // d.outdeg) AS BIGINT) AS mass
         |  FROM und u JOIN p${k - 1} r ON u.src = r.id
         |  JOIN deg d ON u.src = d.id
         |  GROUP BY 1) m ON b.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$lshCteSql,
       |und AS (
       | SELECT doc_a AS src, doc_b AS dst FROM cand
       | UNION ALL
       | SELECT doc_b AS src, doc_a AS dst FROM cand),
       |nd AS (SELECT DISTINCT src AS id FROM und),
       |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM und GROUP BY 1),
       |sd AS (SELECT CAST(min(src) AS BIGINT) AS sid FROM und),
       |p0 AS (SELECT id, CAST(CASE WHEN id = sd.sid THEN $scale ELSE 0 END
       |         AS BIGINT) AS rank
       |       FROM nd CROSS JOIN sd),
       |$iters
       |SELECT r.id AS doc_id, r.rank AS ppr_rank, d.outdeg AS degree,
       | (r.id = s.sid) AS is_seed
       |FROM p$PageRankIters r JOIN deg d ON r.id = d.id CROSS JOIN sd s""".stripMargin
  }

  /** One unrolled WEIGHTED LPA round — [[lpaRoundSql]] with
    * `sum(e.w)` votes instead of `count(*)`.
    */
  private def lpaWRoundSql(i: Int): String = {
    val prev = s"l${i - 1}"
    s"""i$i AS (SELECT e.dst AS v, l.lbl, CAST(sum(e.w) AS BIGINT) AS c
       |  FROM edges e JOIN $prev l ON l.v = e.src GROUP BY 1, 2),
       |r$i AS (SELECT v, lbl, row_number() OVER (PARTITION BY v
       |    ORDER BY c DESC, lbl ASC) AS rn FROM i$i),
       |l$i AS (SELECT v, lbl FROM r$i WHERE rn = 1)""".stripMargin
  }

  private def q127OracleSql: String =
    s"""$lshCteSql,
       |sets AS (
       | SELECT doc_id, list_distinct(shingles) AS sh
       | FROM shingled WHERE len(shingles) > 0),
       |wc AS (
       | SELECT doc_a, doc_b,
       |  greatest(CAST(1 AS BIGINT),
       |   (CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * $JaccardWeightScale)
       |    // CAST(len(sa.sh) + len(sb.sh)
       |         - len(list_intersect(sa.sh, sb.sh)) AS BIGINT)) AS w
       | FROM cand
       | JOIN sets sa ON doc_a = sa.doc_id
       | JOIN sets sb ON doc_b = sb.doc_id),
       |edges AS (SELECT doc_a AS src, doc_b AS dst, w FROM wc
       |          UNION ALL SELECT doc_b, doc_a, w FROM wc),
       |l0 AS (SELECT DISTINCT dst AS v, dst AS lbl FROM edges),
       |${(1 to LpaIters).map(lpaWRoundSql).mkString(",\n")},
       |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_members
       |       FROM l$LpaIters GROUP BY 1)
       |SELECT l.v AS doc_id, l.lbl AS community, sz.n_members
       |FROM l$LpaIters l JOIN sz ON l.lbl = sz.lbl""".stripMargin

  private def q104OracleSql: String =
    s"""$lshCteSql,
       |$prGraphCtesSql,
       |${prIterCtesSql(weighted = false)}
       |SELECT r.id AS doc_id, r.rank AS pr_rank, d.outdeg AS degree
       |FROM r$PageRankIters r JOIN deg d ON r.id = d.id""".stripMargin

  /** q108's replay: q48's recursive clustering composed with q104's
    * rank unroll, then the argmax-by-(rank, min-id) survivor per
    * cluster — rankless members (no candidate edges) sort below every
    * ranked one via the same `-1` sentinel the engine uses.
    */
  private def q108OracleSql: String =
    s"""${lshCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |$ccCompCte,
       |$prGraphCtesSql,
       |${prIterCtesSql(weighted = false)},
       |cl AS (
       | SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
       | FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
       |lr AS (
       | SELECT cl.doc_id, cl.cluster_id,
       |  CAST(coalesce(r.rank, -1) AS BIGINT) AS rank_or
       | FROM cl LEFT JOIN r$PageRankIters r ON cl.doc_id = r.id),
       |rk AS (
       | SELECT doc_id, cluster_id, rank_or,
       |  row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY rank_or DESC, doc_id ASC) AS rn
       | FROM lr),
       |best AS (SELECT cluster_id, doc_id AS survivor_id FROM rk WHERE rn = 1)
       |SELECT l.doc_id, l.cluster_id,
       |  CASE WHEN l.rank_or >= 0 THEN l.rank_or END AS pr_rank,
       |  b.survivor_id, (l.doc_id = b.survivor_id) AS is_survivor
       |FROM lr l JOIN best b ON l.cluster_id = b.cluster_id""".stripMargin

  /** q107's replay: the q104 unroll with the per-edge Jaccard weight
    * threaded through — `mass = Σ ((damped · w) // Σw)` — generated
    * from the same damping/scale/weight constants the operator runs.
    */
  private def q107OracleSql: String = {
    val dn = graft.operators.PageRank.DampNum
    val dd = graft.operators.PageRank.DampDen
    val scale = graft.operators.PageRank.DefaultScale
    val iters = prIterCtesSql(weighted = true)
    s"""$lshCteSql,
       |sets AS (
       | SELECT doc_id, list_distinct(shingles) AS sh
       | FROM shingled WHERE len(shingles) > 0),
       |wc AS (
       | SELECT doc_a, doc_b,
       |  greatest(CAST(1 AS BIGINT),
       |   (CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * $JaccardWeightScale)
       |    // CAST(len(sa.sh) + len(sb.sh)
       |         - len(list_intersect(sa.sh, sb.sh)) AS BIGINT)) AS w
       | FROM cand
       | JOIN sets sa ON doc_a = sa.doc_id
       | JOIN sets sb ON doc_b = sb.doc_id),
       |und AS (
       | SELECT doc_a AS src, doc_b AS dst, w FROM wc
       | UNION ALL
       | SELECT doc_b AS src, doc_a AS dst, w FROM wc),
       |nd AS (SELECT DISTINCT src AS id FROM und),
       |deg AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS outdeg
       |        FROM und GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
       |tp AS (SELECT CAST((($scale // n) * ${dd - dn}) // $dd AS BIGINT) AS tp
       |       FROM nn),
       |r0 AS (SELECT id, CAST($scale // n AS BIGINT) AS rank
       |       FROM nd CROSS JOIN nn),
       |$iters
       |SELECT r.id AS doc_id, r.rank AS pr_rank, d.outdeg AS w_degree
       |FROM r$PageRankIters r JOIN deg d ON r.id = d.id""".stripMargin
  }
}
