package graft.jobs

import graft.Tables
import graft.queries.{CorpusQueries, DedupQueries}
import graft.sources.JsonLines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LLM training-data pipeline as lake-to-lake jobs — the
  * beyond-reference twin of the SIRI enrichment chain, composed from
  * the same operators the query surface exposes (q34/q52/q61 scoring,
  * q48 dedup decision, q60 split, q57 packing) and run as one DAG
  * (`graft-corpus-prepare` in graft/dags.yaml) with the reference's
  * task semantics: sequential tasks, a failure skips the rest.
  *
  * Tasks communicate through lake tables (`corpus_scores`,
  * `corpus_dedup`, `corpus_packed`), never through the driver; the
  * final task additionally exports train-split shards as JSONL — the
  * interchange artifact a downstream trainer consumes.
  */
object CorpusPrepare {

  /** Documents below this composite quality score are dropped. */
  val MinQuality = 0.5

  /** Per-document scoring pass: token count, composite quality (q34's
    * formula) and character entropy (q61's fold) in ONE narrow typed
    * pass — the wide `text` column is the dominant scan cost at scale
    * and is read exactly once, with no join. All formulas come from
    * [[graft.functions.TextJvm]] — the same single definitions q61
    * uses, with raw values rounded through the same column `round` —
    * so the scores are bit-identical to q34/q61 by construction
    * (JobsSpec additionally cross-checks entropy against q61).
    */
  def score(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextJvm
    Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val (nWs, nSub) = TextJvm.wsAndSubwordCounts(text)
        (id, nWs, nSub, TextJvm.qualityRaw(text), TextJvm.charEntropyRaw(text),
          // the q96 classifier logit rides the SAME pass — model
          // inference costs no extra corpus scan
          graft.queries.SearchQueries.classifierFeatSum(text))
      }
      .toDF("doc_id", "n_tokens", "n_subword", "quality_raw", "entropy_raw",
        "feat_sum")
      .select(col("doc_id"), col("n_tokens"), col("n_subword"),
        round(col("quality_raw"), 4).as("quality"),
        round(col("entropy_raw"), 4).as("entropy"),
        col("feat_sum"))
  }

  /** The dedup decision: doc_id → canonical_doc_id.
    * `cluster_policy=cc` (default) clusters by connected components
    * (the q48 contract — transitive reach); `cluster_policy=lpa` by
    * label-propagation communities (q117 — majority vote, so an LSH
    * chaining edge no longer fuses unrelated mirror families; the LPA
    * partition refines CC's, so it only ever keeps MORE documents).
    * Config, not code, like `keep_policy`; unknown values hard-fail.
    */
  def dedupDecide(s: SparkSession, sfDir: String,
                  clusterPolicy: String = "cc"): DataFrame =
    clusterPolicy match {
      case "cc" => DedupQueries.clusterLabels(s, sfDir)
      case "lpa" => DedupQueries.lpaClusterLabels(s, sfDir)
      case other => sys.error(s"unknown cluster_policy '$other' " +
        "(expected 'cc' or 'lpa')")
    }

  /** The (doc_id, canonical_doc_id) dedup artifact from an INCREMENTAL
    * q58-policy decision frame — produced either by the batch path
    * ([[graft.queries.DedupQueries.q58]]) or by
    * [[graft.streaming.StreamingCorpus.decide]] over a streamed
    * candidate lake; both run the same policy code, so both ingest
    * modes ship one artifact (JobsSpec pins the DAG-level equality).
    * Kept docs are their own canonical; near-dup cluster members point
    * at the cluster canonical; docs suppressed by an EXISTING corpus
    * duplicate carry a NULL canonical (their duplicate lives outside
    * the decided increment) — [[keptOf]]'s canonical filter treats
    * NULL as not-kept, which is exactly the intended drop.
    */
  def dedupArtifactOf(decision: DataFrame): DataFrame =
    decision.select(col("doc_id"),
      when(col("linked_existing"), lit(null).cast("long"))
        .otherwise(col("canonical_doc_id")).as("canonical_doc_id"))

  /** The filter + split join from explicit inputs — one definition
    * shared by the flat (oracle-gate) and bucketed (deployment) paths:
    * keep canonical documents above [[MinQuality]] and assign the
    * deterministic train/val/test split (q60 hash discipline).
    *
    * The dedup side is reduced to the canonical survivors FIRST, so
    * every join in the plan is on the single bucket key `doc_id`.
    * Joining dedup raw and filtering `doc_id === canonical_doc_id`
    * afterwards reads the same rows, but Catalyst then plans the join
    * on the two-column key `(doc_id, doc_id) = (canonical_doc_id,
    * doc_id)`, which no single-column bucket spec matches — the
    * bucketed path would silently re-shuffle (JobsSpec pins the
    * exchange-free plan).
    */
  private def keptOf(docs: DataFrame, scores: DataFrame,
                     dedup: DataFrame,
                     keepPolicy: String = "canonical",
                     classifierGate: Boolean = false,
                     authorityRanks: () => DataFrame = () =>
                       sys.error("keep_policy=authority needs ranks"),
                     corePeels: () => DataFrame = () =>
                       sys.error("keep_policy=core needs peels")): DataFrame = {
    val h = graft.functions.DedupFunctions.md5Hash32(
      concat(lit("split-"), col("doc_id").cast("string"))) % 100
    // keep_policy=canonical: each cluster keeps its min-id member (the
    // q48/q49 contract). keep_policy=survivor: the cluster keeps its
    // highest-quality member instead (q81's selection — dedup stops
    // discarding the best copy). keep_policy=authority: the cluster
    // keeps its highest-PageRank member (q108's selection — the
    // most-linked variant of a near-dup family is usually the
    // canonical one; ranks arrive lazily so the q104 pass only runs
    // under this policy). Every policy reduces to a doc_id list FIRST,
    // so every downstream join stays on the single bucket key (the
    // bucketed path's exchange-free discipline holds for all three).
    // NULL canonicals (incremental suppression by an existing-corpus
    // duplicate) are dropped under every policy.
    val keptIds = keepPolicy match {
      case "canonical" =>
        dedup.filter(col("doc_id") === col("canonical_doc_id"))
          .select("doc_id")
      case "survivor" =>
        DedupQueries.survivorSelect(
            scores.select(col("doc_id"), col("quality"))
              .join(dedup.filter(col("canonical_doc_id").isNotNull), Seq("doc_id"))
              .select(col("doc_id"), col("quality"),
                col("canonical_doc_id").as("cluster_id")))
          .filter(col("is_survivor")).select("doc_id")
      case "authority" =>
        DedupQueries.authoritySurvivors(
            dedup.filter(col("canonical_doc_id").isNotNull),
            authorityRanks())
          .filter(col("is_survivor")).select("doc_id")
      // keep_policy=core: the cluster keeps its deepest-k-core member
      // (q131's onion depth — best-SUPPORTED where authority is
      // most-LINKED; peels arrive lazily so the peel pass only runs
      // under this policy)
      case "core" =>
        DedupQueries.coreSurvivors(
            dedup.filter(col("canonical_doc_id").isNotNull),
            corePeels())
          .filter(col("is_survivor")).select("doc_id")
      // a typo'd policy must fail loudly, not silently ship the
      // min-id corpus (same hard-fail discipline as a missing sf_dir)
      case other => sys.error(s"unknown keep_policy '$other' " +
        "(expected 'canonical', 'survivor', 'authority' or 'core')")
    }
    docs
      .join(keptIds, Seq("doc_id"), "left_semi")
      .join(scores, "doc_id")
      .filter(col("quality") >= MinQuality)
      // quality_gate=classifier: ALSO require a positive q96 model
      // logit (scored in the same pass — no extra scan, no extra join)
      .filter(if (classifierGate) col("feat_sum") > 0L else lit(true))
      .withColumn("split",
        when(h < CorpusQueries.TrainPct, "train")
          .when(h < CorpusQueries.ValPct, "val").otherwise("test"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
      .withColumn("n_subword", col("n_subword").cast("long"))
  }

  /** Sequence-pack the kept rows PER (source, split) — a val/test
    * document must not consume a train bin's token budget, and every
    * split's packing starts at bin 0. Runs through
    * [[graft.operators.SequencePacking]]'s two-pass prefix sum, so a
    * dominant (source, split) group spans range partitions instead of
    * serializing through one window task (JobsSpec asserts the plan
    * carries no Window node).
    *
    * `tokensCol` picks which count fills bins: `n_tokens` (whitespace —
    * the oracle-gated default) or `n_subword` (greedy-subword, q70 —
    * what a real token-budgeted run packs by; CorpusSpec proves the
    * two produce materially different bins). Both counts ride along in
    * the output either way.
    */
  private def packKept(kept: DataFrame,
                       tokensCol: String = "n_tokens"): DataFrame =
    graft.operators.SequencePacking.withBins(
      kept, keyCols = Seq("source", "split"), orderCol = "doc_id",
      tokensCol = tokensCol,
      tokensPerBin = graft.queries.TextQueries.TokensPerBin)
      .select("doc_id", "source", "lang", "split", "n_tokens", "n_subword",
        "quality", "entropy", "bin_id", "text")

  /** Filter + split + pack over the flat lake tables — the oracle-gate
    * path the DAG runs in the sandbox.
    */
  def filterPack(s: SparkSession, sfDir: String,
                 scores: DataFrame, dedup: DataFrame,
                 tokensCol: String = "n_tokens",
                 keepPolicy: String = "canonical",
                 classifierGate: Boolean = false): DataFrame =
    packKept(keptOf(
      Tables.load(s, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text")),
      scores, dedup, keepPolicy, classifierGate,
      // lazily bound: the q104 rank / q131 peel passes run only under
      // their policies
      () => DedupQueries.q104(s, sfDir)
        .select(col("doc_id"), col("pr_rank")),
      () => DedupQueries.q131(s, sfDir)), tokensCol)

  /** Bucket count for the corpus exchange tables — the SAME count on
    * every side of the doc_id joins, or the exchange comes back.
    */
  val NBuckets = 16

  /** Publish the corpus intermediates BUCKETED+sorted by `doc_id` —
    * the deployment layout for the tables the pipeline joins on every
    * rerun (scores ⋈ dedup ⋈ documents). One clustered write per
    * publish buys exchange-free sort-merge joins on every subsequent
    * run — PROVIDED every join stays on the single bucket key with
    * [[NBuckets]] on all sides (a composite or expression join key
    * silently disables bucketing and brings the exchange back; see
    * [[keptOf]]). Under that discipline the 100 TB documents side
    * never shuffles again. The flat SiriLake tables stay the
    * sandbox/oracle medium (same pattern as Lake vs the flat
    * testdata); JobsSpec pins the exchange-free plan and result
    * equality.
    */
  def publishBucketed(s: SparkSession, sfDir: String, scores: DataFrame,
                      dedup: DataFrame, prefix: String = "corpus"): Unit = {
    graft.sources.BucketedLake.publish(
      Tables.load(s, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text")),
      s"${prefix}_documents_b", "doc_id", NBuckets)
    graft.sources.BucketedLake.publish(
      scores, s"${prefix}_scores_b", "doc_id", NBuckets)
    graft.sources.BucketedLake.publish(
      dedup, s"${prefix}_dedup_b", "doc_id", NBuckets)
  }

  /** The kept/split join over the bucketed tables. The merge hints
    * force the sort-merge path: the intermediates are corpus-sized, so
    * broadcasting them is not the 100 TB plan — the bucketed layout
    * carrying the join with zero exchanges is.
    */
  private[graft] def keptBucketed(s: SparkSession,
                                  prefix: String = "corpus"): DataFrame =
    keptOf(
      graft.sources.BucketedLake.read(s, s"${prefix}_documents_b"),
      graft.sources.BucketedLake.read(s, s"${prefix}_scores_b").hint("merge"),
      graft.sources.BucketedLake.read(s, s"${prefix}_dedup_b").hint("merge"))

  /** Filter + split + pack over the bucketed intermediates — identical
    * rows to [[filterPack]], exchange-free join plan.
    */
  def filterPackBucketed(s: SparkSession, prefix: String = "corpus",
                         tokensCol: String = "n_tokens"): DataFrame =
    packKept(keptBucketed(s, prefix), tokensCol)

  /** Publish the packed corpus as ANALYTICS parquet Z-ORDERED on
    * (n_tokens, quality) — the layout for the ad-hoc corpus-analytics
    * side of the lake (the trainer-facing exports stay JSONL below).
    * Curriculum stages scan token-length BANDS (q62's buckets) and
    * quality audits scan score bands; a single-key sort prunes only
    * one of those, the Morton layout ([[graft.sources.Lake
    * .writeZOrdered]], q134's key) keeps every file a compact
    * rectangle in BOTH dimensions so either band predicate skips most
    * files on min/max stats alone. LakeSpec measures the per-file
    * range tightness for the writer; JobsSpec pins this publication's
    * row fidelity and file geometry.
    */
  def publishAnalyticsZOrdered(packed: DataFrame, path: String,
                               numFiles: Int = 8): Unit =
    graft.sources.Lake.writeZOrdered(
      packed.select("doc_id", "source", "lang", "split", "n_tokens",
        "n_subword", "quality", "bin_id"),
      "n_tokens", "quality", path, numFiles)

  /** Export the train split as JSONL shards laid out one directory per
    * (source, bin) — the bin boundary is PHYSICAL, so a trainer
    * streaming a shard directory reads one token-bounded bin, not an
    * arbitrary Spark task partition.
    */
  def exportTrainJsonl(packed: DataFrame, outDir: String): Unit =
    JsonLines.write(
      packed.filter(col("split") === "train")
        .select("doc_id", "lang", "n_tokens", "text", "source", "bin_id"),
      outDir, partitionCols = Seq("source", "bin_id"))

  /** Export the train split SHUFFLED into fixed-size shards (the q68
    * discipline via [[CorpusQueries.withShards]]): md5-order global
    * permutation so consecutive shards mix sources/languages — the
    * training-order randomization the (source, bin)-grouped layout
    * deliberately does not do. One directory per `shard_id`; a shard's
    * rows may span several part-files (the 64-doc runs cut across range
    * partitions), so each row carries `pos_in_shard` for the trainer to
    * order by — globally reproducible, never reliant on file order.
    */
  def exportTrainShards(packed: DataFrame, outDir: String): Unit =
    JsonLines.write(
      CorpusQueries.withShards(
        packed.filter(col("split") === "train")
          .select("doc_id", "lang", "n_tokens", "text", "source"),
        "doc_id")
        .select("doc_id", "lang", "n_tokens", "text", "source",
          "shard_id", "pos_in_shard"),
      outDir, partitionCols = Seq("shard_id"))

  /** TOKEN-bounded shard export: the same md5-order global permutation
    * as [[exportTrainShards]], but shards cut by a token budget via
    * [[CorpusQueries.withShardsByTokens]] — real trainers provision
    * shards by tokens, not rows (64 docs can be 3k or 300k tokens).
    * `tokensCol` defaults to the subword-accurate count (q70); rows
    * carry `cum_tokens_global` (strictly increasing along the
    * permutation) for within-shard ordering.
    */
  def exportTrainShardsByTokens(packed: DataFrame, outDir: String,
                                tokensPerShard: Long,
                                tokensCol: String = "n_subword"): Unit =
    JsonLines.write(
      CorpusQueries.withShardsByTokens(
        packed.filter(col("split") === "train")
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("n_subword"), col("text"), col("source")),
        "doc_id", tokensCol, tokensPerShard)
        .select("doc_id", "lang", "n_tokens", "n_subword", "text",
          "source", "shard_id", "cum_tokens_global"),
      outDir, partitionCols = Seq("shard_id"))
}
