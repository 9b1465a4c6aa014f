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
        (id, TextJvm.tokenCountWs(text), TextJvm.qualityRaw(text),
          TextJvm.charEntropyRaw(text))
      }
      .toDF("doc_id", "n_tokens", "quality_raw", "entropy_raw")
      .select(col("doc_id"), col("n_tokens"),
        round(col("quality_raw"), 4).as("quality"),
        round(col("entropy_raw"), 4).as("entropy"))
  }

  /** The dedup decision (q48): doc_id → canonical_doc_id. */
  def dedupDecide(s: SparkSession, sfDir: String): DataFrame =
    DedupQueries.clusterLabels(s, sfDir)

  /** Filter + split + pack: keep canonical documents above
    * [[MinQuality]], assign the deterministic train/val/test split
    * (q60 hash discipline), sequence-pack the survivors (q57
    * discipline) PER (source, split) — a val/test document must not
    * consume a train bin's token budget, and every split's packing
    * starts at bin 0 — and return the shippable row set. Packing runs
    * through [[graft.operators.SequencePacking]]'s two-pass prefix sum,
    * so a dominant (source, split) group spans range partitions instead
    * of serializing through one window task (JobsSpec asserts the plan
    * carries no Window node).
    */
  def filterPack(s: SparkSession, sfDir: String,
                 scores: DataFrame, dedup: DataFrame): DataFrame = {
    val docs = Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val h = graft.functions.DedupFunctions.md5Hash32(
      concat(lit("split-"), col("doc_id").cast("string"))) % 100
    val kept = docs
      .join(dedup, "doc_id")
      .filter(col("doc_id") === col("canonical_doc_id"))
      .join(scores, "doc_id")
      .filter(col("quality") >= MinQuality)
      .withColumn("split",
        when(h < CorpusQueries.TrainPct, "train")
          .when(h < CorpusQueries.ValPct, "val").otherwise("test"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    graft.operators.SequencePacking.withBins(
      kept, keyCols = Seq("source", "split"), orderCol = "doc_id",
      tokensCol = "n_tokens",
      tokensPerBin = graft.queries.TextQueries.TokensPerBin)
      .select("doc_id", "source", "lang", "split", "n_tokens", "quality",
        "entropy", "bin_id", "text")
  }

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
}
