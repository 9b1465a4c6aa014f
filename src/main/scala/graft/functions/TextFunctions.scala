package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, shingling. All pure
  * column expressions — codegen'd, no UDFs, usable at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization. `split` on one-or-more-whitespace keeps no
    * empty trailing tokens; leading empties are filtered by the caller
    * when counting.
    */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish subword proxy: count of maximal runs of word chars plus
    * standalone punctuation marks (a cheap upper bound on BPE tokens,
    * the usual pre-filter before exact tokenization).
    */
  def tokenCountRegex(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+"), w => length(w) > 0)) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))

  /** Punctuation character ratio (quality signal). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double")
        / length(text).cast("double"))

  /** English stopword hit ratio over whitespace tokens. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def stopwordRatio(text: Column): Column = stopwordRatioOf(words(text))

  /** [[stopwordRatio]] over an ALREADY-TOKENIZED column — the q34
    * alias-split entry point (the q113 discipline): `filter(split(..))`
    * is an interpreted higher-order lambda with no codegen CSE, so a
    * caller emitting several token-derived columns aliases [[words]]
    * once in its own projection and feeds the attribute here, instead
    * of re-tokenizing per reference (this expression alone holds three).
    */
  def stopwordRatioOf(ws: Column): Column =
    when(size(ws) === 0, 0.0).otherwise(
      size(filter(ws, w => w.isin(EnStopwords.map(x => x: Any): _*))).cast("double")
        / size(ws).cast("double"))

  /** Composite quality score in [0,1]: length sweet-spot × low punctuation
    * × presence of stopwords. Deterministic, documented formula so the
    * DuckDB oracle can replicate it.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(words(text), punctRatio(text))

  /** [[qualityScore]] over already-computed token array and punctuation
    * ratio — same alias-split entry point as [[stopwordRatioOf]]; the
    * arithmetic is shared verbatim so the two forms can never drift.
    */
  def qualityScoreOf(ws: Column, pr: Column): Column = {
    val n = size(ws).cast("double")
    val lengthScore = least(n / 100.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - pr * 5.0)
    round(lengthScore * punctScore, 4)
  }

  /** N-gram word shingles: `["a","b","c","d"]`, n=3 →
    * `["a b c","b c d"]`. Built from `sequence` + `transform` +
    * `slice` — array expressions only.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
  }

  /** Character n-grams (for language ID / fingerprinting). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => substring(text, lit(i), lit(n))))

  /** Heuristic language ID by marker-word counts. Deterministic and
    * SQL-replicable; a real pipeline would swap in fastText via
    * mapPartitions but keep this as the cheap pre-filter.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val ws = words(lower(text))
    size(filter(ws, w => w.isin(markers.map(x => x: Any): _*)))
  }

  /** Literal subword vocabulary for the deterministic greedy
    * longest-match tokenizer ([[TextJvm.subwordCount]], q70) — the
    * MinHash-constant discipline: one Scala constant interpolated into
    * BOTH the typed pass and the DuckDB oracle, so token counts are
    * engine-portable by construction. A real pipeline swaps in a
    * trained BPE merge table (e.g. derived from q64's top n-grams at
    * corpus scale); the greedy longest-match machinery — the part that
    * has to be distributed and oracle-checkable — is unchanged by a
    * bigger vocab. Entries are whole words plus subword pieces;
    * anything unmatched falls back to one codepoint per token.
    * ASCII-only by contract (see [[TextJvm.subwordCount]] for why that
    * guarantees char/codepoint lockstep).
    */
  val SubwordVocab: Seq[String] = Seq(
    "the", "join", "row", "key", "data", "part", "sort", "fast", "big",
    "sc", "an", "ta", "ble", "val", "ue", "col", "umn", "win", "dow",
    "str", "eam", "er", "ing", "or", "der", "cust", "om", "mer", "ge",
    "sm", "all", "qu", "ery", "ba", "tch", "ha", "sh", "gr", "oup",
    "ve", "ctor", "li", "ne", "sl", "ow", "ag", "sp", "ark", "fil",
    "ter", "du", "a")

  /** Vocab grouped by entry length for the greedy matcher — index l
    * holds the length-l entries (index 0 unused). Built once per JVM.
    */
  lazy val SubwordVocabByLen: Array[Set[String]] =
    TextJvm.vocabByLen(SubwordVocab)
}
