package graft.functions

import java.util.regex.Pattern

/** JVM-side twins of the [[TextFunctions]] column expressions, for the
  * narrow typed passes where interpreted higher-order lambdas lose
  * (q61's entropy fold, the corpus scoring job). One definition per
  * formula: the query and the job both call these, so they cannot
  * drift apart — and the regex Patterns are compiled ONCE per JVM, not
  * per document (String.split/replaceAll recompile per call; Spark's
  * regexp_replace caches, and the typed path must not be slower).
  *
  * Portability notes baked in: counting is by CODEPOINT (DuckDB's
  * length()/substr() semantics, UTF8String.numChars), the entropy fold
  * runs left-to-right over codepoints in ascending order (UTF-8 byte
  * order == codepoint order, so it matches the oracle's ORDER BY), and
  * the same java.util.regex engine evaluates the same patterns Spark's
  * codegen'd expressions use.
  */
object TextJvm extends Serializable {

  private val Ws: Pattern = Pattern.compile("\\s+")
  private val Punct: Pattern = Pattern.compile("[\\p{L}\\p{N}\\s]")

  /** Whitespace token count — twin of [[TextFunctions.tokenCountWs]]. */
  def tokenCountWs(text: String): Long =
    Ws.split(text).count(_.nonEmpty).toLong

  /** Codepoint length — twin of Spark `length()` on strings. */
  def lenCodepoints(text: String): Long =
    text.codePointCount(0, text.length).toLong

  /** Composite quality score, UNROUNDED — twin of
    * [[TextFunctions.qualityScore]] before its 4-dp `round` (callers
    * round through the same column `round`, guaranteeing identical
    * rounding to the declarative form).
    */
  def qualityRaw(text: String): Double = {
    val n = tokenCountWs(text).toDouble
    val len = lenCodepoints(text)
    val stripped = Punct.matcher(text).replaceAll("")
    val praw =
      if (len == 0) 0.0
      else stripped.codePointCount(0, stripped.length).toDouble / len.toDouble
    math.min(n / 100.0, 1.0) * math.max(0.0, 1.0 - praw * 5.0)
  }

  /** Greedy longest-match subword tokenization of one whitespace word
    * against [[TextFunctions.SubwordVocab]]: at each position consume
    * the LONGEST vocab entry matching there, else fall back to a single
    * codepoint (the "byte fallback" of real BPE vocabularies). Returns
    * the token count.
    *
    * Engine parity is exact, not approximate: the DuckDB oracle replays
    * the same loop with `substr`/`len` (codepoint semantics), and this
    * side advances by `Character.charCount` on fallback so char-index
    * bookkeeping stays in lockstep with codepoint positions — an ASCII
    * vocab entry can only match an all-ASCII window, where chars ==
    * codepoints, and a non-ASCII window matches on neither side. (The
    * oracle unrolls 64 greedy steps per word; words beyond 64 codepoints
    * would diverge — corpus max is 8, and real BPE pre-tokenizers cap
    * word length far below 64 anyway.)
    */
  def subwordCount(word: String): Long =
    subwordCountWith(word, TextFunctions.SubwordVocabByLen)

  /** The greedy matcher against ANY by-length vocab table (index l =
    * the length-l entries) — [[subwordCount]] binds the fixed literal
    * vocab; q78 binds a corpus-LEARNED vocab built at query time.
    */
  def subwordCountWith(word: String, byLen: Array[Set[String]]): Long = {
    val maxLen = byLen.length - 1
    var pos = 0
    var cnt = 0L
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      var step = 0
      while (l >= 1 && step == 0) {
        val s = byLen(l)
        if (s.nonEmpty && s.contains(word.substring(pos, pos + l))) step = l
        l -= 1
      }
      if (step == 0) step = Character.charCount(word.codePointAt(pos))
      pos += step
      cnt += 1
    }
    cnt
  }

  /** Group a vocab into the by-length table the greedy matcher scans. */
  def vocabByLen(vocab: Seq[String]): Array[Set[String]] = {
    val maxLen = vocab.map(_.length).max
    val a = Array.fill(maxLen + 1)(Set.empty[String])
    vocab.groupBy(_.length).foreach { case (l, vs) => a(l) = vs.toSet }
    a
  }

  /** Whitespace AND subword token counts from ONE split — the hot-path
    * form for passes that need both (the corpus scorer, q70): the text
    * is regex-split exactly once. Whitespace is a delimiter, never a
    * token, so doc-level greedy == word-level greedy — which is what
    * lets the oracle tokenize DISTINCT words once and join back.
    */
  def wsAndSubwordCounts(text: String): (Long, Long) = {
    val ws = Ws.split(text)
    var i = 0
    var n = 0L
    var sub = 0L
    while (i < ws.length) {
      if (ws(i).nonEmpty) { n += 1; sub += subwordCount(ws(i)) }
      i += 1
    }
    (n, sub)
  }

  /** Per-document subword token count: Σ [[subwordCount]] over
    * whitespace words.
    */
  def subwordCountDoc(text: String): Long = wsAndSubwordCounts(text)._2

  private val Ln2 = math.log(2.0)

  /** Character-unigram entropy in bits, UNROUNDED: −Σ p·log2 p folded
    * left-to-right over codepoints in ascending order. None for the
    * empty string. The single definition behind q61 and the corpus
    * scoring job.
    */
  def charEntropyRaw(text: String): Option[Double] =
    if (text.isEmpty) None
    else {
      val counts = scala.collection.mutable.HashMap.empty[Int, Int]
      var i = 0
      var n = 0L
      while (i < text.length) {
        val cp = text.codePointAt(i)
        counts.update(cp, counts.getOrElse(cp, 0) + 1)
        i += Character.charCount(cp)
        n += 1
      }
      var acc = 0.0
      counts.toSeq.sortBy(_._1).foreach { case (_, k) =>
        val p = k.toDouble / n
        acc += p * (math.log(p) / Ln2)
      }
      Some(-acc)
    }

  /** q169's content-defined chunker: split `text` where the rolling
    * gear hash `h ← (2h + gear(cp)) mod mask` hits 0 at codepoint
    * index ≥ `window` (`gear(cp) = cp·2654435761 mod 2³²`). The
    * rolling form is EXACTLY the oracle's windowed sum
    * `Σ gear(c_j)·2^(i−j) mod mask` because `2^k ≡ 0 (mod mask)` for
    * `k ≥ log₂(mask)` — valid while `window ≥ log₂(mask)`, which the
    * caller's constants guarantee. One O(len) codepoint pass per doc
    * (the q61 typed-hot-loop discipline — a SQL
    * `substring(text, i, 1)` per position re-seeks codepoints from
    * the string head and goes O(len²)).
    */
  def cdcChunks(text: String, window: Int, mask: Long): Seq[String] = {
    if (text.isEmpty) Nil
    else {
      val out = Seq.newBuilder[String]
      var h = 0L
      var i = 0      // UTF-16 index
      var cpIdx = 0  // codepoint count consumed
      var start = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        i += Character.charCount(cp)
        cpIdx += 1
        h = (h * 2 + (cp * 2654435761L) % 4294967296L) % mask
        if (cpIdx >= window && h == 0) {
          out += text.substring(start, i)
          start = i
        }
      }
      if (start < text.length) out += text.substring(start)
      out.result()
    }
  }

  /** q166's bigram emitter: all adjacent CODEPOINT pairs in one O(len)
    * pass (the per-position SQL-substring form is the same O(len²)
    * trap as [[cdcChunks]]), each pair PACKED into one long —
    * `(cp₁ << 21) | cp₂`, injective because codepoints are ≤ 0x10FFFF
    * (21 bits). The packed key replaces a per-bigram 2-char String in
    * q166's group-by and broadcast-join hot path: long hashing and
    * equality are branch-free codegen where String keys pay object
    * allocation + per-char hashing on every one of the corpus's ~|text|
    * bigram rows (the q120 fixed-width-key discipline, A/B'd in
    * BASELINE.md). `key >>> `[[BigramShift]] recovers the conditioning
    * codepoint without string surgery.
    */
  def charBigramKeys(text: String): Array[Long] = {
    val cps = text.codePoints().toArray
    val out = new Array[Long](math.max(cps.length - 1, 0))
    var k = 0
    while (k < out.length) {
      out(k) = (cps(k).toLong << BigramShift) | cps(k + 1).toLong
      k += 1
    }
    out
  }

  /** Number of bits [[charBigramKeys]] shifts the first codepoint by —
    * shared between the packing above and the SQL side
    * (`shiftrightunsigned(bg, 21)`) so the context extraction can
    * never drift from the packing (r15 ADVICE: the packing itself
    * must use it too, not a literal).
    */
  final val BigramShift = 21

  /** Immutable open-address long→long hash table over NON-NEGATIVE
    * keys ([[charBigramKeys]] packs into 42 bits, so −1 is free as the
    * empty slot) — the broadcast model lookup of q166's typed score
    * pass. Linear probing at ≤50% load: ~1–2 probes per hit where a
    * binary search pays ~14 on a 10k vocab, and the hot loop runs once
    * per corpus bigram. Two plain long arrays, so the broadcast
    * serializes compactly and deserializes allocation-free.
    *
    * A miss THROWS: q166 fits and scores on the same corpus, so every
    * scored bigram was counted — an absent key means the two passes
    * diverged, which must fail the query loudly, never score as 0.
    */
  final class PackedKeyTable private (mask: Int, ks: Array[Long],
                                      vs: Array[Long]) extends Serializable {
    def apply(k: Long): Long = {
      var i = PackedKeyTable.slot(k, mask)
      while (ks(i) != k) {
        if (ks(i) == -1L)
          throw new NoSuchElementException(s"key $k absent from table")
        i = (i + 1) & mask
      }
      vs(i)
    }
  }

  object PackedKeyTable {
    /** SplitMix64 finalizer — packed keys are sequential-ish in their
      * low bits, so identity hashing would convoy the probe chains.
      */
    private def slot(k: Long, mask: Int): Int = {
      var z = k * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) & mask).toInt
    }

    /** Max buildable key count: keeps `cap` (≥2× keys, power of two)
      * inside positive Int so the capacity doubling below can never
      * overflow into a >100% load table whose absent-key probe loops
      * forever (r16 ADVICE — the |charset|² vocab bound that made this
      * unreachable was assumed, not enforced).
      */
    private val MaxKeys = 1 << 29

    def build(keys: Array[Long], vals: Array[Long]): PackedKeyTable = {
      require(keys.length == vals.length, "keys/vals length mismatch")
      require(keys.length <= MaxKeys,
        s"PackedKeyTable supports at most $MaxKeys keys, got ${keys.length}")
      var cap = 4
      while (cap < keys.length * 2) cap <<= 1
      val mask = cap - 1
      val ks = Array.fill(cap)(-1L)
      val vs = new Array[Long](cap)
      var n = 0
      while (n < keys.length) {
        val k = keys(n)
        require(k >= 0L, s"PackedKeyTable keys must be non-negative: $k")
        var i = slot(k, mask)
        while (ks(i) != -1L && ks(i) != k) i = (i + 1) & mask
        // last-wins on a duplicate would silently pick one value; the
        // table's callers feed groupBy output where keys are distinct
        // by construction, so an equal-key hit here means the caller's
        // invariant broke — fail as loudly as the miss path does
        // (VERDICT r16 item 5)
        require(ks(i) != k, s"duplicate key $k in PackedKeyTable.build")
        ks(i) = k
        vs(i) = vals(n)
        n += 1
      }
      new PackedKeyTable(mask, ks, vs)
    }
  }
}
