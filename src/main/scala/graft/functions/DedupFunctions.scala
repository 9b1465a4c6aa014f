package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for large-scale training-data pipelines:
  * portable content hashing, MinHash signatures, SimHash, and rolling-hash
  * fingerprints — all as pure column expressions (whole-stage codegen,
  * no UDFs, no driver round-trips).
  *
  * Portability contract: every hash here is derived from `md5` (identical
  * bytes on any engine), never from engine-internal hashes
  * (`xxhash64`/`hash` differ between Spark and DuckDB/Trino). The same
  * formulas are re-stated in the DuckDB oracle SQL, so the correctness
  * gate covers the *math*, not just row counts. At 100 TB you may swap
  * md5 for xxhash64 (3-4× faster) once both sides of a migration agree
  * on it; the pipeline shape is unchanged.
  *
  * Scale notes: signatures are computed in a single projection over the
  * corpus (no shuffle); the LSH band join shuffles only (band_idx,
  * band_key) pairs — `4 × corpus` rows of a few bytes — instead of the
  * O(n²) pairwise comparisons exact dedup would need.
  */
object DedupFunctions {

  /** Prime just above 2^32 — the MinHash universal-hash modulus. */
  val MinHashPrime: Long = 4294967311L

  /** Fingerprint modulus (2^31 − 1, Mersenne) and base for the
    * polynomial rolling hash.
    */
  val FpPrime: Long = 2147483647L
  val FpBase: Long = 31L

  /** Deterministic per-permutation coefficients, generated once at build
    * time from MurmurHash3 of the permutation index and inlined as
    * literals into BOTH the Spark plan and the oracle SQL (so the two
    * engines run the same permutation family). `a` is kept < 2^20 and
    * odd so `a*h + b` stays < 2^63 for h < 2^32 (no Long overflow).
    */
  def permCoeffs(nPerms: Int): Seq[(Long, Long)] =
    (0 until nPerms).map { i =>
      val a = (scala.util.hashing.MurmurHash3.stringHash(s"minhash-a-$i").toLong.abs % 1048573L) | 1L
      val b = scala.util.hashing.MurmurHash3.stringHash(s"minhash-b-$i").toLong.abs % MinHashPrime
      (a, b)
    }

  /** Portable 32-bit content hash of a string: first 8 hex chars of md5,
    * parsed base-16. Identical in DuckDB as
    * `CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`.
    */
  def md5Hash32(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [[md5Hash32]] evaluated JVM-side (first 4 md5 bytes as an unsigned
    * 32-bit value == first 8 hex chars parsed base-16) for typed
    * map/flatMap pipelines. Bit-identical to the column form.
    */
  def md5Hash32Jvm(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** [[md5Hash32Jvm]] over the first `len` bytes of a caller-owned
    * UTF-8 buffer — the allocation-free variant for hot loops that
    * assemble each input into a REUSABLE buffer instead of building a
    * String per row (q97's sliding spans: ~|text| windows per doc,
    * each previously paying a collection + builder + String + getBytes
    * before the digest even started). Identical to
    * `md5Hash32Jvm(new String(buf, 0, len, UTF_8))` because UTF-8
    * concatenation is byte-concatenation (property-pinned).
    */
  def md5Hash32JvmBytes(buf: Array[Byte], len: Int): Long = {
    val d = md5Digest.get()
    d.reset()
    d.update(buf, 0, len)
    val b = d.digest()
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** Element-wise 32-bit hashes of a string array, pre-reduced mod `m`
    * (pre-reduction keeps downstream fold arithmetic overflow-free and
    * makes Spark's fold-with-init equal DuckDB's init-less list_reduce).
    */
  def hashArray(arr: Column, m: Long): Column =
    transform(arr, s => md5Hash32(s) % m)

  /** MinHash signature over a (distinct) shingle array: one array<long>
    * of length `nPerms`. NULL when the doc has no shingles.
    */
  def minHashSignature(shingles: Column, nPerms: Int): Column = {
    val hs = hashArray(array_distinct(shingles), MinHashPrime)
    val sigs = permCoeffs(nPerms).map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % MinHashPrime))
    }
    when(size(hs) > 0, array(sigs: _*))
  }

  /** LSH band keys from a MinHash signature: `nBands` strings, each the
    * '-'-join of `rowsPerBand` consecutive signature slots. Docs sharing
    * any band key are near-dup candidates (join on (band_idx, key)).
    */
  def lshBands(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { b =>
      struct(
        lit(b).as("band_idx"),
        concat_ws("-", (0 until rowsPerBand).map(r =>
          element_at(sig, b * rowsPerBand + r + 1)): _*).as("band_key"))
    }: _*)

  /** SimHash of a token array, `nBits` wide (LSB-first): bit b is set
    * when at least half the token hashes have bit b set (majority vote
    * with ties → 1, the classic convention). NULL for empty docs.
    */
  def simHash(tokens: Column, nBits: Int): Column = {
    val hs = hashArray(tokens, MinHashPrime)
    val n = size(hs)
    val bits = (0 until nBits).map { b =>
      val mask = 1L << b
      val cnt = size(filter(hs, h => (h.bitwiseAND(mask)) =!= 0L))
      when(cnt * 2 >= n, mask).otherwise(0L)
    }
    when(n > 0, bits.reduce(_ + _))
  }

  /** Hamming distance between two simhash values (near-dup test:
    * `hammingDist(a, b) <= k`).
    */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Polynomial rolling-hash fingerprint of a token array:
    * fold (acc * 31 + h(tok)) mod (2^31-1). Token hashes are pre-reduced
    * mod the same prime so Spark's 0-seeded fold equals DuckDB's
    * seedless `list_reduce` (first step: 0*31 + h1 = h1). NULL for
    * empty docs.
    */
  def fingerprint(tokens: Column): Column = {
    val hs = hashArray(tokens, FpPrime)
    when(size(hs) > 0,
      aggregate(hs, lit(0L), (acc, h) => (acc * FpBase + h) % FpPrime))
  }

  /** CODE-POINT lexicographic comparison — the JVM-side twin of
    * UTF8String's unsigned-byte comparison (UTF-8 byte order equals
    * code-point order). This is NOT `String.compareTo`, which compares
    * UTF-16 code units and orders supplementary-plane characters
    * (surrogate pairs, 0xD800-prefixed) BEFORE U+E000..U+FFFF; arrays
    * sorted with this comparator merge-walk correctly against
    * UTF8String ordering inside
    * [[graft.expressions.SortedStringIntersectSize]] (ExpressionSpec
    * pins the alignment on exactly that divergence).
    */
  def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}
