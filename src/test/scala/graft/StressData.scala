package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial corpus generators for the scale-stress harness
  * (StressSpec asserts the invariants; StressBench records wall-times
  * into SCALE.md). Every shape here is the pathological version of
  * something the scaladocs CLAIM survives 100 TB:
  *
  *  - a band bucket far past `MaxBandBucket` that exact-dup collapse
  *    CANNOT contract (every doc's text is unique) — the cap must fire
  *    or the LSH self-join goes quadratic;
  *  - a connected component with worst-case diameter (a path) and a
  *    worst-case degree (a star) — label propagation must converge in
  *    O(log) rounds, not O(diameter);
  *  - one packing key owning ~90% of all tokens — the two-pass prefix
  *    sum must spread it across range partitions, not one window task;
  *  - one label owning 80% of vectors over independent geometry — the
  *    learned IVF quantizer must balance lists by geometry, where the
  *    old per-label quantizer would put 80% of the corpus in one list.
  *
  * All generation is seeded/deterministic — reruns see the same corpus.
  */
object StressData {

  /** `n` documents that all minhash into the SAME band buckets but have
    * pairwise-distinct text: a shared 300-word template dominates the
    * shingle set, so the per-doc unique tail only rarely wins a minhash
    * slot (P ≈ tail-shingles/total per permutation) and the template's
    * band buckets keep the overwhelming majority of docs. Callers must
    * still size `n` with slack above the cap they test — a perm the
    * tail DOES win moves that doc out of the template bucket. (The
    * first cut of this generator used an 80-word template; enough docs
    * leaked out that the hot bucket landed just UNDER MaxBandBucket and
    * the uncapped self-join ground a 4-thread JVM into a GC spiral —
    * the exact blowup the cap exists to prevent.)
    */
  def hotBucketDocs(n: Int): Seq[(Long, String)] = {
    val template = (1 to 300).map(w => s"word$w").mkString(" ")
    (1 to n).map(i => (i.toLong, s"$template uniq$i tail${i * 31}"))
  }

  /** `n` docs of `2·spanW` words: a fixed spanW-word boilerplate prefix
    * (ONE hot span hash shared by every doc — the q97 worst case: its
    * (hash) reducer key receives n rows) plus a per-doc unique tail, so
    * every straddling window is doc-unique. Expected q97 shape per doc:
    * `spanW+1` windows, exactly one cross-doc shared — modulo the
    * ~(n·(spanW+1))²/2³³ md5-32 birthday collisions the q97 scaladoc
    * documents. Generated in-executor: the driver never holds the corpus.
    */
  def boilerSpanDocs(s: SparkSession, n: Long, spanW: Int): DataFrame = {
    val boiler = (1 to spanW).map(i => s"boiler$i").mkString(" ")
    val tail = (1 to spanW).map(j =>
      concat(lit(s"u${j}_"), col("id").cast("string")))
    s.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", lit(boiler) +: tail: _*).as("text"))
  }

  def writeDocs(s: SparkSession, dir: String, docs: Seq[(Long, String)]): Unit = {
    import s.implicits._
    docs.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** A worst-diameter path (`0-1-2-…-pathN`) plus a worst-degree star
    * (hub with `starN` leaves), vertex ranges disjoint. Expected
    * components: every path vertex → `pathBase`, every star vertex →
    * `starBase`.
    */
  val PathBase = 1000000L
  val StarBase = 5000000L
  def pathPlusStarEdges(s: SparkSession, pathN: Int, starN: Int): DataFrame = {
    import s.implicits._
    val path = (0 until pathN)
      .map(i => (PathBase + i, PathBase + i + 1))
    val star = (1 to starN).map(i => (StarBase, StarBase + i))
    (path ++ star).toDF("src", "dst").repartition(16)
  }

  /** Packing input with one key owning ~`hotShare` of all rows (and
    * therefore ~that share of tokens): (source, doc_id, n_tokens).
    */
  def skewedPackingRows(s: SparkSession, n: Int, hotShare: Double): DataFrame = {
    import s.implicits._
    val coldKeys = 10
    (0 until n).map { i =>
      val src =
        if (i.toDouble / n < hotShare) "web" else s"src${i % coldKeys}"
      // deterministic pseudo-random token count in [50, 430)
      (src, i.toLong, 50 + (i * 2654435761L % 380).toInt)
    }.toDF("source", "doc_id", "n_tokens").repartition(16)
  }

  /** `n` vectors in `gClusters` well-separated geometric clusters, with
    * 80% of them carrying ONE label regardless of geometry. The learned
    * quantizer sees only the geometry; the old label quantizer only the
    * labels.
    */
  def writeSkewedEmbeddings(s: SparkSession, dir: String, n: Int,
                            dims: Int, gClusters: Int): Unit = {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(gClusters)(
      Array.fill(dims)(rnd.nextGaussian().toFloat))
    val rows = (0 until n).map { i =>
      val g = i % gClusters
      val label = if (i % 10 < 8) 1 else 2 + i % 10
      val v = centers(g).map(c => c * 2f + rnd.nextGaussian().toFloat * 0.8f)
      (i.toLong, label, v)
    }
    rows.toDF("vec_id", "label", "embedding").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
