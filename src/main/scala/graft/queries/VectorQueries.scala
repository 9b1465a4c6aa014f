package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.expressions.VectorExpressions
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` corpus (`array<float>` + a
  * coarse `label`): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale shape: brute-force is one broadcast of the query vector + a
  * full scan with a TakeOrderedAndProject (no global sort, no shuffle of
  * the corpus). The LSH variant buckets the corpus in ONE projection
  * (sign bits of literal-hyperplane projections — codegen'd column math,
  * no plane matrices shipped) and then scans only the query's bucket:
  * at 1B vectors / 2^16 buckets that is a ~15k-row scan instead of 1B.
  * The hyperplanes are deterministic build-time literals shared verbatim
  * with the DuckDB oracle, so bucket ids are engine-portable.
  */
object VectorQueries extends Serializable {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val Dims = 64
  val NBits = 8
  val TopK = 10
  val QueryVecId = 0L

  /** Brute-force cosine top-k for ANY query vector — the exact-recall
    * baseline every ANN variant is judged against (RecallSpec measures
    * q38/q56 recall@k against this).
    */
  private[graft] def exactTopKDf(s: SparkSession, dir: String,
                                 qid: Long): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === qid)
      .select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** q37 — brute-force cosine top-k against the query vector (vec_id 0). */
  def q37(s: SparkSession, dir: String): DataFrame =
    exactTopKDf(s, dir, QueryVecId)

  /** LSH-bucketed ANN for ANY query vector with MULTI-PROBE: scan every
    * bucket within Hamming distance `radius` of the query's bucket
    * (radius 0 = the single-bucket q38 semantics). A sign bit flips
    * exactly when the query sits near that hyperplane, so the nearest
    * misses land overwhelmingly in Hamming-adjacent buckets — radius 1
    * probes 1+NBits of the 2^NBits buckets (9/256 here) and, measured
    * by RecallSpec, multiplies recall severalfold while the scan stays
    * bucket-pruned. The candidate bucket ids are a driver-side literal
    * list (2^NBits is small by construction), so the plan is still one
    * pruned scan + broadcast of the query row, nothing pairwise.
    */
  private[graft] def lshTopKDf(s: SparkSession, dir: String, qid: Long,
                               radius: Int = 0): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
      .withColumn("bucket", VectorExpressions.lshBucket(col("embedding"), NBits, Dims))
    val q = e.filter(col("vec_id") === qid)
      .select(col("bucket").as("qbucket"), col("embedding").as("qv"))
    val qBucket = q.select(col("qbucket")).as[Long].head()
    val probed = (0L until (1L << NBits))
      .filter(b => java.lang.Long.bitCount(b ^ qBucket) <= radius)
    e.filter(col("vec_id") =!= qid && col("bucket").isin(probed: _*))
      .crossJoin(broadcast(q.select(col("qv"))))
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), col("bucket"), round(col("cos"), 6).as("cos_sim"))
  }

  /** q38 — the single-bucket (radius 0) LSH search for the vec_id-0
    * query vector. RecallSpec's measured guidance: use radius ≥ 1 when
    * recall matters more than the last 10× of scan reduction.
    */
  def q38(s: SparkSession, dir: String): DataFrame =
    lshTopKDf(s, dir, QueryVecId)

  /** Multi-probe radius for q66 (RecallSpec: recall 0.335 vs 0.015 at
    * radius 0, scanning 37/256 buckets instead of 1/256).
    */
  val ProbeRadius = 2

  /** q66 — multi-probe LSH ANN: the [[lshTopKDf]] Hamming-radius
    * search as a gated query ([[ProbeRadius]], vec_id 0) — the recall
    * path beside q38's maximum scan reduction.
    */
  def q66(s: SparkSession, dir: String): DataFrame =
    lshTopKDf(s, dir, QueryVecId, ProbeRadius)

  /** Per-label centroid frame (label, n_vecs, centroid: array<double>):
    * element-wise mean embedding + member count per coarse label. The
    * vector-analytics reduction behind an IVF index build (centroid per
    * inverted list), cluster drift monitoring, and class prototypes.
    * posexplode → (label, dim) partial-agg shuffle (nothing quadratic,
    * no vectors collected to the driver); the re-assembly groupBy
    * touches labels × dims tiny rows. Rounded to 6 decimals so the
    * float-sum order difference between engines cannot surface.
    * Consumed by q56 (the coarse quantizer) and presented by q54.
    */
  def centroidFrame(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val counts = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
    val centroid = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("label"),
        transform(col("ps"), p => round(p("m"), 6)).as("centroid"))
    counts.join(centroid, "label")
      .select(col("label"), col("n_vecs"), col("centroid"))
  }

  /** q54 — the [[centroidFrame]] with the vector presented as a
    * comma-joined list of micro-units (round(m·1e6) as BIGINT). The
    * correctness gate canonicalizes rows in pandas, which cannot sort
    * or hash array cells — so the public query row is all-scalar, and
    * integer micro-units make the string rendering engine-portable
    * (no float-formatting divergence between Spark and DuckDB).
    */
  def q54(s: SparkSession, dir: String): DataFrame =
    centroidFrame(s, dir)
      .select(col("label"), col("n_vecs"),
        array_join(transform(col("centroid"),
          x => round(x * 1e6, 0).cast("long").cast("string")), ",")
          .as("centroid"))

  /** Probe count for the IVF search (q56). */
  val NProbe = 2

  /** Left-to-right double cosine — bit-equal to the oracle's
    * `cosineSql` fold (products in index order, 0.0-seeded sum).
    */
  private def cosD(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The materialized IVF index for one (session, dataset): the
    * inverted-list layout on disk plus the (tiny) centroid table the
    * probe ranks against.
    */
  private[graft] case class IvfIndex(listsPath: String,
                                     cents: Array[(Int, Array[Double])])

  /** Nearest centroid, ties to the smaller label (strict > keeps the
    * first of the label-sorted array).
    */
  private def assignTo(cs: Array[(Int, Array[Double])],
                       emb: Array[Float]): Int = {
    var best = cs(0)._1; var bestCos = cosD(emb, cs(0)._2)
    var i = 1
    while (i < cs.length) {
      val c = cosD(emb, cs(i)._2)
      if (c > bestCos) { bestCos = c; best = cs(i)._1 }
      i += 1
    }
    best
  }

  /** Learned-quantizer build config: K inverted lists, trained by
    * [[KmIters]] Lloyd iterations over a deterministic md5 hash-sample
    * (first hex digit in 0-3 → 1/4 of the corpus). No RNG anywhere —
    * seeds are the K sample vectors with the smallest (md5, vec_id),
    * so the build is reproducible AND the DuckDB oracle can replay it
    * in lock-step SQL.
    */
  val KLists = 10
  val KmIters = 2
  private val SampleHexDigits = Seq("0", "1", "2", "3")

  /** Driver-side mirror of SQL `round(x, 6)` (HALF_UP — what both
    * Spark's `round` and DuckDB's `round` do), for the seed centroids
    * that never pass through a SQL projection.
    */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The coarse quantizer the IVF build assigns against: k-means
    * centroids learned from the hash-sample, NOT the per-label means —
    * list balance must track embedding geometry, not label frequency
    * (one fat label would otherwise become one fat inverted list and
    * every probe of it would scan 80% of the corpus). Each Lloyd
    * iteration is one broadcast of K × dims doubles + one
    * (cid, pos) partial-agg shuffle of the SAMPLE only — the full
    * corpus is touched once, at assignment time in [[ivfIndex]]. All
    * centroid arithmetic is rounded to 6 decimals per iteration so
    * assignments are engine-portable (the q54 contract); clusters that
    * lose every member keep their previous centroid on both engines.
    *
    * Portability caveat (accepted): this side rounds with exact
    * BigDecimal HALF_UP on the binary double while DuckDB's `round()`
    * computes in floating point, so a centroid coordinate sitting
    * exactly on a rounding boundary can differ by 1e-6 — the same
    * 1-ulp risk the repo carries for q54, but here it COMPOUNDS through
    * [[KmIters]] iterations (a flipped assignment in iteration k feeds
    * every later mean). CORRECTNESS gates it empirically at the shipped
    * KmIters=2; re-check the oracle match whenever KmIters is raised.
    *
    * The sample is materialized ONCE and feeds both the seed take
    * and every Lloyd iteration — without it each iteration re-scans the
    * parquet for the sample (uncached lineage), making build cost grow
    * by a full sample scan per added iteration, the dominant build term
    * at deployment scale.
    */
  private[graft] def quantizerCentroids(
      s: SparkSession, dir: String): Array[(Int, Array[Double])] = {
    import s.implicits._
    val samp = t(s, dir, "embeddings")
      .withColumn("h", md5(col("vec_id").cast("string")))
      .filter(substring(col("h"), 1, 1).isin(SampleHexDigits: _*))
      .select(col("h"), col("vec_id"), col("embedding"))
      .materialize()
    val seeds = samp.orderBy(col("h"), col("vec_id"))
      .select(col("embedding")).as[Array[Float]].take(KLists)
    require(seeds.length == KLists,
      s"sample too small for $KLists seeds: ${seeds.length}")
    var cents: Array[(Int, Array[Double])] = seeds.zipWithIndex
      .map { case (emb, i) => (i, emb.map(f => round6(f.toDouble))) }
    val sampVecs = samp.select(col("embedding")).as[Array[Float]]
    for (_ <- 1 to KmIters) {
      val bc = s.sparkContext.broadcast(cents)
      val means = sampVecs
        .map(emb => (assignTo(bc.value, emb), emb))
        .toDF("cid", "embedding")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cid"), transform(col("ps"), p => p("m")).as("c"))
        .as[(Int, Seq[Double])].collect().toMap
      cents = cents.map { case (cid, old) =>
        (cid, means.get(cid).map(_.toArray).getOrElse(old))
      }
    }
    cents
  }

  /** System property naming an explicit IVF index root. Two callers:
    * a deployment pointing the index home at a shared lake path
    * (instead of the node-local tmpdir default below), and
    * [[graft.IvfBuildBench]], which must rebuild indexes WITHOUT
    * touching the published root other JVMs may be adopting from
    * mid-run (r14 ADVICE — its delete-and-rebuild loop could expose a
    * missing/half-built index to a concurrent Bench/Verify).
    */
  val IvfRootProp = "graft.ivf.root"

  /** Per-dataset root for IVF index versions:
    * (root)/md5(dataset path), where root is [[IvfRootProp]] if set and
    * otherwise tmpdir/graft-ivf-(user). User-scoped in the default
    * because the path is otherwise predictable under a world-writable
    * /tmp — another local user could pre-create it (poisoned index /
    * DoS). All index IO below goes through the Hadoop FS API so the
    * same code runs against a lake path root.
    */
  private[graft] def ivfRoot(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    sys.props.get(IvfRootProp) match {
      case Some(root) => java.nio.file.Paths.get(root, h).toString
      case None =>
        val user = sys.props.getOrElse("user.name", "anon")
        java.nio.file.Paths
          .get(sys.props("java.io.tmpdir"), s"graft-ivf-$user", h).toString
    }
  }

  /** On-disk index format tag, part of the version dir name: bumped
    * whenever the layout or the quantizer algorithm changes, so an
    * index built by older code is never adopted with the wrong
    * semantics — it simply stops being addressed. Superseded versions
    * (old formats, old fingerprints) are NOT reclaimed by builds (see
    * [[ivfIndex]]); a deployment pairs the index root with a retention
    * job (the [[graft.jobs.StorageBackup]] cutoff pattern), and the
    * sandbox's per-dataset tmp root bounds the residue to the handful
    * of rewrites a test session performs.
    */
  private val IndexFormat = "kq1"

  /** Deterministic on-disk home for ONE VERSION of a dataset's IVF
    * index: [[ivfRoot]]/[[IndexFormat]]-(content fingerprint of the
    * embeddings table). Keying the leaf on
    * [[graft.sources.DatasetFingerprint]] — file names, sizes and
    * mtimes, not just the path — means a dataset rewritten IN PLACE
    * gets a fresh home automatically: a surviving completeness marker
    * from the old version can never be adopted for the new data.
    * Superseded sibling versions are left for a retention job (see
    * [[ivfIndex]] — sweeping them here could delete an index a live
    * session still holds memoized).
    */
  private[graft] def ivfIndexPath(s: SparkSession, dir: String): String =
    java.nio.file.Paths.get(ivfRoot(dir), IndexFormat + "-" +
      graft.sources.DatasetFingerprint.ofTable(s, dir, "embeddings")).toString

  /** Session-memo key for the built index — fingerprinted like the
    * path, so even a memo HIT cannot serve an index for rewritten data.
    */
  private[graft] def ivfMemoKey(s: SparkSession, dir: String): String =
    s"ann-ivf-index:$dir:" +
      graft.sources.DatasetFingerprint.ofTable(s, dir, "embeddings")

  /** True iff the on-disk index at `path` is complete AND readable: the
    * end-of-build marker exists, the `_centroids` parquet has data
    * files, and at least one `list_id=` partition dir survives. The
    * extra checks guard against tmp reapers that age out individual
    * files (marker outlives data) — a failed check falls back to a
    * rebuild instead of a broken probe.
    */
  private def indexHealthy(fs: org.apache.hadoop.fs.FileSystem,
                           path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs.exists(new org.apache.hadoop.fs.Path(path, "_GRAFT_INDEX_DONE")) &&
      fs.globStatus(
        new org.apache.hadoop.fs.Path(path, "_centroids/*.parquet"))
        .nonEmpty &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("list_id="))
  }

  /** IVF index build, ONCE per dataset version ACROSS sessions: every
    * vector is assigned to its nearest quantizer centroid (one
    * broadcast of K × dims doubles, one narrow pass — no shuffle) and
    * the corpus is written as a
    * [[graft.sources.Lake.writeListPartitioned]] inverted-list layout,
    * `partitionBy(list_id)`, at the [[ivfIndexPath]] deterministic
    * location; the (tiny) quantizer centroids are persisted inside it
    * (`_centroids` — underscore-prefixed, invisible to Spark's scan) so
    * adoption needs no corpus scan. The assignment — the full-corpus
    * pass — happens at BUILD time; every probe after it is a
    * partition-pruned scan of the probed lists only. Memoized per
    * session ([[QueryMemo]]) AND adopted from disk by a completeness
    * marker written after both writes commit — exactly the index
    * lifecycle a 1B-vector deployment needs: build is a job, probes are
    * lookups. Two sessions racing the build each write into their OWN
    * session-unique staging dir and commit with one atomic directory
    * `rename` onto the versioned path — rename-wins IS the marker
    * claim, so no interleaved-writer dir can ever exist; the loser's
    * rename fails and it adopts the winner's (identical, deterministic)
    * index. Superseded sibling versions are NOT swept here: a live
    * session may still hold the old version memoized mid-probe, and
    * deleting under it would fail those probes — reclaiming old
    * versions is a retention job's concern in a deployment (the
    * sandbox's per-dataset tmp root keeps the residue bounded).
    */
  private[graft] def ivfIndex(s: SparkSession, dir: String): IvfIndex =
    QueryMemo.getAny(s, ivfMemoKey(s, dir)) {
      import s.implicits._
      val path = ivfIndexPath(s, dir)
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      def adopt(): IvfIndex = {
        // adoption is the bench's second warm channel: the index was
        // built by an earlier run/query, so this query's time is
        // adopt-cost, not standalone cost — surface it to the warm tag
        QueryMemo.noteExternalArtifactHit()
        val cents = s.read.parquet(path + "/_centroids")
          .select(col("cid"), col("centroid")).as[(Int, Seq[Double])]
          .collect().map { case (l, c) => (l, c.toArray) }.sortBy(_._1)
        IvfIndex(path, cents)
      }
      if (indexHealthy(fs, path)) adopt()
      // re-probe right before touching the path: a concurrent session
      // may have PUBLISHED between the check above and here, and
      // publishes are atomic renames, so healthy-now means complete-now
      // — never delete a healthy index (the residual instant between
      // this check and the delete is the accepted TOCTOU window of the
      // sandbox's courtesy race handling; a deployment serializes
      // builds as a scheduled job)
      else if (indexHealthy(fs, path)) adopt()
      else {
        // an UNHEALTHY published dir (reaper-damaged: rename commits
        // are all-or-nothing, so partial builds never publish) cannot
        // be repaired in place — remove it so the rename can land
        if (fs.exists(hPath)) fs.delete(hPath, true)
        // stage under a session-unique name in the SAME root (rename
        // is only atomic within a filesystem/volume)
        val stagePath = new org.apache.hadoop.fs.Path(
          hPath.getParent, s".stage-${java.util.UUID.randomUUID()}")
        val cents: Array[(Int, Array[Double])] = quantizerCentroids(s, dir)
        val bc = s.sparkContext.broadcast(cents)
        val assigned = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
          .map { case (id, emb) => (id, assignTo(bc.value, emb), emb) }
          .toDF("vec_id", "list_id", "embedding")
        graft.sources.Lake
          .writeListPartitioned(assigned, "list_id", "vec_id", stagePath.toString)
        cents.toSeq.map { case (l, c) => (l, c.toSeq) }
          .toDF("cid", "centroid")
          .coalesce(1).write.mode("overwrite")
          .parquet(stagePath.toString + "/_centroids")
        // the health marker is part of the staged content: it becomes
        // visible at `path` only via the atomic publish below
        fs.createNewFile(
          new org.apache.hadoop.fs.Path(stagePath, "_GRAFT_INDEX_DONE"))
        // Hadoop rename semantics trap: renaming onto an EXISTING dst
        // directory "succeeds" by moving the source INSIDE it (both
        // RawLocalFileSystem and HDFS) — that is a LOST race, not a
        // publish. Detect it by probing for our stage dir nested under
        // the published path and discard the nested copy.
        val renamed = fs.rename(stagePath, hPath)
        val nested = new org.apache.hadoop.fs.Path(hPath, stagePath.getName)
        if (renamed && !fs.exists(nested)) IvfIndex(path, cents)
        else { // lost the publish race — discard our copy, adopt theirs
          if (fs.exists(nested)) fs.delete(nested, true)
          if (fs.exists(stagePath)) fs.delete(stagePath, true)
          adopt()
        }
      }
    }

  /** q56 — IVF-style ANN over the MATERIALIZED [[ivfIndex]]: the
    * [[quantizerCentroids]] learned by seeded k-means are the coarse
    * quantizer; the query ranks them driver-side, probes its [[NProbe]]
    * nearest lists, and ONLY those lists' partitions are scanned
    * (PlanSpec asserts the probe scan's PartitionFilters carry
    * `list_id`). The second ANN scale path beside q38's LSH buckets: at
    * 1B vectors / 4k lists a probe reads ~nprobe/4k of the corpus —
    * off disk, not recomputed. The deterministic seeding + 6-decimal
    * per-iteration centroid rounding make the whole k-means replayable
    * in the DuckDB oracle, so assignments — and therefore results —
    * hash-match it.
    */
  def q56(s: SparkSession, dir: String): DataFrame =
    ivfTopKDf(s, dir, QueryVecId)

  /** The IVF probe for ANY query vector and probe width (q56 is the
    * vec_id-0, nprobe=[[NProbe]] instantiation; RecallSpec sweeps both
    * to produce the recall-vs-nprobe curve an IVF user tunes against).
    */
  private[graft] def ivfTopKDf(s: SparkSession, dir: String, qid: Long,
                               nprobe: Int = NProbe): DataFrame = {
    import s.implicits._
    val ix = ivfIndex(s, dir)
    val qEmb = t(s, dir, "embeddings")
      .filter(col("vec_id") === qid)
      .select(col("embedding")).as[Array[Float]].head()
    val probeLists = ix.cents
      .map { case (l, c) => (l, cosD(qEmb, c)) }
      .sortBy { case (l, c) => (-c, l) }
      .take(nprobe).map(_._1).toSeq
    s.read.parquet(ix.listsPath)
      .filter(col("list_id").isin(probeLists: _*) &&
        col("vec_id") =!= qid)
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"),
        typedLit(qEmb)))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), col("list_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Cosine bar for the IVF-blocked near-dup sweep (q74). Same value as
    * q32's label-blocked bar so the two blocking strategies are
    * directly comparable on the gated corpus.
    */
  val SemDedupCos = 0.35

  /** q74 — SemDeDup-style embedding near-dup, blocked by the LEARNED
    * IVF lists: all within-list pairs above [[SemDedupCos]]. This is
    * q32's operation with principled blocking — q32 blocks on the
    * `label` column (a stand-in for a semantic cluster id that real
    * corpora may not have), q74 blocks on the geometry the corpus
    * itself taught the quantizer, reusing the MATERIALIZED [[ivfIndex]]
    * verbatim (build once, serve ANN probes AND the dedup sweep).
    *
    * Scale shape: pairwise work is confined within lists — K balanced
    * lists cut the naive n²/2 to ~n²/(2K) (StressBench §4 shows the
    * learned quantizer keeps lists balanced under label skew, which is
    * exactly what bounds the largest list's quadratic term); the join
    * shuffles on `list_id` only. Blocking caveat (inherent to SemDeDup
    * and every blocked dedup): a pair split across a list boundary is
    * unseen — widen with multi-probe assignment if that recall matters.
    */
  def q74(s: SparkSession, dir: String): DataFrame = {
    val ix = ivfIndex(s, dir)
    val lists = s.read.parquet(ix.listsPath)
      .select(col("list_id"), col("vec_id"), col("embedding"))
    val a = lists.select(col("list_id"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = lists.select(col("list_id"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("list_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorExpressions.vecCosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= SemDedupCos)
      .select(col("list_id"), col("vec_a"), col("vec_b"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** q80 — int8 scalar quantization audit: per vector, the symmetric
    * max-abs scale (`max|x|/127`), and the cosine error the 4×-smaller
    * representation costs (`1 − cos(original, dequantized)`). The
    * storage lever for a deployment-scale embedding store — 100 TB of
    * float32 embeddings become 25 TB of int8 + one float scale per
    * vector — and this query is the audit that says whether the ANN
    * columns can take the trade (sub-1e-3 error at these magnitudes).
    *
    * One narrow typed pass, no shuffle. Quantized values are rounded
    * HALF_UP away from zero (BigDecimal), matching DuckDB's `round()`
    * — `Math.round` would diverge on negative halfway values. Cosine
    * accumulates left-to-right in double on both engines (the q37
    * parity discipline), so the 6-dp error hash-matches.
    */
  def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        var maxAbs = 0.0
        emb.foreach(x => maxAbs = math.max(maxAbs, math.abs(x.toDouble)))
        val scale = maxAbs / 127.0
        if (maxAbs == 0.0) (id, 0.0, None: Option[Double])
        else {
          val deq = emb.map { x =>
            val q = new java.math.BigDecimal(x.toDouble / scale)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
            q * scale
          }
          var dot = 0.0
          var na = 0.0
          var nb = 0.0
          var i = 0
          while (i < emb.length) {
            dot += emb(i).toDouble * deq(i)
            na += emb(i).toDouble * emb(i).toDouble
            nb += deq(i) * deq(i)
            i += 1
          }
          val err = 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
          (id, scale, Some(err))
        }
      }
      .toDF("vec_id", "scale_raw", "err_raw")
      .select(col("vec_id"), round(col("scale_raw"), 9).as("qscale"),
        round(col("err_raw"), 6).as("cos_err"))
  }

  /** Prefix length for the q83 truncation audit (matryoshka-style:
    * keep the first half of the dims, drop the rest — a 2× storage
    * and bandwidth cut if retrieval survives it).
    */
  val KeepDims = 32

  /** q83 — dimension-truncation (matryoshka) audit: what does dropping
    * the tail [[Dims]]−[[KeepDims]] dimensions cost? Per vector:
    * `norm_frac` (the fraction of the L2 norm the kept prefix holds —
    * the self-cosine of truncation), the cosine to the reference query
    * vector at full and truncated width, and the absolute similarity
    * shift `cos_delta`. Together with q80 (int8) this is the storage
    * menu for a deployment-scale embedding store: 4× from int8, 2×
    * from truncation, and the measured retrieval cost of each.
    *
    * One narrow typed pass over the embeddings scan — the reference
    * vector is a one-row driver lookup broadcast into the closure (the
    * IVF-centroid discipline), so the plan has zero exchanges. All
    * sums accumulate left-to-right in double from a 0.0 seed (the q37
    * parity fold), rounded once at 6 dp.
    */
  def q83(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv: Array[Float] = t(s, dir, "embeddings")
      .filter(col("vec_id") === QueryVecId)
      .select(col("embedding")).as[Array[Float]].head()
    def dot(a: Array[Float], b: Array[Float], n: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    // the query's self-dots are row-invariant: fold them once here
    // (identical 0.0-seeded index-order fold, so values are bit-equal
    // to the oracle's) instead of twice per scanned vector
    val ww = dot(qv, qv, Dims)
    val wwK = dot(qv, qv, KeepDims)
    val bc = s.sparkContext.broadcast(qv)
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        val q = bc.value
        val vv = dot(emb, emb, Dims)
        val vvK = dot(emb, emb, KeepDims)
        val cosFull =
          if (vv == 0.0 || ww == 0.0) None
          else Some(dot(emb, q, Dims) / (math.sqrt(vv) * math.sqrt(ww)))
        val cosTrunc =
          if (vvK == 0.0 || wwK == 0.0) None
          else Some(dot(emb, q, KeepDims) / (math.sqrt(vvK) * math.sqrt(wwK)))
        val normFrac =
          if (vv == 0.0) None else Some(math.sqrt(vvK) / math.sqrt(vv))
        val delta = for { f <- cosFull; t <- cosTrunc } yield math.abs(f - t)
        (id, normFrac, cosFull, cosTrunc, delta)
      }
      .toDF("vec_id", "nf_raw", "cf_raw", "ct_raw", "cd_raw")
      .select(col("vec_id"), round(col("nf_raw"), 6).as("norm_frac"),
        round(col("cf_raw"), 6).as("cos_full"),
        round(col("ct_raw"), 6).as("cos_trunc"),
        round(col("cd_raw"), 6).as("cos_delta"))
  }

  /** q89 — int8-quantized RETRIEVAL parity: q80 measures the per-vector
    * cosine error of max-abs int8 quantization; this measures what the
    * trade does to the thing a store actually serves — the top-k. The
    * stored side is dequantized int8 (q80's exact scheme), the query
    * stays float (the usual deployment asymmetry); output is the
    * top-[[TopK]] by quantized cosine with both cosines and a flag for
    * membership in the float top-[[TopK]] — overlap 10/10 means the 4×
    * storage cut is retrieval-free on this corpus.
    *
    * One narrow typed pass (query vector in the closure) + one
    * TakeOrderedAndProject; the float top-k ids are a 10-row driver
    * list folded back as a literal predicate. All folds 0.0-seeded
    * left-to-right, quantization BigDecimal HALF_UP — both replayed
    * verbatim by the oracle.
    */
  def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv: Array[Float] = t(s, dir, "embeddings")
      .filter(col("vec_id") === QueryVecId)
      .select(col("embedding")).as[Array[Float]].head()
    // the query norm is row-invariant — fold it once (same 0.0-seeded
    // index-order fold the oracle uses), not once per scanned vector
    val qNormSq = {
      var acc = 0.0; var i = 0
      while (i < qv.length) { acc += qv(i).toDouble * qv(i).toDouble; i += 1 }
      acc
    }
    val bc = s.sparkContext.broadcast(qv)
    val cosines = t(s, dir, "embeddings")
      .filter(col("vec_id") =!= QueryVecId)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        val q = bc.value
        var maxAbs = 0.0
        emb.foreach(x => maxAbs = math.max(maxAbs, math.abs(x.toDouble)))
        val scale = maxAbs / 127.0
        val dq = emb.map { x =>
          if (maxAbs == 0.0) 0.0
          else new java.math.BigDecimal(x.toDouble / scale)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() * scale
        }
        def cos(a: Int => Double): Double = {
          var dot = 0.0; var na = 0.0; var i = 0
          while (i < q.length) {
            dot += a(i) * q(i).toDouble
            na += a(i) * a(i)
            i += 1
          }
          dot / (math.sqrt(na) * math.sqrt(qNormSq))
        }
        (id, maxAbs, cos(dq(_)), cos(emb(_).toDouble))
      }
      .toDF("vec_id", "maxabs", "cq", "cf")
      .filter(col("maxabs") > 0.0)
      .materialize() // two consumers: float top-k ids, quant top-k
    val floatTop = cosines.orderBy(col("cf").desc, col("vec_id").asc)
      .limit(TopK).select(col("vec_id")).as[Long].collect()
    cosines.orderBy(col("cq").desc, col("vec_id").asc).limit(TopK)
      .select(col("vec_id"), round(col("cq"), 6).as("cos_q"),
        round(col("cf"), 6).as("cos_f"),
        col("vec_id").isin(floatTop.toIndexedSeq: _*).as("in_float_topk"))
  }

  /** Query batch + negatives-per-query of the q99 miner. */
  val HardNegQueryIds: Seq[Long] = Seq(0L, 1L, 2L)
  val HardNegK = 5

  /** q99 — hard-negative mining for contrastive/retrieval training:
    * for each query vector in the batch, the [[HardNegK]] most-similar
    * vectors carrying a DIFFERENT label (same-label neighbors are
    * positives; the high-similarity other-label ones are the negatives
    * a contrastive loss learns most from).
    *
    * Scale shape: the query batch broadcasts (rows × dims, bounded by
    * the batch — never the corpus), the corpus is scanned ONCE against
    * all queries, and the per-query cut rides the
    * [[graft.operators.TopKPerGroup]] bounded typed aggregator: the
    * exchange carries ≤ k·partitions rows per query, nothing window-
    * sorts |corpus|·|batch| rows (the row_number plan the oracle runs —
    * fine for DuckDB at sf0.1, a scale-killer at 10⁹×batch). Ordering
    * is raw cosine desc with vec_id tiebreak — the q37 determinism
    * contract.
    */
  def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id").isin(HardNegQueryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val agg = graft.operators.TopKPerGroup.topK[(Double, Long)](
      HardNegK, Ordering.by { case (c, id) => (-c, id) })
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") =!= col("qlabel"))
      .withColumn("cos",
        VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .select(col("query_id"), col("cos"), col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((c, id), i) =>
          (qid, id, c, (i + 1).toLong)
        }
      }
      .toDF("query_id", "neg_id", "cos_raw", "rank")
      .select(col("query_id"), col("neg_id"),
        round(col("cos_raw"), 6).as("cos_sim"), col("rank"))
  }

  // ---- Product quantization (q122) ----

  /** PQ geometry: [[PqM]] subspaces × [[PqSub]] dims, [[PqKs]]
    * codewords per subspace, trained by [[PqIters]] Lloyd iterations
    * over the same deterministic md5 hash-sample the IVF quantizer
    * uses. A vector compresses to [[PqM]] small codes — at these
    * settings 4 × 4 bits, vs 64 × 4-byte floats: a 128× memory cut
    * for the scan phase, the property that lets a 100 TB embedding
    * corpus be ADC-scanned from RAM.
    */
  val PqM = 4
  val PqKs = 16
  val PqSub: Int = Dims / PqM
  val PqIters = 2

  /** ADC candidates reranked with exact cosine. */
  val PqRerank: Int = 2 * TopK

  /** Sequential squared-L2 between a float subvector (offset `lo`) and
    * a double codeword — 0.0-seeded left-to-right fold, bit-equal to
    * the oracle's `list_reduce` replay.
    */
  private def l2Sub(a: Array[Float], lo: Int, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) {
      val d = a(lo + i).toDouble - c(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Sequential dot of a float subvector against a double codeword. */
  private def dotSub(a: Array[Float], lo: Int, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += a(lo + i).toDouble * c(i); i += 1 }
    s
  }

  /** Nearest codeword by squared L2 — strict `<` keeps the smaller cid
    * on ties, mirroring the oracle's `ORDER BY dist ASC, cid ASC`.
    */
  private[graft] def pqAssign(cs: Array[(Int, Array[Double])],
                       a: Array[Float], lo: Int): Int = {
    var best = cs(0)._1; var bestD = l2Sub(a, lo, cs(0)._2)
    var i = 1
    while (i < cs.length) {
      val d = l2Sub(a, lo, cs(i)._2)
      if (d < bestD) { bestD = d; best = cs(i)._1 }
      i += 1
    }
    best
  }

  /** Per-subspace PQ codebooks, learned exactly like
    * [[quantizerCentroids]] (seeded by the smallest-(md5, vec_id)
    * sample vectors, [[PqIters]] Lloyd rounds, means rounded to 6
    * decimals per iteration) but on L2 over each [[PqSub]]-dim slice —
    * the standard PQ training objective. Deterministic, so the DuckDB
    * oracle replays all [[PqM]] trainings in lock-step SQL. Each
    * iteration touches the SAMPLE only; the driver artifact is
    * M × Ks × PqSub doubles (~8 KiB) — a bounded model, never data.
    */
  private[graft] def pqCodebooks(
      s: SparkSession, dir: String): Array[Array[(Int, Array[Double])]] =
    // memoized per dataset fingerprint (the ivfIndex discipline): the
    // books are a per-dataset model with many consumers (the q122
    // gate, every RecallSpec query of the sweep) and one derivation
    QueryMemo.getAny(s, "ann-pq-books:" + dir + ":" +
      graft.sources.DatasetFingerprint.ofTable(s, dir, "embeddings")) {
      pqCodebooksCold(s, dir)
    }

  private def pqCodebooksCold(
      s: SparkSession, dir: String): Array[Array[(Int, Array[Double])]] = {
    import s.implicits._
    val samp = t(s, dir, "embeddings")
      .withColumn("h", md5(col("vec_id").cast("string")))
      .filter(substring(col("h"), 1, 1).isin(SampleHexDigits: _*))
      .select(col("h"), col("vec_id"), col("embedding"))
      .materialize()
    val seeds = samp.orderBy(col("h"), col("vec_id"))
      .select(col("embedding")).as[Array[Float]].take(PqKs)
    require(seeds.length == PqKs,
      s"sample too small for $PqKs PQ seeds: ${seeds.length}")
    val sampVecs = samp.select(col("embedding")).as[Array[Float]]
    (0 until PqM).toArray.map { m =>
      val lo = m * PqSub
      var cents: Array[(Int, Array[Double])] = seeds.zipWithIndex
        .map { case (e, i) =>
          (i, e.slice(lo, lo + PqSub).map(f => round6(f.toDouble)))
        }
      var it = 0
      while (it < PqIters) {
        val bc = s.sparkContext.broadcast(cents)
        val means = sampVecs
          .map(e => (pqAssign(bc.value, e, lo), e.slice(lo, lo + PqSub)))
          .toDF("cid", "sub")
          .select(col("cid"), posexplode(col("sub")).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(round(avg(col("v").cast("double")), 6).as("m"))
          .groupBy("cid")
          .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
          .select(col("cid"), transform(col("ps"), p => p("m")).as("c"))
          .as[(Int, Seq[Double])].collect().toMap
        cents = cents.map { case (cid, old) =>
          (cid, means.get(cid).map(_.toArray).getOrElse(old))
        }
        it += 1
      }
      cents
    }
  }

  /** PQ-ADC search for ANY query id: encode the corpus to PQ codes,
    * score by asymmetric distance computation (the query builds one
    * M × Ks lookup table of subspace dots; a vector's approximate dot
    * is M table lookups + M−1 adds — no float vector is touched in
    * the scan), keep the [[PqRerank]] best ADC candidates, rerank
    * them with exact cosine.
    */
  private[graft] def pqTopKDf(s: SparkSession, dir: String,
                              qid: Long): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val books = pqCodebooks(s, dir)
    val qvec = t(s, dir, "embeddings").filter(col("vec_id") === qid)
      .select(col("embedding")).as[Array[Float]].head()
    val lut: Array[Array[Double]] = Array.tabulate(PqM) { m =>
      books(m).sortBy(_._1).map { case (_, c) => dotSub(qvec, m * PqSub, c) }
    }
    val bcBooks = s.sparkContext.broadcast(books)
    val bcLut = s.sparkContext.broadcast(lut)
    val adc = t(s, dir, "embeddings")
      .filter(col("vec_id") =!= qid)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        var sAdc = 0.0
        var m = 0
        while (m < PqM) {
          sAdc += bcLut.value(m)(pqAssign(bcBooks.value(m), emb, m * PqSub))
          m += 1
        }
        (id, sAdc)
      }
      .toDF("vec_id", "adc")
    val cand = adc.orderBy(col("adc").desc, col("vec_id").asc).limit(PqRerank)
    val qdf = t(s, dir, "embeddings").filter(col("vec_id") === qid)
      .select(col("embedding").as("qv"))
    cand
      .join(t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .crossJoin(broadcast(qdf))
      .withColumn("cos",
        graft.expressions.VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("cos").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id"), round(col("adc"), 6).as("adc_sim"),
        round(col("cos"), 6).as("cos_sim"), col("rank"))
  }

  /** q122 — product-quantization ANN (ADC + exact rerank) for the
    * vec_id-0 query: the third index family beside sign-LSH (q38/q66 —
    * scan reduction by bucketing) and IVF (q56 — scan reduction by
    * coarse partitioning). PQ attacks a different axis: PER-VECTOR
    * SCAN COST — codes are M small integers, the scan does table
    * lookups instead of 64-dim float math, and the full-precision
    * vectors are only read for the [[PqRerank]] finalists. At 100 TB
    * the production layout composes the two (IVF-PQ: coarse lists
    * prune WHICH vectors, PQ codes cheapen HOW each is scored);
    * RecallSpec measures this build's recall against the exact top-k.
    *
    * Fully deterministic (seeded training, strict-< assignment,
    * sequential folds, round6 discipline), so the whole pipeline —
    * training included — replays as lock-step SQL and hash-gates.
    */
  def q122(s: SparkSession, dir: String): DataFrame =
    pqTopKDf(s, dir, QueryVecId)

  /** Probe width for the IVF-PQ search — wider than q56's [[NProbe]]
    * because ADC makes each probed vector ~free to score: the
    * composition spends its budget on COVERAGE (more lists) instead of
    * per-vector float math.
    */
  val IvfPqNProbe = 4

  /** IVF-PQ search: the production ANN layout — the materialized IVF
    * index prunes WHICH vectors are touched (partition-pruned scan of
    * the probed lists), PQ codes cheapen HOW each is scored (M table
    * lookups), and only the [[PqRerank]] finalists are re-scored in
    * full precision.
    *
    * Tuning caveat RecallSpec measures: recall is NOT monotone in
    * `nprobe` under a fixed rerank budget — a newly-probed list can
    * contribute a high-ADC false positive that displaces a true
    * neighbor from the [[PqRerank]]-sized rerank set (plain IVF is
    * monotone because its candidates are ranked by true cosine).
    * Widening `nprobe` should be paired with widening the rerank cut.
    */
  private[graft] def ivfPqTopKDf(s: SparkSession, dir: String, qid: Long,
                                 nprobe: Int = IvfPqNProbe): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ix = ivfIndex(s, dir)
    val books = pqCodebooks(s, dir)
    val qEmb = t(s, dir, "embeddings").filter(col("vec_id") === qid)
      .select(col("embedding")).as[Array[Float]].head()
    val probeLists = ix.cents
      .map { case (l, c) => (l, cosD(qEmb, c)) }
      .sortBy { case (l, c) => (-c, l) }
      .take(nprobe).map(_._1).toSeq
    val lut: Array[Array[Double]] = Array.tabulate(PqM) { m =>
      books(m).sortBy(_._1).map { case (_, c) => dotSub(qEmb, m * PqSub, c) }
    }
    val bcBooks = s.sparkContext.broadcast(books)
    val bcLut = s.sparkContext.broadcast(lut)
    val adc = s.read.parquet(ix.listsPath)
      .filter(col("list_id").isin(probeLists: _*) && col("vec_id") =!= qid)
      .select(col("vec_id"), col("list_id").cast("int"), col("embedding"))
      .as[(Long, Int, Array[Float])]
      .map { case (id, lid, emb) =>
        var sAdc = 0.0
        var m = 0
        while (m < PqM) {
          sAdc += bcLut.value(m)(pqAssign(bcBooks.value(m), emb, m * PqSub))
          m += 1
        }
        (id, lid, sAdc)
      }
      .toDF("vec_id", "list_id", "adc")
    val cand = adc.orderBy(col("adc").desc, col("vec_id").asc).limit(PqRerank)
    val qdf = t(s, dir, "embeddings").filter(col("vec_id") === qid)
      .select(col("embedding").as("qv"))
    cand
      .join(t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        Seq("vec_id"))
      .crossJoin(broadcast(qdf))
      .withColumn("cos",
        graft.expressions.VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("cos").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id"), col("list_id"), round(col("adc"), 6).as("adc_sim"),
        round(col("cos"), 6).as("cos_sim"), col("rank"))
  }

  /** q123 — IVF-PQ ANN for the vec_id-0 query: the composition the
    * q122 scaladoc promises — coarse lists bound the SCAN SET
    * (partition-pruned read of [[IvfPqNProbe]] of [[KLists]] lists),
    * PQ codes bound the PER-VECTOR COST, exact rerank bounds the
    * error of both. At 1B vectors this is the memory/latency shape
    * every production vector store (FAISS IVFPQ et al.) converges on;
    * here the whole thing — both trainings included — is
    * deterministic and hash-gates against one lock-step SQL replay.
    */
  def q123(s: SparkSession, dir: String): DataFrame =
    ivfPqTopKDf(s, dir, QueryVecId)

  /** q129 — CLUSTER-balanced resampling: the q59/q73 mixture rebalance
    * applied to SEMANTIC clusters instead of metadata columns — keep
    * rates per learned IVF list (`min(1, target/n_list)`, uniform
    * target, md5 coin), so over-represented embedding regions
    * down-sample toward topic balance. Source/language mixtures can't
    * see that half of "web" is the same boilerplate topic; the
    * geometry the corpus itself taught the quantizer can — this is
    * the cluster-balanced sampling step of semantic-diversity corpus
    * curation, reusing the MATERIALIZED [[ivfIndex]] a third time
    * (ANN probes, q74's dedup sweep, and now the mixture).
    *
    * Scale shape: the rate table is a ≤ K-row aggregate broadcast
    * back onto the assignment; the corpus is touched in one narrow
    * filter pass over the already-partitioned index layout (the q59
    * plan over list_id instead of lang).
    */
  def q129(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ix = ivfIndex(s, dir)
    val asg = s.read.parquet(ix.listsPath)
      .select(col("vec_id"), col("list_id").cast("int").as("list_id"))
    val counts = asg.groupBy("list_id").agg(count(lit(1)).as("n_vecs"))
    val win = Window.partitionBy()
    val rates = counts
      .withColumn("target",
        sum(col("n_vecs")).over(win).cast("double") /
          count(lit(1)).over(win).cast("double"))
      .withColumn("keep_bps",
        round(least(lit(1.0), col("target") / col("n_vecs").cast("double"))
          * CorpusQueries.MixBps, 0).cast("long"))
      .select(col("list_id"), col("n_vecs"), col("keep_bps"))
    val kept = asg
      .join(broadcast(rates.select(col("list_id"), col("keep_bps"))), "list_id")
      .filter(graft.functions.DedupFunctions.md5Hash32(
        concat(lit("cbal-"), col("vec_id").cast("string")))
        % CorpusQueries.MixBps < col("keep_bps"))
      .groupBy("list_id").agg(count(lit(1)).as("kept_vecs"))
    rates.join(kept, Seq("list_id"), "left")
      .select(col("list_id"), col("n_vecs"), col("keep_bps"),
        coalesce(col("kept_vecs"), lit(0L)).as("kept_vecs"))
  }

  /** q150 — EMBEDDING NORM AUDIT per label: count, mean, min and max
    * L2 norm in 10⁻⁶ fixed point — the vector-health monitor an ANN
    * deployment runs on every embedding refresh (norm collapse or
    * explosion in one label silently wrecks cosine rankings and IVF
    * assignment long before recall metrics notice; the audit catches
    * the drift at ingest). Per-vector norms are one deterministic
    * sqrt each (the q61/q94 carried 1-ulp class), QUANTIZED to 10⁻⁶
    * BEFORE aggregation so the sums are order-free longs — the q140
    * quantize-then-sum discipline that lets float-derived statistics
    * hash-gate.
    *
    * Scale shape: one projection (codegen'd unrolled dot) + one
    * partial-agg shuffle on label. Nothing pairwise, nothing
    * collected.
    */
  def q150(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"),
        round(VectorFunctions.normUnrolled(col("embedding"), Dims) * 1000000,
          0).cast("long").as("norm_1e6"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(norm_1e6) div count(1)").as("mean_norm_1e6"),
        min(col("norm_1e6")).as("min_norm_1e6"),
        max(col("norm_1e6")).as("max_norm_1e6"))

  /** q190's geometry: coordinate quantization (10⁻⁶), fixed
    * power-iteration rounds, and the per-round vector rescale
    * (normalize the max-|component| to 2²⁰ — the PageRank integer
    * discipline, so no float ever enters the iteration).
    */
  val EigQuant = 1000000L
  val EigIters = 4
  val EigScale = 1L << 20

  /** q190 — DOMINANT EMBEDDING DIRECTION (top eigenvector of the
    * centered second-moment matrix) by INTEGER power iteration: the
    * anisotropy audit behind embedding health — a collapsed or
    * mean-dominated embedding space puts most variance on one axis
    * (q150 checks norms; this checks SHAPE), and the dominant
    * direction + its Rayleigh-quotient eigenvalue quantify it.
    * Everything is exact integers: coordinates quantize to 10⁻⁶,
    * the 64×64 covariance accumulates exact integer products, each
    * of the [[EigIters]] matrix-vector rounds rescales by integer
    * division of the max |component| to [[EigScale]] (the q104
    * PageRank fixed-point discipline — bit-identical across engines,
    * where float iteration would drift in summation order), and the
    * eigenvalue is one DECIMAL(38,0) division at the end. The
    * all-ones start vector makes the sign deterministic.
    *
    * Scale shape: ONE corpus pass — a per-partition RAW outer-product
    * accumulation (the BLAS `syrk` pattern: each task folds its
    * vectors into a local d×d long array and emits ONE upper-triangle
    * of partials plus the coordinate sums and its row count — a
    * genuine `mapPartitions` case, because the d²-per-row
    * explode-and-shuffle form materializes n·d² rows for the same
    * answer and measured 3.7 s vs 0.6 s at sf0.1). Centering happens
    * AFTER the pass by the exact integer identity
    * `Σ(qᵢ−mᵢ)(qⱼ−mⱼ) = Σqᵢqⱼ − mᵢSⱼ − mⱼSᵢ + n·mᵢmⱼ` with
    * `mᵢ = floor(Sᵢ/n)` — bit-identical to the two-pass
    * subtract-then-multiply form it replaced, without the means
    * pre-scan or its driver collect. (Long bounds: every term is
    * ≤ n·quant² ≈ 10¹²·n — the DECIMAL(38,0) upgrade is one cast
    * away past n ~ 10⁶, the q157 lesson.) The shuffle carries
    * d²/2 + d + 1 rows per task; the iteration runs on the 4096-row
    * matrix against a 64-row vector — driver-free and independent of
    * corpus size.
    */
  def q190(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val quant = EigQuant
    val parts = t(s, dir, "embeddings")
      .select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        var acc: Array[Long] = null
        var ss: Array[Long] = null
        var n = 0L
        var d = 0
        it.foreach { emb =>
          if (acc == null) {
            d = emb.length; acc = new Array[Long](d * d)
            ss = new Array[Long](d)
          }
          val c = new Array[Long](d)
          var i = 0
          while (i < d) {
            // half-AWAY-from-zero, matching SQL round() on both
            // engines (math.round would round -x.5 toward zero)
            val v = emb(i).toDouble * quant
            val r = if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
            c(i) = r.toLong
            ss(i) += c(i)
            i += 1
          }
          n += 1
          i = 0
          while (i < d) {
            var j = i
            while (j < d) { acc(i * d + j) += c(i) * c(j); j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          val dd = d
          (0 until dd).iterator.flatMap(i =>
            (i until dd).iterator.map(j => (i, j, acc(i * dd + j)))) ++
            (0 until dd).iterator.map(i => (i, dd, ss(i))) ++ // sums row
            Iterator((dd, dd, n)) // count cell
        }
      }
      .toDF("i", "j", "v")
      .groupBy("i", "j").agg(sum(col("v")).as("v"))
      .materialize() // (d²+d)/2 + d + 1 rows; three slices below
    val dSent = parts.agg(max(col("j")).as("d")) // the sentinel index
    val nScalar = parts.crossJoin(broadcast(dSent))
      .filter(col("i") === col("d") && col("j") === col("d"))
      .select(col("v").as("n"))
    // per-dimension sum and floor-form mean (exact in double at this
    // magnitude) — `div`/`//` disagree on negative quotients
    val meansDf = parts.crossJoin(broadcast(dSent))
      .filter(col("j") === col("d") && col("i") =!= col("d"))
      .crossJoin(broadcast(nScalar))
      .select(col("i"), col("v").as("sm"),
        expr("CAST(floor(v / n) AS BIGINT)").as("m"))
    val cov = parts.crossJoin(broadcast(dSent))
      .filter(col("j") =!= col("d"))
      .join(broadcast(meansDf.select(col("i"), col("sm").as("s_i"),
        col("m").as("m_i"))), Seq("i"))
      .join(broadcast(meansDf.select(col("i").as("j"),
        col("sm").as("s_j"), col("m").as("m_j"))), Seq("j"))
      .crossJoin(broadcast(nScalar))
      .select(col("i"), col("j"),
        (col("v") - col("m_i") * col("s_j") - col("m_j") * col("s_i") +
          col("n") * col("m_i") * col("m_j")).as("cv"))
    val covFull = cov.unionAll(cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cv")))
      .materialize() // 4096 rows; EigIters+2 consumers
    var v = covFull.select(col("i")).distinct()
      .select(col("i"), lit(EigScale).as("s"))
    for (_ <- 1 to EigIters) {
      // cv·s brushes 10²² — accumulate the matvec in DECIMAL(38,0).
      // Each round's matvec is consumed TWICE (the scalar max and the
      // rescale) yet deliberately NOT materialized, unlike the Hits
      // half-steps: here the whole fixed-k loop stays inside ONE
      // action, where ReuseExchange dedupes the repeated subtrees — an
      // explicit per-round materialize was A/B'd in a matched window
      // (r15, stash-alternated solo probes: wall 1.814 vs 1.815 s,
      // task unchanged) and rejected as pure-neutral complexity. The
      // Hits rule bites only when normalization crosses ACTIONS.
      val raw = covFull.toDF("i", "j", "cv")
        .join(v.toDF("j", "s"), Seq("j"))
        .groupBy("i")
        .agg(expr(s"sum(CAST(cv AS $dec) * CAST(s AS $dec))").as("r"))
      val mx = raw.agg(max(abs(col("r"))).as("mx"))
      // sign-split the rescale so every division is NON-NEGATIVE —
      // the one regime where Spark's truncating `div` and DuckDB's
      // flooring `//` agree (r is signed, mx > 0)
      v = raw.crossJoin(broadcast(mx))
        .select(col("i"),
          expr(s"""CAST(CASE WHEN r < 0
                 | THEN -(((-r) * $EigScale) div mx)
                 | ELSE ((r * $EigScale) div mx) END AS BIGINT)"""
            .stripMargin).as("s"))
    }
    val vv = v.materialize() // eigvec; rayleigh numerator + output
    val num = covFull.toDF("i", "j", "cv")
      .join(vv.toDF("i", "si"), Seq("i"))
      .join(vv.toDF("j", "sj"), Seq("j"))
      .agg(expr(s"sum(CAST(cv AS $dec) * CAST(si AS $dec) * " +
        s"CAST(sj AS $dec))").as("n"))
    val den = vv.agg(expr(s"sum(CAST(s AS $dec) * CAST(s AS $dec))")
      .as("d"))
    vv.crossJoin(broadcast(
        num.crossJoin(den).select(expr("CAST(n div d AS BIGINT)")
          .as("eigenvalue_q2"))))
      .select(col("i").cast("long").as("dim"), col("s").as("component_2p20"),
        col("eigenvalue_q2"))
  }

  /** q191's geometry: k seeds (the k smallest vec_ids), fixed Lloyd
    * rounds, 10⁻⁶ coordinate quantization.
    */
  val LloydK = 8
  val LloydIters = 3

  /** q191 — INTEGER LLOYD k-MEANS: [[LloydIters]] exact rounds of the
    * clustering baseline every embedding pipeline runs (coarse IVF
    * lists, semdedup buckets, label discovery), with every step in
    * exact integers so both engines replay it bit-identically:
    * quantized coordinates, squared-distance sums as longs, argmin
    * assignment with a total (dist, cluster) order, and centroid
    * updates by floor-form mean (float division is exact at these
    * magnitudes; `div`/`//` would disagree on negative sums). Seeds
    * are the [[LloydK]] smallest vec_ids — deterministic, and the
    * cluster id IS the seed id. Output: per-cluster population and
    * inertia after the final assignment (the elbow-curve datum).
    *
    * Scale shape: per round, ONE assignment join (coords × k
    * centroid rows, broadcast) collapsing map-side to (vec, cluster)
    * partials, and one centroid partial agg — k·d rows cross the
    * cluster; nothing iterates on the driver but the loop counter.
    * Lloyd degeneracy (an emptied cluster stays empty) is inherited
    * deliberately — the standard fix is re-seeding, a POLICY, not an
    * operator concern.
    */
  def q191(s: SparkSession, dir: String): DataFrame =
    lloydFit(s, dir)._2
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("best.cluster").as("cluster"), col("best.d2").as("d2"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2")).as("inertia"))

  /** The fitted Lloyd model after [[LloydIters]] rounds: the final
    * centroids and the full (vec, cluster, d²) distance table —
    * shared by q191 (argmin rollup), q192 (silhouette needs the
    * runner-up distances too) and q193 (external validation).
    * MEMOIZED per dataset fingerprint (the dedup-signature pattern):
    * the three consumers ride ONE fit instead of re-running
    * [[LloydIters]] broadcast-join rounds each — fit once, report
    * three ways, the DAG shape a real pipeline wants.
    */
  private def lloydFit(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    QueryMemo.getAny(s, "lloyd-fit:" + dir + ":" +
        graft.sources.DatasetFingerprint.ofTable(s, dir, "embeddings")) {
      lloydFitCold(s, dir)
    }

  private def lloydFitCold(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val coords = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr(s"CAST(round(CAST(x AS DOUBLE) * $EigQuant) AS BIGINT)")
          .as("q"))
      .materialize() // every round joins it
    // true smallest-k selection, not `vec_id < LloydK`: the old filter
    // silently under-seeded (or empty-seeded) a 1-based or sparse id
    // space; an orderBy().limit(k) is TakeOrdered — k rows, broadcast
    val seeds = t(s, dir, "embeddings")
      .select(col("vec_id")).orderBy(col("vec_id")).limit(LloydK)
    var cent = coords.join(broadcast(seeds), Seq("vec_id"))
      .select(col("vec_id").as("cluster"), col("i"), col("q").as("c"))
    def dists(c: DataFrame): DataFrame =
      coords.join(broadcast(c), Seq("i"))
        .groupBy("vec_id", "cluster")
        .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
    for (_ <- 1 to LloydIters) {
      val a = dists(cent)
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cluster"))).as("best"))
        .select(col("vec_id"), col("best.cluster").as("cluster"))
      cent = coords.join(a, Seq("vec_id"))
        .groupBy("cluster", "i")
        .agg(expr("CAST(floor(sum(q) / count(1)) AS BIGINT)").as("c"))
        .materialize() // k·d rows; next round + final distances
    }
    (cent, dists(cent).materialize())
  }

  /** q192 — CLUSTER SILHOUETTE (centroid form, squared distances):
    * for every vector, `s = (b − a) / max(a, b)` with a = d² to its
    * own centroid and b = the best rival centroid — the clustering-
    * quality card that says whether q191's k is EARNING its clusters
    * (s → 1: well-separated; s → 0: boundary mush; the full pairwise
    * silhouette is O(n²), the centroid form is the standard
    * at-scale proxy and needs only the distance table the fit
    * already computed). Squared distances keep it integer-exact
    * (monotone in the true distances, so the diagnosis ordering is
    * identical); a ≤ b by construction of the argmin, so the 10⁻⁶
    * ratio is a non-negative integer division.
    *
    * Scale shape: rides [[lloydFit]]'s checkpointed distance table —
    * two small per-vector rollups and a per-cluster card; nothing
    * new touches the corpus.
    */
  def q192(s: SparkSession, dir: String): DataFrame = {
    val d = lloydFit(s, dir)._2
    val per = d.groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        col("best.d2").as("a"))
    per.join(d.toDF("vec_id", "rival", "d2r"), Seq("vec_id"))
      .filter(col("rival") =!= col("cluster"))
      .groupBy("vec_id", "cluster", "a")
      .agg(min(col("d2r")).as("b"))
      .select(col("vec_id"), col("cluster"), col("a"), col("b"),
        when(greatest(col("a"), col("b")) === 0L, 0L)
          .otherwise(expr("((b - a) * 1000000) div greatest(a, b)"))
          .as("s"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(s) div count(1)").as("avg_sil_1e6"),
        min(col("s")).as("min_sil_1e6"))
  }

  /** q193 — EXTERNAL CLUSTER VALIDATION: q191's clusters against the
    * ground-truth `label` column — purity (the max-label share per
    * cluster) and the ADJUSTED RAND INDEX, the chance-corrected
    * pair-agreement score that purity alone can fake with many tiny
    * clusters. ARI's rational arithmetic is cleared of divisions by
    * multiplying through: `ARI = 2(C·Σᵢⱼ − Σₐ·Σᵦ) /
    * (C·(Σₐ+Σᵦ) − 2·Σₐ·Σᵦ)` with C = C(n,2) and the Σs exact
    * integer pair counts — only the final 10⁻⁶ ratio divides, in
    * double over exact ≤2⁵³ integers with half-away rounding (the
    * q183 signed-portability rule: ARI is signed, integer `div`
    * would diverge between engines below zero). q192 asks "are the
    * clusters separated"; this asks "are they the RIGHT ones".
    *
    * Scale shape: the contingency table is one partial-agg pass over
    * the fit's assignment joined to labels; every Σ derives from
    * that ≤ k·|labels| table.
    */
  def q193(s: SparkSession, dir: String): DataFrame = {
    val assign = lloydFit(s, dir)._2
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"))
    val cont = assign
      .join(t(s, dir, "embeddings").select(col("vec_id"), col("label")),
        Seq("vec_id"))
      .groupBy("cluster", "label").agg(count(lit(1)).as("nij"))
      .materialize() // k·|labels| rows; four rollups below
    def c2(e: String): String = s"sum($e * ($e - 1) div 2)"
    val byC = cont.groupBy("cluster")
      .agg(sum(col("nij")).as("a"), max(col("nij")).as("mx"))
    val byL = cont.groupBy("label").agg(sum(col("nij")).as("b"))
    val parts = cont.agg(sum(col("nij")).as("n"),
        expr("sum(nij * (nij - 1) div 2)").as("sumij"))
      .crossJoin(broadcast(byC.agg(expr(s"${c2("a")}").as("suma"),
        sum(col("mx")).as("maxhits"), count(lit(1)).as("k_used"))))
      .crossJoin(broadcast(byL.agg(expr(s"${c2("b")}").as("sumb"))))
    parts.select(col("n"), col("k_used"),
      expr("(maxhits * 1000000) div n").as("purity_1e6"),
      expr("""CASE WHEN (n * (n - 1) div 2) * (suma + sumb)
             |  - 2 * suma * sumb = 0 THEN NULL
             | ELSE CAST(round(
             |  CAST(2 * ((n * (n - 1) div 2) * sumij - suma * sumb)
             |    AS DOUBLE) * 1000000 /
             |  ((n * (n - 1) div 2) * (suma + sumb) - 2 * suma * sumb),
             |  0) AS BIGINT) END""".stripMargin).as("ari_1e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_cluster_validation" -> (q193 _),
    "q192_silhouette" -> (q192 _),
    "q191_kmeans" -> (q191 _),
    "q190_dominant_direction" -> (q190 _),
    "q150_embedding_norms" -> (q150 _),
    "q37_ann_bruteforce" -> (q37 _),
    "q122_pq_adc" -> (q122 _),
    "q123_ivf_pq" -> (q123 _),
    "q129_cluster_balance" -> (q129 _),
    "q38_ann_lsh" -> (q38 _),
    "q54_label_centroids" -> (q54 _),
    "q56_ann_ivf" -> (q56 _),
    "q66_ann_multiprobe" -> (q66 _),
    "q74_semdedup_ivf" -> (q74 _),
    "q80_int8_quant_audit" -> (q80 _),
    "q83_matryoshka_audit" -> (q83 _),
    "q89_int8_retrieval" -> (q89 _),
    "q99_hard_negatives" -> (q99 _))

  // ---- oracle SQL ----

  /** The literal hyperplanes, identical to the Spark plan's. Doubles are
    * rendered with Scala's shortest-round-trip formatting, which DuckDB
    * parses back to the same bit pattern.
    */
  private def planeSql(planeId: Int): String =
    VectorFunctions.planeWeights(planeId, Dims)
      .map(w => s"CAST($w AS DOUBLE)").mkString("[", ", ", "]")

  private def dotLiteralSql(vec: String, planeId: Int): String =
    s"""list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |    list_transform(range(1, ${Dims + 1}),
       |      i -> CAST($vec[i] AS DOUBLE) * (${planeSql(planeId)})[i])),
       |    (x, y) -> x + y)""".stripMargin

  private def bucketSql(vec: String): String =
    (0 until NBits).map { b =>
      s"CASE WHEN ${dotLiteralSql(vec, b)} >= 0.0 THEN ${1L << b} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Sequential squared-L2 between subspace `m`'s slice of `vec` and a
    * PqSub-length centroid list — the SQL twin of [[l2Sub]].
    */
  private def l2SliceSql(vec: String, cent: String, m: Int): String = {
    val lo = m * PqSub
    s"""list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |    list_transform(range(1, ${PqSub + 1}),
       |      i -> (CAST($vec[i + $lo] AS DOUBLE) - $cent[i])
       |        * (CAST($vec[i + $lo] AS DOUBLE) - $cent[i]))),
       |    (x, y) -> x + y)""".stripMargin
  }

  /** Sequential subspace dot — the SQL twin of [[dotSub]]. */
  private def dotSliceSql(vec: String, cent: String, m: Int): String = {
    val lo = m * PqSub
    s"""list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |    list_transform(range(1, ${PqSub + 1}),
       |      i -> CAST($vec[i + $lo] AS DOUBLE) * $cent[i])),
       |    (x, y) -> x + y)""".stripMargin
  }

  /** One PQ Lloyd iteration for subspace `m` — [[kmeansIterSql]]'s
    * shape on L2 over the slice.
    */
  private def pqIterSql(m: Int, k: Int): String = {
    val lo = m * PqSub
    val prev = s"pc${k - 1}_$m"
    val next = s"pc${k}_$m"
    s"""pa${k}_$m AS (
       | SELECT s.vec_id, s.embedding, c.cid,
       |  row_number() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${l2SliceSql("s.embedding", "c.centroid", m)} ASC,
       |      c.cid ASC) AS rn
       | FROM samp s CROSS JOIN $prev c),
       |pm${k}_$m AS (
       | SELECT a.cid, p.pos,
       |  round(avg(CAST(a.embedding[p.pos + $lo] AS DOUBLE)), 6) AS mn
       | FROM pa${k}_$m a, (SELECT unnest(range(1, ${PqSub + 1})) AS pos) p
       | WHERE a.rn = 1 GROUP BY a.cid, p.pos),
       |$next AS (
       | SELECT c.cid, coalesce(l.centroid, c.centroid) AS centroid
       | FROM $prev c LEFT JOIN
       |  (SELECT cid, list(mn ORDER BY pos) AS centroid
       |   FROM pm${k}_$m GROUP BY cid) l
       |  ON c.cid = l.cid)""".stripMargin
  }

  /** The PQ training + encode + LUT CTE chain (assumes a `samp` CTE is
    * already in scope — the same hash-sample the IVF chain defines):
    * `pseeds` → per-subspace `pc*_m` trainings → `code_m` (corpus
    * codes) and `lut_m` (query subspace dots). Shared by the q122 and
    * q123 oracles.
    */
  private def pqCtesSql: String = {
    val fin = (m: Int) => s"pc${PqIters}_$m"
    val perSub = (0 until PqM).map { m =>
      val lo = m * PqSub
      val c0 =
        s"""pc0_$m AS (
           | SELECT cid, list_transform(range(1, ${PqSub + 1}),
           |   i -> round(CAST(embedding[i + $lo] AS DOUBLE), 6)) AS centroid
           | FROM pseeds)""".stripMargin
      val iters = (1 to PqIters).map(k => pqIterSql(m, k)).mkString(",\n")
      val code =
        s"""code_$m AS (
           | SELECT vec_id, cid FROM (
           |  SELECT e.vec_id, c.cid,
           |   row_number() OVER (PARTITION BY e.vec_id
           |     ORDER BY ${l2SliceSql("e.embedding", "c.centroid", m)} ASC,
           |       c.cid ASC) AS rn
           |  FROM embeddings e CROSS JOIN ${fin(m)} c) t WHERE rn = 1)""".stripMargin
      val lut =
        s"""lut_$m AS (
           | SELECT c.cid, ${dotSliceSql("q.qv", "c.centroid", m)} AS v
           | FROM ${fin(m)} c CROSS JOIN qv q)""".stripMargin
      s"$c0,\n$iters,\n$code,\n$lut"
    }.mkString(",\n")
    s"""pseeds AS (
       | SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, embedding
       | FROM (SELECT h, vec_id, embedding FROM samp
       |       ORDER BY h, vec_id LIMIT $PqKs) t),
       |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
       |$perSub""".stripMargin
  }

  private def adcSumSql: String = (0 until PqM).map(m => s"l$m.v").mkString(" + ")

  private def codeJoinsSql(anchor: String): String =
    s" JOIN code_0 c0 ON c0.vec_id = $anchor JOIN lut_0 l0 ON c0.cid = l0.cid\n" +
      (1 until PqM).map(m =>
        s" JOIN code_$m c$m ON c$m.vec_id = $anchor" +
          s" JOIN lut_$m l$m ON c$m.cid = l$m.cid").mkString("\n")

  /** The q122 oracle: replay all [[PqM]] seeded subspace trainings,
    * encode the corpus, score by the summed LUT dots in the same
    * m-order, rerank the ADC cut with exact cosine.
    */
  private def q122OracleSql: String = {
    val sampleHex = SampleHexDigits.map(d => s"'$d'").mkString(", ")
    s"""WITH samp AS (
       | SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS h
       | FROM embeddings
       | WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ($sampleHex)),
       |$pqCtesSql,
       |adc AS (
       | SELECT c0.vec_id, $adcSumSql AS adc
       | FROM embeddings e0
       |${codeJoinsSql("e0.vec_id")}
       | WHERE c0.vec_id <> $QueryVecId),
       |cand AS (SELECT vec_id, adc,
       |  row_number() OVER (ORDER BY adc DESC, vec_id ASC) AS rn FROM adc),
       |rr AS (
       | SELECT c.vec_id, c.adc,
       |  ${DedupQueries.cosineSql("e.embedding", "q.qv")} AS cs
       | FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
       | CROSS JOIN qv q
       | WHERE c.rn <= $PqRerank),
       |fin AS (SELECT vec_id, adc, cs,
       |  row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank FROM rr)
       |SELECT vec_id, round(adc, 6) AS adc_sim, round(cs, 6) AS cos_sim,
       | CAST(rank AS BIGINT) AS rank
       |FROM fin WHERE rank <= $TopK""".stripMargin
  }

  /** The q123 oracle: the q56 IVF replay (coarse lists) composed with
    * the PQ replay — ADC-score ONLY vectors inside the probed lists,
    * then exact-rerank. `scored`/`asg` come from [[ivfAssignCtesSql]];
    * the PQ chain shares its `samp`.
    */
  private def q123OracleSql: String =
    s"""WITH $ivfAssignCtesSql,
       |$pqCtesSql,
       |probes AS (SELECT cid FROM scored
       |           WHERE vec_id = $QueryVecId AND rn <= $IvfPqNProbe),
       |adc AS (
       | SELECT a.vec_id, a.list_id, $adcSumSql AS adc
       | FROM asg a
       |${codeJoinsSql("a.vec_id")}
       | WHERE a.vec_id <> $QueryVecId
       |   AND a.list_id IN (SELECT cid FROM probes)),
       |cand AS (SELECT vec_id, list_id, adc,
       |  row_number() OVER (ORDER BY adc DESC, vec_id ASC) AS rn FROM adc),
       |rr AS (
       | SELECT c.vec_id, c.list_id, c.adc,
       |  ${DedupQueries.cosineSql("e.embedding", "q.qv")} AS cs
       | FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
       | CROSS JOIN qv q
       | WHERE c.rn <= $PqRerank),
       |fin AS (SELECT vec_id, list_id, adc, cs,
       |  row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank FROM rr)
       |SELECT vec_id, list_id, round(adc, 6) AS adc_sim,
       | round(cs, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
       |FROM fin WHERE rank <= $TopK""".stripMargin

  private def q129OracleSql: String = {
    val bps = CorpusQueries.MixBps
    s"""WITH $ivfAssignCtesSql,
       |cnt AS (SELECT list_id, CAST(count(*) AS BIGINT) AS n_vecs
       |        FROM asg GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t,
       |               CAST(count(*) AS BIGINT) AS k FROM cnt),
       |rates AS (
       | SELECT c.list_id, c.n_vecs,
       |  CAST(round(least(1.0, (CAST(t.t AS DOUBLE) / t.k) / c.n_vecs)
       |    * $bps) AS BIGINT) AS keep_bps
       | FROM cnt c CROSS JOIN tot t),
       |kept AS (
       | SELECT a.list_id, CAST(count(*) AS BIGINT) AS kept_vecs
       | FROM asg a JOIN rates r ON a.list_id = r.list_id
       | WHERE CAST(concat('0x', substr(md5(concat('cbal-',
       |   CAST(a.vec_id AS VARCHAR))), 1, 8)) AS BIGINT) % $bps < r.keep_bps
       | GROUP BY 1)
       |SELECT r.list_id, r.n_vecs, r.keep_bps,
       | coalesce(k.kept_vecs, 0) AS kept_vecs
       |FROM rates r LEFT JOIN kept k USING (list_id)""".stripMargin
  }

  /** q190's oracle: the same integer power iteration, unrolled per
    * round (the q141 HITS discipline).
    */
  private def q190OracleSql: String = {
    def iterSql(k: Int): String =
      s"""r$k AS (
         | SELECT c.i,
         |  CAST(sum(CAST(c.cv AS HUGEINT) * CAST(v${k - 1}.s AS HUGEINT))
         |    AS HUGEINT) AS r
         | FROM cov c JOIN v${k - 1} ON c.j = v${k - 1}.i GROUP BY 1),
         |m$k AS (SELECT max(abs(r)) AS mx FROM r$k),
         |v$k AS (SELECT i, CAST(CASE WHEN r < 0
         |   THEN -(((-r) * $EigScale) // mx)
         |   ELSE ((r * $EigScale) // mx) END AS BIGINT) AS s
         | FROM r$k, m$k)""".stripMargin
    s"""WITH co AS (
       | SELECT vec_id, CAST(i AS BIGINT) AS i,
       |  CAST(round(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
       |    * $EigQuant) AS BIGINT) AS q
       | FROM embeddings
       |  CROSS JOIN unnest(range(0, len(embedding))) AS t(i)),
       |mn AS (SELECT i, CAST(floor(sum(q) / count(*)) AS BIGINT) AS m
       |       FROM co GROUP BY 1),
       |ce AS (SELECT co.vec_id, co.i, co.q - mn.m AS c
       |       FROM co JOIN mn USING (i)),
       |cov AS (SELECT a.i, b.i AS j, CAST(sum(a.c * b.c) AS BIGINT) AS cv
       |        FROM ce a JOIN ce b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT i, CAST($EigScale AS BIGINT) AS s FROM cov),
       |${(1 to EigIters).map(iterSql).mkString(",\n")},
       |num AS (
       | SELECT CAST(sum(CAST(cv AS HUGEINT) * vi.s * vj.s) AS HUGEINT) AS n
       | FROM cov JOIN v$EigIters vi ON cov.i = vi.i
       |          JOIN v$EigIters vj ON cov.j = vj.i),
       |den AS (SELECT CAST(sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
       |   AS HUGEINT) AS d FROM v$EigIters)
       |SELECT v.i AS dim, v.s AS component_2p20,
       | CAST(num.n // den.d AS BIGINT) AS eigenvalue_q2
       |FROM v$EigIters v, num, den""".stripMargin
  }

  /** q191/q192's oracle base: the same integer Lloyd rounds, unrolled,
    * ending in the full distance table `d{iters+1}` and the final
    * assignment `a{iters+1}`.
    */
  private def lloydCteSql: String = {
    def distAssign(k: Int, from: String): String =
      s"""d$k AS (
         | SELECT co.vec_id, c.cluster,
         |  CAST(sum((co.q - c.c) * (co.q - c.c)) AS BIGINT) AS d2
         | FROM co JOIN $from c ON co.i = c.i GROUP BY 1, 2),
         |a$k AS (
         | SELECT vec_id, cluster, d2 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY d2, cluster) AS rn FROM d$k) WHERE rn = 1)"""
        .stripMargin
    def centroid(k: Int): String =
      s"""c$k AS (
         | SELECT a.cluster, co.i,
         |  CAST(floor(sum(co.q) / count(*)) AS BIGINT) AS c
         | FROM co JOIN a$k a ON co.vec_id = a.vec_id GROUP BY 1, 2)"""
        .stripMargin
    val rounds = (1 to LloydIters).map(k =>
      distAssign(k, s"c${k - 1}") + ",\n" + centroid(k)).mkString(",\n")
    s"""WITH co AS (
       | SELECT vec_id, CAST(i AS BIGINT) AS i,
       |  CAST(round(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
       |    * $EigQuant) AS BIGINT) AS q
       | FROM embeddings
       |  CROSS JOIN unnest(range(0, len(embedding))) AS t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, q AS c FROM co
       |       WHERE vec_id IN (SELECT vec_id FROM embeddings
       |                        ORDER BY vec_id LIMIT $LloydK)),
       |$rounds,
       |${distAssign(LloydIters + 1, s"c$LloydIters")}""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q193_cluster_validation" ->
      s"""$lloydCteSql,
        |cont AS (
        | SELECT a.cluster, e.label, CAST(count(*) AS BIGINT) AS nij
        | FROM a${LloydIters + 1} a JOIN embeddings e
        |  ON a.vec_id = e.vec_id GROUP BY 1, 2),
        |byc AS (SELECT cluster, CAST(sum(nij) AS BIGINT) AS a,
        |        CAST(max(nij) AS BIGINT) AS mx FROM cont GROUP BY 1),
        |byl AS (SELECT label, CAST(sum(nij) AS BIGINT) AS b
        |        FROM cont GROUP BY 1),
        |p1 AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |       CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS sumij
        |       FROM cont),
        |p2 AS (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS suma,
        |       CAST(sum(mx) AS BIGINT) AS maxhits,
        |       CAST(count(*) AS BIGINT) AS k_used FROM byc),
        |p3 AS (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS sumb
        |       FROM byl)
        |SELECT n, k_used,
        | CAST((maxhits * 1000000) // n AS BIGINT) AS purity_1e6,
        | CASE WHEN (n * (n - 1) // 2) * (suma + sumb)
        |   - 2 * suma * sumb = 0 THEN NULL
        |  ELSE CAST(round(
        |   CAST(2 * ((n * (n - 1) // 2) * sumij - suma * sumb)
        |     AS DOUBLE) * 1000000 /
        |   ((n * (n - 1) // 2) * (suma + sumb) - 2 * suma * sumb),
        |   0) AS BIGINT) END AS ari_1e6
        |FROM p1, p2, p3""".stripMargin,
    "q191_kmeans" ->
      s"""$lloydCteSql
        |SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
        | CAST(sum(d2) AS BIGINT) AS inertia
        |FROM a${LloydIters + 1} GROUP BY 1""".stripMargin,
    "q192_silhouette" ->
      s"""$lloydCteSql,
        |per AS (SELECT vec_id, cluster, d2 AS a FROM a${LloydIters + 1}),
        |bb AS (
        | SELECT d.vec_id, CAST(min(d.d2) AS BIGINT) AS b
        | FROM d${LloydIters + 1} d JOIN per p
        |  ON d.vec_id = p.vec_id AND d.cluster <> p.cluster
        | GROUP BY 1),
        |sil AS (
        | SELECT p.cluster,
        |  CAST(CASE WHEN greatest(p.a, bb.b) = 0 THEN 0
        |   ELSE ((bb.b - p.a) * 1000000) // greatest(p.a, bb.b) END
        |   AS BIGINT) AS s
        | FROM per p JOIN bb USING (vec_id))
        |SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
        | CAST(sum(s) // count(*) AS BIGINT) AS avg_sil_1e6,
        | CAST(min(s) AS BIGINT) AS min_sil_1e6
        |FROM sil GROUP BY 1""".stripMargin,
    "q190_dominant_direction" -> q190OracleSql,
    "q150_embedding_norms" ->
      s"""WITH n AS (
         | SELECT label,
         |  CAST(round(${DedupQueries.normSql("embedding")} * 1000000)
         |    AS BIGINT) AS norm_1e6
         | FROM embeddings)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         | CAST(sum(norm_1e6) // count(*) AS BIGINT) AS mean_norm_1e6,
         | CAST(min(norm_1e6) AS BIGINT) AS min_norm_1e6,
         | CAST(max(norm_1e6) AS BIGINT) AS max_norm_1e6
         |FROM n GROUP BY label""".stripMargin,
    "q122_pq_adc" -> q122OracleSql,
    "q123_ivf_pq" -> q123OracleSql,
    "q129_cluster_balance" -> q129OracleSql,
    "q37_ann_bruteforce" ->
      s"""SELECT e.vec_id,
         | round(${DedupQueries.cosineSql("e.embedding", "q.qv")}, 6) AS cos_sim
         |FROM embeddings e
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId) q
         |WHERE e.vec_id <> $QueryVecId
         |ORDER BY ${DedupQueries.cosineSql("e.embedding", "q.qv")} DESC, e.vec_id ASC
         |LIMIT $TopK""".stripMargin,
    "q38_ann_lsh" ->
      s"""WITH bucketed AS (
         | SELECT vec_id, embedding, CAST(${bucketSql("embedding")} AS BIGINT) AS bucket
         | FROM embeddings)
         |SELECT e.vec_id, e.bucket,
         | round(${DedupQueries.cosineSql("e.embedding", "q.qv")}, 6) AS cos_sim
         |FROM bucketed e
         |JOIN (SELECT bucket, embedding AS qv FROM bucketed WHERE vec_id = $QueryVecId) q
         |  ON e.bucket = q.bucket
         |WHERE e.vec_id <> $QueryVecId
         |ORDER BY ${DedupQueries.cosineSql("e.embedding", "q.qv")} DESC, e.vec_id ASC
         |LIMIT $TopK""".stripMargin,
    "q54_label_centroids" ->
      s"""WITH ex AS (
         | SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
         | FROM embeddings, (SELECT unnest(range(1, ${Dims + 1})) AS i)),
         |m AS (SELECT label, pos, avg(v) AS m FROM ex GROUP BY label, pos),
         |c AS (SELECT label,
         |       list(CAST(CAST(round(round(m, 6) * 1000000) AS BIGINT) AS VARCHAR)
         |            ORDER BY pos) AS cl
         |      FROM m GROUP BY label),
         |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
         |      FROM embeddings GROUP BY label)
         |SELECT n.label, n.n_vecs, array_to_string(c.cl, ',') AS centroid
         |FROM n JOIN c ON n.label = c.label""".stripMargin,
    "q56_ann_ivf" -> q56OracleSql,
    "q74_semdedup_ivf" -> q74OracleSql,
    "q80_int8_quant_audit" ->
      s"""WITH base AS (
         | SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |  list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE)))) AS maxabs
         | FROM embeddings),
         |d AS (
         | SELECT vec_id, maxabs / 127.0 AS scale, e,
         |  list_transform(e, x -> round(x / (maxabs / 127.0))
         |    * (maxabs / 127.0)) AS dq
         | FROM base WHERE maxabs > 0)
         |SELECT vec_id, round(scale, 9) AS qscale,
         | round(1.0 - ${DedupQueries.cosineSql("d.e", "d.dq")}, 6) AS cos_err
         |FROM d
         |UNION ALL
         |SELECT vec_id, 0.0 AS qscale, NULL AS cos_err
         |FROM base WHERE maxabs = 0""".stripMargin,
    // q89 replays q80's dequantization and both cosine folds, then
    // takes both top-k sets with identical (cos DESC, vec_id ASC)
    // ordering on the raw doubles
    "q89_int8_retrieval" ->
      s"""WITH q AS (
         | SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS w
         | FROM embeddings WHERE vec_id = $QueryVecId),
         |base AS (
         | SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |  list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE)))) AS maxabs
         | FROM embeddings WHERE vec_id <> $QueryVecId),
         |d AS (
         | SELECT vec_id, v,
         |  list_transform(v, x -> round(x / (maxabs / 127.0))
         |    * (maxabs / 127.0)) AS dq
         | FROM base WHERE maxabs > 0),
         |c AS (
         | SELECT d.vec_id,
         |  ${DedupQueries.cosineSql("d.dq", "q.w")} AS cq,
         |  ${DedupQueries.cosineSql("d.v", "q.w")} AS cf
         | FROM d, q),
         |ftop AS (SELECT vec_id FROM c ORDER BY cf DESC, vec_id ASC LIMIT $TopK)
         |SELECT c.vec_id, round(c.cq, 6) AS cos_q, round(c.cf, 6) AS cos_f,
         | (c.vec_id IN (SELECT vec_id FROM ftop)) AS in_float_topk
         |FROM c ORDER BY c.cq DESC, c.vec_id ASC LIMIT $TopK""".stripMargin,
    // q83 replays the same 0.0-seeded index-order folds at full and
    // prefix width over pre-cast DOUBLE lists; deltas subtract the raw
    // (unrounded) quotients exactly as the engine does
    "q83_matryoshka_audit" -> {
      def pdot(a: String, b: String, n: Int): String =
        s"""list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
           |    list_transform(range(1, ${n + 1}), i -> $a[i] * $b[i])),
           |    (x, y) -> x + y)""".stripMargin
      s"""WITH q AS (
         | SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS w
         | FROM embeddings WHERE vec_id = $QueryVecId),
         |b AS (
         | SELECT e.vec_id,
         |  list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v, q.w
         | FROM embeddings e, q),
         |d AS (
         | SELECT vec_id,
         |  ${pdot("v", "v", Dims)} AS vv,
         |  ${pdot("v", "v", KeepDims)} AS vvk,
         |  ${pdot("w", "w", Dims)} AS ww,
         |  ${pdot("w", "w", KeepDims)} AS wwk,
         |  ${pdot("v", "w", Dims)} AS vw,
         |  ${pdot("v", "w", KeepDims)} AS vwk
         | FROM b)
         |SELECT vec_id,
         | CASE WHEN vv = 0 THEN NULL
         |  ELSE round(sqrt(vvk) / sqrt(vv), 6) END AS norm_frac,
         | CASE WHEN vv = 0 OR ww = 0 THEN NULL
         |  ELSE round(vw / (sqrt(vv) * sqrt(ww)), 6) END AS cos_full,
         | CASE WHEN vvk = 0 OR wwk = 0 THEN NULL
         |  ELSE round(vwk / (sqrt(vvk) * sqrt(wwk)), 6) END AS cos_trunc,
         | CASE WHEN vv = 0 OR ww = 0 OR vvk = 0 OR wwk = 0 THEN NULL
         |  ELSE round(abs(vw / (sqrt(vv) * sqrt(ww))
         |    - vwk / (sqrt(vvk) * sqrt(wwk))), 6) END AS cos_delta
         |FROM d""".stripMargin
    },
    "q66_ann_multiprobe" ->
      s"""WITH bucketed AS (
         | SELECT vec_id, embedding, CAST(${bucketSql("embedding")} AS BIGINT) AS bucket
         | FROM embeddings)
         |SELECT e.vec_id, e.bucket,
         | round(${DedupQueries.cosineSql("e.embedding", "q.qv")}, 6) AS cos_sim
         |FROM bucketed e
         |JOIN (SELECT bucket AS qbucket, embedding AS qv
         |      FROM bucketed WHERE vec_id = $QueryVecId) q
         |  ON bit_count(xor(e.bucket, q.qbucket)) <= $ProbeRadius
         |WHERE e.vec_id <> $QueryVecId
         |ORDER BY ${DedupQueries.cosineSql("e.embedding", "q.qv")} DESC, e.vec_id ASC
         |LIMIT $TopK""".stripMargin,
    // q99 replays the batch as a cross join + per-query row_number on
    // the same raw-cosine ordering — the window-sort plan this engine
    // deliberately avoids via the bounded typed aggregator
    "q99_hard_negatives" ->
      s"""WITH q AS (
         | SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         | FROM embeddings
         | WHERE vec_id IN (${HardNegQueryIds.mkString(", ")})),
         |r AS (
         | SELECT q.query_id, e.vec_id AS neg_id,
         |  ${DedupQueries.cosineSql("e.embedding", "q.qv")} AS c,
         |  row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY ${DedupQueries.cosineSql("e.embedding", "q.qv")} DESC,
         |      e.vec_id ASC) AS rank
         | FROM embeddings e CROSS JOIN q
         | WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel)
         |SELECT query_id, neg_id, round(c, 6) AS cos_sim,
         | CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= $HardNegK""".stripMargin)

  /** One Lloyd iteration as SQL CTEs: assign every sample vector to its
    * nearest `prev` centroid (ties to the smaller cid — the Spark
    * side's strict-`>` scan), recompute per-(cid, pos) means rounded to
    * 6 decimals, and carry the previous centroid for clusters that lost
    * every member. Mirrors [[quantizerCentroids]] exactly.
    */
  private def kmeansIterSql(prev: String, next: String): String =
    s"""a_$next AS (
       | SELECT s.vec_id, s.embedding, c.cid,
       |  row_number() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${DedupQueries.cosineSql("s.embedding", "c.centroid")} DESC,
       |      c.cid ASC) AS rn
       | FROM samp s CROSS JOIN $prev c),
       |m_$next AS (
       | SELECT a.cid, p.pos,
       |  round(avg(CAST(a.embedding[p.pos] AS DOUBLE)), 6) AS m
       | FROM a_$next a, (SELECT unnest(range(1, ${Dims + 1})) AS pos) p
       | WHERE a.rn = 1 GROUP BY a.cid, p.pos),
       |$next AS (
       | SELECT c.cid, coalesce(l.centroid, c.centroid) AS centroid
       | FROM $prev c LEFT JOIN
       |  (SELECT cid, list(m ORDER BY pos) AS centroid
       |   FROM m_$next GROUP BY cid) l
       |  ON c.cid = l.cid)""".stripMargin

  /** The shared k-means-replay CTE chain, up to `asg(vec_id, embedding,
    * list_id)` (every corpus vector with its final-centroid list) and
    * `scored` (the per-vector centroid ranking). Replays the seeded
    * build: sample → seeds → [[KmIters]] iterations. Used by the q56
    * oracle (probe the query's nearest lists) and the q74 oracle
    * (within-list pairwise near-dup).
    */
  private def ivfAssignCtesSql: String = {
    val sampleHex = SampleHexDigits.map(d => s"'$d'").mkString(", ")
    val finalCents = s"c$KmIters"
    val iters = (1 to KmIters)
      .map(i => kmeansIterSql(s"c${i - 1}", s"c$i")).mkString(",\n")
    s"""samp AS (
       | SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS h
       | FROM embeddings
       | WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ($sampleHex)),
       |seeds AS (
       | SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, embedding
       | FROM (SELECT h, vec_id, embedding FROM samp
       |       ORDER BY h, vec_id LIMIT $KLists) t),
       |c0 AS (
       | SELECT cid, list_transform(range(1, ${Dims + 1}),
       |   i -> round(CAST(embedding[i] AS DOUBLE), 6)) AS centroid
       | FROM seeds),
       |$iters,
       |scored AS (
       | SELECT e.vec_id, e.embedding, c.cid,
       |  row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${DedupQueries.cosineSql("e.embedding", "c.centroid")} DESC,
       |      c.cid ASC) AS rn
       | FROM embeddings e CROSS JOIN $finalCents c),
       |asg AS (SELECT vec_id, embedding, cid AS list_id FROM scored WHERE rn = 1)""".stripMargin
  }

  /** The full q56 oracle: replay the seeded k-means build, assign the
    * whole corpus to the final centroids, then probe exactly like the
    * Spark side.
    */
  private def q56OracleSql: String =
    s"""WITH $ivfAssignCtesSql,
       |probes AS (SELECT cid FROM scored
       |           WHERE vec_id = $QueryVecId AND rn <= $NProbe)
       |SELECT a.vec_id, a.list_id,
       | round(${DedupQueries.cosineSql("a.embedding", "q.qv")}, 6) AS cos_sim
       |FROM asg a
       |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId) q
       |WHERE a.vec_id <> $QueryVecId AND a.list_id IN (SELECT cid FROM probes)
       |ORDER BY ${DedupQueries.cosineSql("a.embedding", "q.qv")} DESC, a.vec_id ASC
       |LIMIT $TopK""".stripMargin

  /** q74's oracle: the same corpus assignment, then all within-list
    * pairs above the similarity bar.
    */
  private def q74OracleSql: String =
    s"""WITH $ivfAssignCtesSql
       |SELECT a.list_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       | round(${DedupQueries.cosineSql("a.embedding", "b.embedding")}, 6) AS cos_sim
       |FROM asg a JOIN asg b
       |  ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |WHERE ${DedupQueries.cosineSql("a.embedding", "b.embedding")} >= $SemDedupCos""".stripMargin
}
