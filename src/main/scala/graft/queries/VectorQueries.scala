package graft.queries

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

  /** q37 — brute-force cosine top-k against the query vector (vec_id 0).
    * The exact-recall baseline every ANN variant is judged against.
    */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** q38 — LSH-bucketed ANN: bucket the corpus by hyperplane sign bits,
    * search only the query's bucket. Approximate — recall is traded for
    * a 2^NBits scan reduction; candidates are still ranked by exact
    * cosine within the bucket.
    */
  def q38(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .withColumn("bucket", VectorFunctions.lshBucket(col("embedding"), NBits, Dims))
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("bucket").as("qbucket"), col("embedding").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), col("bucket"), round(col("cos"), 6).as("cos_sim"))
  }

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

  /** Deterministic on-disk home for a dataset's IVF index (and its
    * `_centroids` sibling): tmpdir/graft-ivf/md5(dataset path). One
    * fixed location per dataset means QueryMemo eviction and session
    * teardown leave at most ONE reusable directory per dataset — never
    * an accumulating orphan per build — and a fresh session adopts the
    * existing index instead of re-running the full-corpus assignment.
    * Same immutability contract as [[QueryMemo]]: a dataset rewritten
    * in place needs `QueryMemo.invalidate` plus deletion of this dir.
    */
  private[graft] def ivfIndexPath(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft-ivf", h).toString
  }

  /** IVF index build, ONCE per dataset ACROSS sessions: every vector is
    * assigned to its nearest q54 centroid (one broadcast of
    * labels × dims doubles, one narrow pass — no shuffle) and the
    * corpus is written as a [[graft.sources.Lake.writeListPartitioned]]
    * inverted-list layout, `partitionBy(list_id)`, at the
    * [[ivfIndexPath]] deterministic location; the (tiny) quantizer
    * centroids are persisted beside it so adoption needs no corpus
    * scan. The assignment — the full-corpus pass — happens at BUILD
    * time; every probe after it is a partition-pruned scan of the
    * probed lists only. Memoized per session ([[QueryMemo]]) AND
    * adopted from disk by a completeness marker written after both
    * writes commit, which is exactly the index lifecycle a 1B-vector
    * deployment needs — build is a job, probes are lookups.
    * (The sandbox roots under tmpdir; a deployment passes a lake
    * path — the layout is the point.)
    */
  private[graft] def ivfIndex(s: SparkSession, dir: String): IvfIndex =
    QueryMemo.getAny(s, s"ann-ivf-index:$dir") {
      import s.implicits._
      val path = ivfIndexPath(dir)
      val centsPath = path + "_centroids"
      // our own end-of-build marker: the session's dynamic
      // partitionOverwriteMode commits partitioned writes WITHOUT a
      // root _SUCCESS, so the lists dir has no committer marker to
      // trust; written last, after both the lists and the centroids
      // (underscore-prefixed files are invisible to Spark's scan)
      val marker = java.nio.file.Paths.get(path, "_GRAFT_INDEX_DONE")
      if (!java.nio.file.Files.exists(marker)) {
        val cents: Array[(Int, Array[Double])] = centroidFrame(s, dir)
          .select(col("label"), col("centroid")).as[(Int, Seq[Double])]
          .collect().map { case (l, c) => (l, c.toArray) }.sortBy(_._1)
        val bc = s.sparkContext.broadcast(cents)
        val assigned = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
          .map { case (id, emb) => (id, assignTo(bc.value, emb), emb) }
          .toDF("vec_id", "list_id", "embedding")
        graft.sources.Lake
          .writeListPartitioned(assigned, "list_id", "vec_id", path)
        cents.toSeq.map { case (l, c) => (l, c.toSeq) }
          .toDF("label", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(centsPath)
        java.nio.file.Files.createFile(marker)
        IvfIndex(path, cents)
      } else {
        val cents = s.read.parquet(centsPath)
          .select(col("label"), col("centroid")).as[(Int, Seq[Double])]
          .collect().map { case (l, c) => (l, c.toArray) }.sortBy(_._1)
        IvfIndex(path, cents)
      }
    }

  /** q56 — IVF-style ANN over the MATERIALIZED [[ivfIndex]]: the q54
    * centroids are the coarse quantizer; the query ranks them
    * driver-side, probes its [[NProbe]] nearest lists, and ONLY those
    * lists' partitions are scanned (PlanSpec asserts the probe scan's
    * PartitionFilters carry `list_id`). The second ANN scale path
    * beside q38's LSH buckets: at 1B vectors / 4k lists a probe reads
    * ~nprobe/4k of the corpus — off disk, not recomputed. The
    * 6-decimal centroid rounding (q54) makes the quantizer
    * engine-portable, so assignments — and therefore results —
    * hash-match the oracle.
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ix = ivfIndex(s, dir)
    val qEmb = t(s, dir, "embeddings")
      .filter(col("vec_id") === QueryVecId)
      .select(col("embedding")).as[Array[Float]].head()
    val probeLists = ix.cents
      .map { case (l, c) => (l, cosD(qEmb, c)) }
      .sortBy { case (l, c) => (-c, l) }
      .take(NProbe).map(_._1).toSeq
    s.read.parquet(ix.listsPath)
      .filter(col("list_id").isin(probeLists: _*) &&
        col("vec_id") =!= QueryVecId)
      .withColumn("cos", VectorExpressions.vecCosine(col("embedding"),
        typedLit(qEmb)))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), col("list_id"), round(col("cos"), 6).as("cos_sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_ann_bruteforce" -> (q37 _),
    "q38_ann_lsh" -> (q38 _),
    "q54_label_centroids" -> (q54 _),
    "q56_ann_ivf" -> (q56 _))

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

  val oracles: Map[String, String] = Map(
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
    "q56_ann_ivf" ->
      s"""WITH ex AS (
         | SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
         | FROM embeddings, (SELECT unnest(range(1, ${Dims + 1})) AS i)),
         |m AS (SELECT label, pos, avg(v) AS m FROM ex GROUP BY label, pos),
         |cents AS (SELECT label, list(round(m, 6) ORDER BY pos) AS centroid
         |          FROM m GROUP BY label),
         |scored AS (
         | SELECT e.vec_id, e.embedding, c.label,
         |  ${DedupQueries.cosineSql("e.embedding", "c.centroid")} AS ccos
         | FROM embeddings e CROSS JOIN cents c),
         |ranked AS (
         | SELECT *, row_number() OVER (PARTITION BY vec_id
         |   ORDER BY ccos DESC, label ASC) AS rn
         | FROM scored),
         |asg AS (SELECT vec_id, embedding, label AS list_id FROM ranked WHERE rn = 1),
         |probes AS (SELECT label FROM ranked WHERE vec_id = $QueryVecId AND rn <= $NProbe)
         |SELECT a.vec_id, a.list_id,
         | round(${DedupQueries.cosineSql("a.embedding", "q.qv")}, 6) AS cos_sim
         |FROM asg a
         |CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId) q
         |WHERE a.vec_id <> $QueryVecId AND a.list_id IN (SELECT label FROM probes)
         |ORDER BY ${DedupQueries.cosineSql("a.embedding", "q.qv")} DESC, a.vec_id ASC
         |LIMIT $TopK""".stripMargin)
}
