package graft

import graft.queries.{DedupQueries, QueryMemo, VectorQueries}

/** Freshness of memoized dataset-derived state: a dataset rewritten IN
  * PLACE must produce fresh results with NO manual invalidate call —
  * the memo keys and the IVF index home both carry the dataset's
  * content fingerprint, so stale state simply can't be addressed.
  */
class FreshnessSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def writeEmbeddings(dir: String, n: Int, seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, i % 3, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("cluster labels recompute after an in-place rewrite, " +
    "no manual invalidate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    def doc(i: Int, body: String) = (i.toLong,
      s"$body with enough distinct words w${i * 7} w${i * 13} to shingle")
    // v1: docs 1 and 2 are exact duplicates → same canonical id
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      doc(3, "unrelated third document")))
    val v1 = DedupQueries.clusterLabels(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(v1(1L) == 1L && v1(2L) == 1L && v1(3L) == 3L)
    // v2: same path, doc 2 rewritten to be unique — a stale memo hit
    // would still report it as doc 1's duplicate
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      doc(2, "now a completely different second document"),
      doc(3, "unrelated third document")))
    val v2 = DedupQueries.clusterLabels(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(v2(2L) == 2L, s"stale memo served after in-place rewrite: $v2")
  }

  test("IVF index rebuilds after an in-place rewrite; the superseded " +
    "version stays adoptable for sessions still holding it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh-ivf").toString
    writeEmbeddings(dir, n = 60, seed = 1)
    val p1 = VectorQueries.ivfIndexPath(spark, dir)
    val ix1 = VectorQueries.ivfIndex(spark, dir)
    assert(ix1.listsPath == p1)
    writeEmbeddings(dir, n = 90, seed = 2) // same path, new content
    val p2 = VectorQueries.ivfIndexPath(spark, dir)
    assert(p2 != p1, "fingerprint must change on rewrite")
    val ix2 = VectorQueries.ivfIndex(spark, dir)
    assert(ix2.listsPath == p2)
    // the rebuilt index covers the NEW corpus…
    assert(spark.read.parquet(p2).count() == 90)
    // …and the superseded version is NOT swept by the build — a live
    // session that memoized it mid-probe must keep reading it
    // (reclaiming is a retention job's call, not a concurrent build's);
    // both versions stay independently readable
    assert(spark.read.parquet(p1).count() == 60)
    // the atomic rename publish leaves no staging residue behind
    val root = java.nio.file.Paths.get(p1).getParent
    val stray = java.nio.file.Files.list(root).iterator()
    var names = List.empty[String]
    while (stray.hasNext) names ::= stray.next().getFileName.toString
    assert(!names.exists(_.startsWith(".stage-")), names.toString)
  }

  test("IVF root override (graft.ivf.root) relocates the index home and " +
    "restores the user-scoped default when cleared") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh-root").toString
    writeEmbeddings(dir, n = 30, seed = 3)
    val defaultPath = VectorQueries.ivfIndexPath(spark, dir)
    val user = sys.props.getOrElse("user.name", "anon")
    assert(defaultPath.contains(s"graft-ivf-$user"),
      s"default home must stay user-scoped: $defaultPath")
    val priv = java.nio.file.Files.createTempDirectory("graft-root-ovr")
    val saved = sys.props.get(VectorQueries.IvfRootProp)
    try {
      sys.props(VectorQueries.IvfRootProp) = priv.toString
      val overridden = VectorQueries.ivfIndexPath(spark, dir)
      // the override relocates the ROOT; the content-fingerprinted leaf
      // (format tag + dataset fingerprint) must be byte-identical, so a
      // deployment pointing the root at a lake path keeps the same
      // version addressing (and IvfBuildBench's private builds stay
      // adoptable only within their own root)
      assert(overridden.startsWith(priv.toString), overridden)
      assert(java.nio.file.Paths.get(overridden).getFileName ==
        java.nio.file.Paths.get(defaultPath).getFileName,
        s"version leaf drifted: $overridden vs $defaultPath")
      assert(overridden != defaultPath)
    } finally {
      saved match {
        case Some(v) => sys.props(VectorQueries.IvfRootProp) = v
        case None => sys.props -= VectorQueries.IvfRootProp: Unit
      }
    }
    assert(VectorQueries.ivfIndexPath(spark, dir) == defaultPath,
      "clearing the override must restore the default home")
  }

  test("basket pair artifact recomputes after an in-place lineitem " +
    "rewrite, and q133/q174 read the SAME shared table") {
    import graft.queries.RelationalQueries
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh-bkt").toString
    def writeItems(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // v1: parts 10 and 20 co-occur in two baskets → support 2 survives
    writeItems(Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)))
    val v1 = RelationalQueries.q174(spark, dir)
      .select("part", "rec").as[(Long, Long)].collect().toSet
    assert(v1 == Set((10L, 20L), (20L, 10L)), v1.toString)
    // q133 rides the same artifact: the pair row agrees in-session
    val lift1 = RelationalQueries.q133(spark, dir)
      .select("part_a", "part_b", "n_ab").as[(Long, Long, Long)]
      .collect().toSet
    assert(lift1 == Set((10L, 20L, 2L)), lift1.toString)
    // v2: same path, basket 2 now pairs 10 with 30 — support for
    // (10,20) drops below the cut; a stale memo would still serve it
    writeItems(Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L)))
    val v2 = RelationalQueries.q174(spark, dir)
      .select("part", "rec").as[(Long, Long)].collect().toSet
    assert(v2.isEmpty, s"stale basket artifact served after rewrite: $v2")
  }

  test("exact-percentile artifact recomputes after an in-place " +
    "lineitem rewrite (the q45/q65 shared baseline)") {
    import graft.queries.SamplingQueries
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh-pct").toString
    def writePrices(scale: Double): Unit =
      (1 to 4).map(i => ("A", i * scale))
        .toDF("l_returnflag", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    writePrices(1.0)
    val v1 = SamplingQueries.q45(spark, dir)
      .select("p50").as[Double].collect().head
    assert(v1 == 2.5, v1.toString)
    writePrices(10.0) // same path, new content
    val v2 = SamplingQueries.q45(spark, dir)
      .select("p50").as[Double].collect().head
    assert(v2 == 25.0, s"stale percentile artifact served: $v2")
  }

  test("IVF adoption survives a tmp reaper: marker without data falls " +
    "back to a rebuild, not a broken probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh-reap").toString
    writeEmbeddings(dir, n = 40, seed = 3)
    val ix = VectorQueries.ivfIndex(spark, dir)
    // age out the centroids parquet but leave the marker — the classic
    // per-file tmp-reaper hazard
    val cents = java.nio.file.Paths.get(ix.listsPath, "_centroids")
    java.nio.file.Files.list(cents).forEach(f =>
      java.nio.file.Files.delete(f))
    java.nio.file.Files.delete(cents)
    // fresh session simulated via memo invalidate: adoption must detect
    // the unhealthy index and rebuild instead of failing the read
    QueryMemo.invalidate(spark, VectorQueries.ivfMemoKey(spark, dir))
    val again = VectorQueries.ivfIndex(spark, dir)
    assert(again.cents.map(_._1).toSeq == ix.cents.map(_._1).toSeq)
    assert(spark.read.parquet(again.listsPath).count() == 40)
  }

  test("invalidateClusterLabels also drops the part-fingerprinted " +
    "near-miss pair artifact (the r10 ADVICE force-cold gap)") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    DedupQueries.q168(spark, dir).count(): Unit // ensure memoized
    val h0 = QueryMemo.hitCount
    DedupQueries.q168(spark, dir): Unit
    assert(QueryMemo.hitCount > h0, "q168 artifact was not memoized")
    DedupQueries.invalidateClusterLabels(spark, dir)
    val h1 = QueryMemo.hitCount
    DedupQueries.q168(spark, dir): Unit // must MISS → recompute
    assert(QueryMemo.hitCount == h1,
      "force-cold hook left the sorted-neighborhood-pairs entry behind")
  }
}
