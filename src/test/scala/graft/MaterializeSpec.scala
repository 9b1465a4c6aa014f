package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** The materialization seam (r10 verdict item 1): every lineage
  * truncation in the engine goes through [[Materialize.frame]], whose
  * binding is a deployment choice — `localCheckpoint` (default; free on
  * local[*], fatal on executor loss) vs reliable `checkpoint()`
  * (`spark.graft.reliableCheckpoint=true`; survives churn by re-reading
  * files). This spec pins:
  *   - seam uniqueness (no stray direct `localCheckpoint()` calls),
  *   - result equivalence across bindings for an iterative operator
  *     (ConnectedComponents) and a memoized-artifact consumer (q48),
  *   - the CHURN semantics that motivated the seam: dropping the
  *     materialized blocks (what losing an executor does) kills the
  *     default binding's consumers but not the reliable binding's,
  *   - the QueryMemo zero-eviction invariant a full registry sweep
  *     relies on (SCALE.md §21's cliff, now detected mechanically).
  */
class MaterializeSpec extends SparkSpec {

  private lazy val sc = spark.sparkContext

  private def ensureCheckpointDir(): String = {
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        Files.createTempDirectory("graft-ckpt-spec").toString)
    sc.getCheckpointDir.get
  }

  /** A session whose Materialize binding is reliable checkpoint; shares
    * the SparkContext (and test lake) but has isolated SQL conf and —
    * because QueryMemo keys sessions by reference — an isolated memo.
    */
  private def reliableSession() = {
    val s = spark.newSession()
    s.conf.set(Materialize.ReliableConfKey, "true")
    ensureCheckpointDir()
    s
  }

  test("the seam is the only localCheckpoint call site in src/main") {
    val srcRoot = Paths.get("src/main/scala")
    assume(Files.isDirectory(srcRoot)) // spec runs from the repo root
    val offenders = {
      val it = Files.walk(srcRoot)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          .filter(p => Files.readString(p).contains(".localCheckpoint()"))
          .map(_.toString).toList
      } finally it.close()
    }
    assert(offenders == List("src/main/scala/graft/Materialize.scala"),
      s"direct localCheckpoint() calls outside the seam: $offenders")
  }

  private def chainEdges(s: org.apache.spark.sql.SparkSession) = {
    // two chains + one isolated pair: enough rounds to exercise the
    // per-iteration materialization
    val rows = (1L to 9L).map(i => (i, i + 1)) ++ Seq((20L, 21L))
    s.createDataFrame(rows).toDF("src", "dst")
  }

  test("reliable binding: ConnectedComponents matches the default binding " +
      "and actually writes checkpoint files") {
    val rel = reliableSession()
    // getCheckpointDir may come back as a plain path or a file: URI
    val raw = ensureCheckpointDir()
    val dir = Paths.get(Option(new java.net.URI(raw).getPath)
      .filter(_.nonEmpty).getOrElse(raw))
    def labels(s: org.apache.spark.sql.SparkSession) =
      graft.operators.ConnectedComponents.run(chainEdges(s), "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val expected = labels(spark)
    val filesBefore = if (Files.isDirectory(dir)) Files.walk(dir).count() else 0L
    assert(labels(rel) == expected)
    val filesAfter = Files.walk(dir).count()
    assert(filesAfter > filesBefore,
      "reliable binding ran but wrote nothing to the checkpoint dir")
  }

  test("reliable binding: a memoized-artifact consumer (q48 cluster labels) " +
      "matches the default binding") {
    val sf = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sf)))
    val rel = reliableSession()
    def canon(s: org.apache.spark.sql.SparkSession) =
      SparkEntry.queries("q48_dedup_clusters")(s, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(canon(rel) == canon(spark))
  }

  /** Snapshot-diff of persistent RDD ids around `body`, so the churn
    * tests drop ONLY the blocks they created (never other suites'
    * memoized artifacts, which live in the same shared context).
    */
  private def withNewPersistentRdds[A](body: => A): (A, Seq[Int]) = {
    val before = sc.getPersistentRDDs.keySet
    val out = body
    (out, (sc.getPersistentRDDs.keySet -- before).toSeq)
  }

  test("churn: dropping materialized blocks kills the DEFAULT binding's " +
      "consumer (the cluster fragility the seam exists for)") {
    val (frame, newIds) = withNewPersistentRdds {
      Materialize.frame(
        spark.range(0, 10000).toDF("id")
          .withColumn("x", col("id") * 2))
    }
    assert(newIds.nonEmpty,
      "localCheckpoint registered no persistent RDD — churn test is vacuous")
    assert(frame.count() == 10000L) // healthy while blocks live
    newIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    // blocks gone + lineage truncated = no recompute path: the job FAILS
    intercept[SparkException] { frame.count() }
  }

  test("churn: the RELIABLE binding survives the same block loss " +
      "(re-reads checkpoint files)") {
    val rel = reliableSession()
    val (frame, newIds) = withNewPersistentRdds {
      Materialize.frame(
        rel.range(0, 10000).toDF("id")
          .withColumn("x", col("id") * 2))
    }
    assert(frame.count() == 10000L)
    // reliable checkpoint may leave no persistent blocks at all; drop
    // whatever it did leave and prove the frame still computes
    newIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    assert(frame.count() == 10000L)
    assert(frame.agg(sum(col("x"))).head().getLong(0) == 9999L * 10000L)
  }

  test("app-end cleanup plumbing: deleteRecursively removes a nested " +
      "checkpoint tree and swallows a missing path (r11 ADVICE — the " +
      "reliable profile's UUID subdir must not outlive the app)") {
    val root = Files.createTempDirectory("graft-ckpt-cleanup").toFile
    val nested = new java.io.File(root, "a/b")
    assert(nested.mkdirs())
    Files.write(Paths.get(nested.getPath, "part-0"),
      Array[Byte](1, 2, 3)): Unit
    Materialize.deleteRecursively(root.getPath, sc.hadoopConfiguration)
    assert(!root.exists(), "checkpoint tree survived the app-end cleanup")
    // best-effort contract: a second delete (path gone) must not throw
    Materialize.deleteRecursively(root.getPath, sc.hadoopConfiguration)
  }

  test("full-registry construction sweep stays under the memo bound " +
      "with zero evictions (SCALE.md §21 cliff, pinned)") {
    val sf = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sf)))
    // isolate: a fresh memo, then ONE dataset's full artifact working
    // set — query construction runs every eager artifact build (the
    // memoized frames materialize at construction time), which is
    // exactly the traffic that evicts; executing the final plans adds
    // no memo entries
    graft.queries.QueryMemo.clearAll()
    val evict0 = graft.queries.QueryMemo.evictionCount
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      fn(spark, sf): Unit
    }
    val evicted = graft.queries.QueryMemo.evictionCount - evict0
    assert(evicted == 0L,
      s"$evicted mid-sweep memo evictions — the artifact working set " +
        "outgrew QueryMemo.MaxEntries; raise the bound (see SCALE.md §21)")
  }
}
