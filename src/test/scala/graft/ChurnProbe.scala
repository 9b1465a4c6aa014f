package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-churn probe for the Materialize seam (r10 verdict item 6):
  * runs ConnectedComponents under the RELIABLE binding on a real
  * multi-process `local-cluster[2,4,2048]` master and kills one
  * executor JVM mid-iteration. With `localCheckpoint` this scenario is
  * fatal by construction (executor-local blocks + truncated lineage —
  * MaterializeSpec reproduces that deterministically by dropping
  * blocks); with `spark.graft.reliableCheckpoint=true` the replacement
  * executor re-reads the checkpoint FILES and the job completes with
  * the oracle labeling.
  *
  * A main, not a spec: local-cluster needs its own SparkContext, and
  * the suite's shared local[4] session is JVM-wide (getOrCreate) — a
  * second master inside that JVM would be refused. Run with:
  * `Test/runMain graft.ChurnProbe` (SCALE.md §23 records a result).
  *
  * With an sfDir argument (`Test/runMain graft.ChurnProbe
  * /tmp/sf0.5-r14`) the probe instead runs REAL registry queries over
  * a replica lake on `local-cluster[2,8,4096]` — the VERDICT r14
  * item-4 scale variant, where shuffle files are big enough for
  * recovery cost to be visible: it times a no-kill baseline pass,
  * re-runs the same pass with one executor hard-killed mid-run, and
  * gates on (a) the kill landing before completion, (b) per-query
  * result checksums identical across the two passes, (c) both walls
  * printed so BASELINE.md can record the recovery delta.
  *
  * The kill is a REAL `Process.destroyForcibly` on a
  * CoarseGrainedExecutorBackend child process — the same failure a
  * lost node inflicts — not a Spark-API politeness like
  * `killExecutor`, which decommissions gracefully.
  */
object ChurnProbe {

  /** Chain length per component: long chains force many CC rounds
    * (pointer doubling is O(log diameter)), keeping the job alive long
    * enough for the kill to land mid-iteration.
    */
  private val ChainLen = 400000L
  private val Chains = 4L

  /** Lake-mode workload: deterministic, shuffle-heavy registry queries
    * spanning the three operator families whose recovery paths differ —
    * iterative CC over LSH candidates (q48: reliable-checkpoint
    * lineage), codec-bound wide scans (q109: recompute-only), and an
    * exact-dedup partial-agg chain (q130: lost-shuffle refetch). None
    * adopts a cross-JVM artifact (the IVF consumers are deliberately
    * excluded — index adoption would hide the recovery work).
    */
  private val LakeQueries =
    Seq("q48_dedup_clusters", "q109_gif_frame_sample",
      "q130_audio_fingerprint")

  def main(args: Array[String]): Unit =
    if (args.nonEmpty) lakeProbe(args(0)) else chainProbe()

  /** True iff the process is a Spark executor backend. Reads
    * `/proc/<pid>/cmdline` DIRECTLY: `ProcessHandle.info().commandLine`
    * truncates at 4096 bytes on Linux (measured — a 17.5 KB argv reads
    * back exactly 4096 chars), and the executor's classpath pushes the
    * `CoarseGrainedExecutorBackend` class name far past the cap, so the
    * Info-based match silently finds NO victim and the probe goes
    * vacuous. /proc has no such cap; the probe is Linux-only dev
    * tooling, so the /proc dependency is fine.
    */
  private def isExecutorProc(p: ProcessHandle): Boolean =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/proc/${p.pid()}/cmdline")),
        "US-ASCII").contains("CoarseGrainedExecutorBackend")
    catch { case _: Throwable => false } // raced exit — not a victim

  /** Kill one CoarseGrainedExecutorBackend child after `delayMs`,
    * recording the kill instant; 0 stays 0 if no victim was found.
    */
  private def killerThread(delayMs: Long,
      killedAtNanos: java.util.concurrent.atomic.AtomicLong): Thread = {
    val t = new Thread(() => {
      Thread.sleep(delayMs)
      val victims = ProcessHandle.current().descendants()
        .filter(p => isExecutorProc(p))
        .toList
      if (victims.isEmpty)
        System.err.println("[churn] NO executor process found to kill " +
          "— probe is vacuous")
      else {
        val v = victims.get(0)
        System.err.println(s"[churn] killing executor pid ${v.pid()} " +
          s"(of ${victims.size()} executors) mid-run")
        v.destroyForcibly(): Unit
        killedAtNanos.set(System.nanoTime())
      }
    })
    t.setDaemon(true)
    t
  }

  private def lakeProbe(sfDir: String): Unit = {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-churn-ckpt")
    LogHygiene.quietKnownWarnings()
    val spark = SparkSession.builder()
      .master("local-cluster[2,8,4096]")
      .appName("graft-churn-probe-lake")
      .withExtensions(new GraftExtensions)
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Materialize.ReliableConfKey, "true")
      .config(Materialize.CheckpointDirConfKey, ckptDir.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // order-insensitive result checksum: XOR of per-row 64-bit hashes
      // + row count (the outputs are key-unique, so XOR cannot mask an
      // even-multiplicity swap). Collapses each pass's frames to a
      // driver-sized fingerprint without materializing rows.
      def checksum(name: String): (Long, Long) = {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val row = df.select(
          coalesce(bit_xor(xxhash64(df.columns.map(col).toSeq: _*)), lit(0L)),
          count(lit(1))).head()
        (row.getLong(0), row.getLong(1))
      }
      def pass(): (Map[String, (Long, Long)], Double, Long) = {
        // each pass rebuilds everything it measures: memoized frames or
        // cached blocks from the previous pass would hide recovery work
        graft.queries.QueryMemo.clearAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val sums = LakeQueries.map(n => n -> checksum(n)).toMap
        val done = System.nanoTime()
        (sums, (done - t0) / 1e9, done)
      }
      pass() // absorb session/codegen/scan warmup
      val (baseSums, baseSecs, _) = pass()
      // aim the kill at ~40% of the measured baseline — deep enough
      // that shuffle files exist, early enough that it can't race
      // completion on a fast host
      val killDelayMs = math.max((baseSecs * 0.4 * 1000).toLong, 2000L)
      val killedAtNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val killer = killerThread(killDelayMs, killedAtNanos)
      val churnStart = System.nanoTime()
      killer.start()
      val (churnSums, churnSecs, churnDone) = pass()
      killer.join(20000)
      if (killedAtNanos.get() <= churnStart ||
          killedAtNanos.get() >= churnDone) {
        println("[churn] VACUOUS: the executor kill did not land inside " +
          s"the churn pass (killedAt=${killedAtNanos.get()}, " +
          s"start=$churnStart, done=$churnDone) — no churn was exercised")
        sys.exit(2)
      }
      val mismatches = LakeQueries.filter(n => baseSums(n) != churnSums(n))
      if (mismatches.isEmpty) {
        val killLead = (churnDone - killedAtNanos.get()) / 1e9
        println(f"[churn] PASS (lake $sfDir): ${LakeQueries.size}%d queries" +
          f", 0 checksum mismatches; baseline $baseSecs%.1f s, with-kill " +
          f"$churnSecs%.1f s (recovery delta ${churnSecs - baseSecs}%+.1f " +
          f"s), executor killed $killLead%.1f s before completion " +
          s"(rows: ${LakeQueries.map(n => baseSums(n)._2).mkString("/")})")
      }
      else {
        println(s"[churn] FAIL (lake $sfDir): checksum mismatch on " +
          s"${mismatches.mkString(",")} — base=" +
          s"${mismatches.map(baseSums)} churn=${mismatches.map(churnSums)}")
        sys.exit(1)
      }
    } finally {
      spark.stop()
      try {
        java.nio.file.Files.walk(ckptDir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }
    }
  }

  private def chainProbe(): Unit = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val testClassesDir = new java.io.File("target/scala-2.13/test-classes").getAbsolutePath
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-churn-ckpt")
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-churn-probe")
      // executor JVMs are separate processes: they need graft's classes
      .config("spark.executor.extraClassPath", s"$classesDir:$testClassesDir")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Materialize.ReliableConfKey, "true")
      .config(Materialize.CheckpointDirConfKey, ckptDir.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // Chains of consecutive ids: component oracle = chain start.
      val edges = spark.range(0, ChainLen * Chains).toDF("src")
        .filter((col("src") + 1) % ChainLen =!= 0) // no edge across chains
        .withColumn("dst", col("src") + 1)
      // the probe is only evidence if the kill LANDS BEFORE the job
      // finishes — record both instants and assert the order below.
      // 15 s delay: wait for executors to register and the first
      // rounds to run, then hard-kill one executor process.
      val killedAtNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val killer = killerThread(15000, killedAtNanos)
      killer.start()
      val t0 = System.nanoTime()
      val labels = graft.operators.ConnectedComponents
        .run(edges, "src", "dst", maxIter = 40)
      val bad = labels
        .filter(col("comp") =!= (col("v") - pmod(col("v"), lit(ChainLen))))
        .count()
      val n = labels.count()
      val doneNanos = System.nanoTime()
      val secs = (doneNanos - t0) / 1e9
      killer.join(20000)
      val expected = ChainLen * Chains
      // a kill that never happened, or landed after completion, proves
      // nothing about churn survival — refuse the PASS (grow ChainLen
      // if the machine converges in under the killer's delay)
      if (killedAtNanos.get() == 0L || killedAtNanos.get() >= doneNanos) {
        println("[churn] VACUOUS: the executor kill did not land before " +
          s"job completion (killedAt=${killedAtNanos.get()}, " +
          s"done=$doneNanos) — no churn was exercised")
        sys.exit(2)
      }
      if (bad == 0L && n == expected)
        println(f"[churn] PASS: $n%d labels, 0 mismatches vs the chain " +
          f"oracle, $secs%.1f s with one executor killed " +
          f"${(doneNanos - killedAtNanos.get()) / 1e9}%.1f s before " +
          "completion (reliable binding)")
      else {
        println(s"[churn] FAIL: n=$n (expected $expected), mismatches=$bad")
        sys.exit(1)
      }
    } finally {
      spark.stop()
      // best-effort scrub of the checkpoint tree
      try {
        java.nio.file.Files.walk(ckptDir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }
    }
  }
}
