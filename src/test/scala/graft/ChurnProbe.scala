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

  def main(args: Array[String]): Unit = {
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
      // finishes — record both instants and assert the order below
      val killedAtNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val killer = new Thread(() => {
        // wait for executors to register and the first rounds to run,
        // then hard-kill one executor process
        Thread.sleep(15000)
        val victims = ProcessHandle.current().descendants()
          .filter(p => p.info().commandLine
            .map[Boolean](_.contains("CoarseGrainedExecutorBackend"))
            .orElse(false))
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
      killer.setDaemon(true)
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
