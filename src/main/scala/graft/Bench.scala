package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * one JSON line of per-query seconds. Results are materialized through
  * a `noop`-format write — unlike `count()`, which lets Catalyst prune
  * every non-grouping column, noop forces full evaluation of the
  * declared output, so the numbers reflect real query work.
  *
  * Two time axes per query (VERDICT r11 item 3):
  *  - '''wall''' seconds — end-to-end latency, what a user waits;
  *    sensitive to shared-host load (the r10/r11 drift rituals).
  *  - '''task''' seconds — sum of executor task run time over the
  *    query's stages, from a SparkListener; '''cpu''' seconds — sum of
  *    executor task CPU time. Task-time is insensitive to scheduling
  *    gaps between stages and cpu-time also to core contention, so
  *    round-over-round regressions adjudicate on these instead of
  *    re-running A/B probes in matched load windows.
  */
object Bench {

  /** Accumulates executor task run/CPU time across all stages, with a
    * sentinel-job drain: the listener bus is async, so after a query's
    * jobs complete we run a tiny marker job and wait for ITS JobEnd —
    * bus delivery is FIFO, so every task event of the measured query is
    * in by then. Sentinel tasks themselves are excluded by stage id.
    */
  /** Job-group prefix naming every listener-drain sentinel job. */
  private val SentinelGroupPrefix = "graft-bench-drain-"

  /** Loadavg above which a full-registry sweep counts as contaminated
    * (per-query numbers are load noise, not regressions — VERDICT r10/
    * r12 history at the gate below).
    */
  private val GateLoadMax = 1.5

  /** Max 60 s quiet-window waits before running contaminated anyway:
    * bounded so a busy host delays the sweep by ≤3 min, never starves
    * it (VERDICT r14 item 2).
    */
  private val GateWaits = 3

  /** Average EXTERNAL busy cores above which a sweep is contaminated
    * even when it STARTED quiet — the mid-sweep blind spot of VERDICT
    * r15 item 1: the r15 driver sweep started at loadavg 0.74, took a
    * co-tenant burst mid-sweep (end loadavg 2.00), read 108.3 s vs
    * the 62.9 s record, and stamped itself clean. The end LOADAVG
    * cannot be the signal — it counts the bench's own 32 runnable
    * threads (the committed clean 62.9 s record itself ended at 2.25),
    * so `max(start, end) > GateLoadMax` would stamp EVERY sweep
    * contaminated. Instead the sweep measures external CPU directly:
    * host busy jiffies (/proc/stat) minus this JVM's own jiffies
    * (/proc/self/stat), divided by the sweep's wall time — average
    * co-tenant cores, self-load excluded by construction. Host busy
    * includes STEAL (field 9), which is the dominant contaminant on
    * this VM: a physical-host co-tenant shows up as stolen vCPU
    * cycles that inflate task run-time while leaving cpu-time flat
    * (measured r16: a window with ext_load 0.96 read q166 at 14.0
    * task-s / 3.8 cpu-s vs 7.9 / 4.9 quiet — 1.8× task inflation).
    * Calibration on this host: quiet windows measure 0.03–0.1
    * external cores even under a full 32-wide burst; the r15/r16
    * co-tenant windows measure ~1.0. The threshold sits between the
    * two bands, nearer the clean one — task numbers were already
    * visibly inflated at 0.96.
    */
  private val ExtLoadMax = 0.5

  /** Linux USER_HZ — the /proc/stat and /proc/self/stat jiffy unit.
    * Fixed at 100 on every Linux ABI the JVM runs on (the kernel
    * scales internal HZ to USER_HZ=100 for /proc); only the RATIO of
    * two jiffy deltas over the same window feeds the stamp, so even a
    * wrong constant would cancel out of `extLoad`'s numerator and
    * only mis-scale it against wall time, which uses nanoTime.
    */
  private val UserHz = 100.0

  /** (host busy jiffies, this-process jiffies) — a matched snapshot
    * pair; callers diff two snapshots over the same wall window.
    * Host busy = user+nice+system+irq+softirq+steal (idle and iowait
    * are not work); self = utime+stime across ALL this JVM's threads
    * (executors, GC, JIT), parsed after the comm field's closing
    * paren so an exotic process name can't shift the columns. None on
    * any read/parse failure (non-Linux, locked-down /proc) — the
    * stamp then falls back to the start-loadavg-only signal.
    */
  private def cpuJiffies(): Option[(Long, Long)] =
    try {
      val stat = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = stat.trim.split("\\s+")
      // cpu  user nice system idle iowait irq softirq steal ...
      val busy = f(1).toLong + f(2).toLong + f(3).toLong +
        f(6).toLong + f(7).toLong + f(8).toLong
      // per-process jiffies: utime+stime of the process itself PLUS
      // cutime+cstime of its already-REAPED children (post-comm fields
      // 1-indexed from state: utime=12 stime=13 cutime=14 cstime=15 —
      // parsed after the comm paren so exotic names can't shift them).
      // A child alive at a snapshot is counted by the descendant walk
      // below and is NOT yet in cutime; once reaped it leaves the walk
      // and lands in cutime — the two sources never overlap, so the
      // sum is exact across child death between snapshots.
      def procJ(pid: Long): Long = {
        val s = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"/proc/$pid/stat"))
        val a = s.substring(s.lastIndexOf(')') + 2).split(" ")
        a(11).toLong + a(12).toLong + a(13).toLong + a(14).toLong
      }
      val me = ProcessHandle.current()
      var selfJ = procJ(me.pid)
      // SPARK_GRAFT_MASTER=local-cluster[...] forks worker + executor
      // JVMs as SEPARATE processes — their CPU is the bench's own work,
      // and counting it as host burn would stamp every local-cluster
      // sweep contaminated (r16 ADVICE). Sum all live descendants; a
      // process that exits mid-walk is skipped (its time surfaces via
      // its parent's cutime once reaped).
      me.descendants().forEach { d =>
        try selfJ += procJ(d.pid)
        catch { case _: Exception => () }
      }
      Some((busy, selfJ))
    } catch { case _: Exception => None }

  /** Steal jiffies alone (/proc/stat cpu field 8) — the hypervisor-
    * shorted share of [[cpuJiffies]]'s busy total, snapshotted
    * separately so the artifact can say WHICH kind of external burn
    * contaminated a window: `steal_load ≈ ext_load` is a physical-
    * host co-tenant regime (SCALE.md §34 — no in-VM remedy exists,
    * idle pre-samples are blind to it because an idle vCPU accrues
    * no steal), while `steal_load ≪ ext_load` is another process in
    * THIS VM (find and stop it). None on read failure.
    */
  private def stealJiffies(): Option[Long] =
    try {
      val stat = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      Some(stat.trim.split("\\s+")(8).toLong)
    } catch { case _: Exception => None }

  /** Average hypervisor-steal cores between two [[stealJiffies]]
    * snapshots over the same wall window. 0.0 on missing evidence.
    */
  private[graft] def stealLoad(start: Option[Long], end: Option[Long],
                               elapsedSec: Double): Double =
    (start, end) match {
      case (Some(s0), Some(s1)) if elapsedSec > 0 =>
        math.max(0.0, (s1 - s0) / UserHz / elapsedSec)
      case _ => 0.0
    }

  /** Average external busy cores between two [[cpuJiffies]] snapshots:
    * (Δhost busy − Δself) / HZ / elapsed. Clamped at 0 (scheduler
    * accounting granularity can put a tiny negative in the numerator
    * on an otherwise-idle host). 0.0 when either snapshot failed —
    * never contaminates on missing evidence.
    */
  private[graft] def externalLoad(start: Option[(Long, Long)],
                                  end: Option[(Long, Long)],
                                  elapsedSec: Double): Double =
    (start, end) match {
      case (Some((hb0, sj0)), Some((hb1, sj1))) if elapsedSec > 0 =>
        math.max(0.0, ((hb1 - hb0) - (sj1 - sj0)) / UserHz / elapsedSec)
      case _ => 0.0
    }

  /** The artifact's contamination stamp: loaded at the START (the
    * r10/r12 signal — external load the gate could see before the
    * bench added its own threads) OR external CPU burn DURING the
    * sweep (the r15 mid-sweep burst the start sample is blind to).
    */
  private[graft] def contaminatedStamp(loadStart: Double,
                                       extLoad: Double): Boolean =
    loadStart > GateLoadMax || extLoad > ExtLoadMax

  /** True iff writing this sweep to `BENCH_RESULT.json` would REPLACE a
    * clean artifact of record with a contaminated one — the refusal
    * rule of VERDICT r14 item 2: the r14 driver sweep ran at loadavg
    * 2.06 and overwrote the committed-clean working-tree artifact; the
    * honest `"contaminated":true` stamp saved the round, but the prior
    * clean artifact is strictly better evidence than a noisy rerun, so
    * a contaminated sweep now refuses the overwrite (its numbers still
    * go to stdout + bench_detail.json). The match is against the exact
    * byte sequence this writer emits (compact JSON, fixed key order) —
    * an existing file that is missing, unreadable, or already
    * contaminated is fair to replace. The clean record must also
    * describe the SAME lake (r15 ADVICE): a clean record for another
    * sf is not better evidence for THIS one, and refusing the
    * overwrite would leave the artifact describing the wrong dataset
    * — so a contaminated sweep over a new sf replaces it (honestly
    * stamped) rather than keeping a mismatched file. The sf match is
    * against the exact `"sf":"<dir>"` byte sequence this writer
    * emits.
    */
  private[graft] def keepExistingRecord(contaminated: Boolean,
                                        sf: String,
                                        existing: Option[String]): Boolean =
    contaminated && existing.exists(e =>
      e.contains("\"contaminated\":false") &&
        e.contains("\"sf\":\"" + sf + "\""))

  /** The one lake whose full sweeps are the artifact of record. Every
    * other lake (the /tmp sf0.5/sf1 replicas, ad-hoc dirs) is a
    * COMPANION measurement: the r16 end-of-round snapshot committed a
    * contaminated sf0.5 replica sweep as `BENCH_RESULT.json` because
    * the sf-match refusal rule (correct in itself) only protects a
    * clean record of the SAME lake — so a replica sweep always
    * replaced the record (VERDICT r16 item 1). Routing by lake closes
    * that: only sweeps of THIS lake can ever touch the record file.
    */
  private[graft] val RecordLake = "/root/testdata/sf0.1"

  /** The core count whose record-lake sweeps are the artifact of
    * record. The r17 driver ran its scaling sweep at 8 cores on the
    * record lake and — both sweeps clean, same lake — OVERWROTE the
    * committed 32-core 62.5 s record with a 74.7 s / 44.97 task-s
    * 8-core line (task-seconds are not even comparable across core
    * counts on this bandwidth-contended VM: identical work reads
    * 108.8 vs 45.0 total task-s at 32 vs 8 threads, SCALE.md §34).
    * Exactly the r16 lake-clobber class, one axis over (VERDICT r17
    * item 1) — so routing now keys on (lake, cpus), not lake alone.
    */
  private[graft] val RecordCpus = "32"

  /** Canonical form of a lake path: symlinks resolved when the path
    * exists, else absolute + `..`/`.`/trailing-slash normalized — so
    * `/root/testdata/sf0.1/`, `sf0.1` via a relative cwd, or a symlink
    * to the record lake all read as the SAME lake in both the routing
    * below and the `"sf"` byte-match in [[keepExistingRecord]]
    * (r16 ADVICE: exact byte equality defeated the clean-record
    * protection for aliased paths).
    */
  private[graft] def normalizeLake(dir: String): String = {
    val p = java.nio.file.Paths.get(dir)
    try p.toRealPath().toString
    catch { case _: Exception => p.toAbsolutePath.normalize.toString }
  }

  /** Artifact file for a full sweep of `sfDir` (already normalized) at
    * `cpus` cores: the record lake AT THE RECORD CORE COUNT writes
    * `BENCH_RESULT.json`; every other (lake, cpus) combination writes
    * `bench_profile_<slug>.json`, slugged from the full normalized
    * path so two replicas with the same basename in different parents
    * cannot collide, with a `_c<cpus>` suffix for non-record core
    * counts so a scaling sweep can never clobber the same lake's
    * record-width profile either (VERDICT r17 item 1).
    */
  private[graft] def recordArtifactPath(sfDir: String, cpus: String): String = {
    val cSuffix =
      if (cpus == RecordCpus) ""
      else "_c" + cpus.map(c => if (c.isLetterOrDigit) c else '-')
    if (normalizeLake(sfDir) == normalizeLake(RecordLake)) {
      if (cSuffix.isEmpty) "BENCH_RESULT.json"
      else s"bench_profile_record$cSuffix.json"
    } else {
      val slug = normalizeLake(sfDir).dropWhile(_ == '/')
        .map(c => if (c.isLetterOrDigit || c == '.' || c == '_') c else '-')
      s"bench_profile_$slug$cSuffix.json"
    }
  }

  private final class TaskTimeListener
      extends org.apache.spark.scheduler.SparkListener {
    private val runMs = new java.util.concurrent.atomic.AtomicLong
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong
    // spill diagnostics (VERDICT r17 item 6): task-summed memory/disk
    // spill bytes, so per-query spill lands in bench_detail.json and
    // an in-sweep-vs-solo gap can be attributed to memory pressure
    // from the artifact instead of a one-off UI session
    private val spillMem = new java.util.concurrent.atomic.AtomicLong
    private val spillDisk = new java.util.concurrent.atomic.AtomicLong
    private val sentinelStages =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    private val sentinelJobs =
      new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.CountDownLatch]()
    private val sentinelLatches =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CountDownLatch]()

    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val g = Option(e.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      // match by the stable PREFIX, not the latest drain's group: after
      // a drain timeout the next drain has already replaced the
      // bookkeeping, and an equality match would let the late
      // sentinel's own task leak into the NEXT query's counters
      if (g != null && g.startsWith(SentinelGroupPrefix)) {
        e.stageIds.foreach(sentinelStages.add(_): Unit)
        val l = sentinelLatches.get(g)
        if (l != null) sentinelJobs.put(e.jobId, l): Unit
      }
    }

    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val l = sentinelJobs.remove(e.jobId)
      if (l != null) l.countDown()
    }

    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (!sentinelStages.contains(e.stageId) && e.taskMetrics != null) {
        runMs.addAndGet(e.taskMetrics.executorRunTime): Unit
        cpuNs.addAndGet(e.taskMetrics.executorCpuTime): Unit
        spillMem.addAndGet(e.taskMetrics.memoryBytesSpilled): Unit
        spillDisk.addAndGet(e.taskMetrics.diskBytesSpilled): Unit
      }

    /** Flush pending events with a sentinel job, then return the
      * cumulative (taskSec, cpuSec) counters. Callers diff snapshots.
      */
    def drainAndRead(spark: SparkSession): (Double, Double) = {
      val sc = spark.sparkContext
      val group = s"$SentinelGroupPrefix${System.nanoTime()}"
      val l = new java.util.concurrent.CountDownLatch(1)
      sentinelLatches.put(group, l): Unit
      sc.setJobGroup(group, "bench listener drain", false)
      try sc.parallelize(Seq(1), 1).count(): Unit
      finally sc.clearJobGroup()
      // 10 s is orders of magnitude past any observed bus lag; on
      // timeout the numbers are still usable (at most one query's tail
      // events land in its successor — the prefix match above keeps
      // the late sentinel itself excluded), so don't fail the sweep
      if (!l.await(10, java.util.concurrent.TimeUnit.SECONDS))
        System.err.println("[bench] WARNING: listener drain timed out")
      sentinelLatches.remove(group): Unit
      (runMs.get / 1e3, cpuNs.get / 1e9)
    }

    /** Cumulative (memory, disk) spill bytes — same snapshot/diff
      * discipline as [[drainAndRead]]; callers read it right after a
      * drain so the async bus is already flushed.
      */
    def spillBytes(): (Long, Long) = (spillMem.get, spillDisk.get)
  }
  def main(args: Array[String]): Unit = {
    // normalized at the boundary so the "sf" stamp, the record-lake
    // routing, and keepExistingRecord's byte-match all see one spelling
    val sfDir = normalizeLake(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", RecordLake))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the stdout/stderr tail the harness JSON-parses the result from
    // must stay clean of the known-benign WARN spam (see LogHygiene)
    LogHygiene.quietKnownWarnings()
    // sample EXTERNAL load before the session + 32-thread warmup add
    // our own runnable threads to the 1-min average — the gate below
    // must measure the host, not the bench itself
    def loadAvg(): Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    var loadStart = loadAvg()
    // SPARK_GRAFT_BENCH_ONLY=q58,q99 runs a subset for regression
    // adjudication (quiet-window min-of-N probes); a probe run writes
    // bench_probe.json and NEVER touches BENCH_RESULT.json, which stays
    // the full-registry artifact of record the harness reads.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // 1-min system load average around the sweep: BENCH_r10.json was
    // taken in a loaded window (89.2 s vs 77.9–82.6 s quiet) and
    // manufactured ~20 phantom per-query regressions the judge had to
    // hand-adjudicate — the archived snapshot must self-describe its
    // noise conditions (VERDICT r10 item 3)
    // Loadavg GATE (VERDICT r12 item 6): three rounds running, the
    // driver's sweep landed in a loaded window (r12: loadavg 2.95 at
    // start, q114 6.8 s vs quiet 0.58) and the per-query history had to
    // be adjudicated from builder-side profile JSONs. For full-registry
    // runs, wait once for a quieter window; if it stays loaded, run
    // anyway but stamp the artifact contaminated so consumers know the
    // per-query numbers are load-noise, not regressions.
    // The whole gate (including the post-sleep re-sample) runs BEFORE
    // GraftSession.create + the 32-thread warmup: those add ~1.0 of
    // the bench's OWN runnable threads to the 1-min average, and a
    // re-sample taken after them would read that self-load as host
    // contamination — the opposite of "measure the host, not the
    // bench" the early first sample exists for (r13 ADVICE).
    // BOUNDED RETRY (VERDICT r14 item 2): one 60 s wait proved too
    // short against a multi-minute co-tenant burst (the r14 driver
    // sweep stamped contaminated after its single wait) — retry up to
    // GateWaits times, breaking early the moment a sample is quiet.
    if (only.isEmpty && loadStart > GateLoadMax &&
        !sys.env.get("SPARK_GRAFT_BENCH_NOGATE").contains("1")) {
      var waits = 0
      while (loadStart > GateLoadMax && waits < GateWaits) {
        waits += 1
        System.err.println(f"[bench] WARNING: start loadavg $loadStart%.2f > " +
          f"$GateLoadMax%.1f — waiting 60 s for a quieter window " +
          s"($waits/$GateWaits)")
        Thread.sleep(60000)
        loadStart = loadAvg()
      }
    }
    // the final stamp is computed AFTER the sweep (it also needs the
    // external-CPU burn of the window itself — VERDICT r15 item 1);
    // this early warning covers the start-load half of the signal
    if (loadStart > GateLoadMax)
      System.err.println(f"[bench] WARNING: sweep starts at loadavg " +
        f"$loadStart%.2f > $GateLoadMax%.1f — stamping " +
        "\"contaminated\":true; per-query times in this artifact are " +
        "not comparable across rounds")
    // matched host/self CPU snapshot for the mid-sweep burst signal:
    // taken BEFORE session creation so the window covers everything
    // the wall numbers cover (self-load is subtracted, so our own
    // warmup inside the window costs the signal nothing)
    val extT0 = System.nanoTime()
    val extSnap0 = cpuJiffies()
    val stealSnap0 = stealJiffies()
    val spark = GraftSession.create(cpus)
    val taskTimes = new TaskTimeListener
    spark.sparkContext.addSparkListener(taskTimes)
    // absorb session/codegen warmup outside the measured queries
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // min over iterations damps shared-host load noise; 3 (not 2)
    // because transient multi-second stalls were observed to hit the
    // SAME query on consecutive iterations right after a VM boot —
    // one extra sample cheaply shields the min from a single bad window
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(s => s.contains(n) || s.contains(n.takeWhile(_ != '_')))
    }
    // SPARK_GRAFT_BENCH_COLD=1 drops the QueryMemo before every query,
    // measuring STANDALONE cost for queries that normally ride shared
    // artifacts (cluster labels, signatures) built earlier in the sweep.
    val coldMode = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    def warmSignals(): Long =
      graft.queries.QueryMemo.hitCount +
        graft.queries.QueryMemo.externalHitCount
    // flush warmup task events so the first query's snapshot is clean
    var lastTaskSnap = taskTimes.drainAndRead(spark)
    var lastSpill = taskTimes.spillBytes()
    val results = selected.map { case (name, fn) =>
      val hits0 = warmSignals()
      val evict0 = graft.queries.QueryMemo.evictionCount
      val times = (1 to iters).map { _ =>
        // per-ITERATION clear: min-of-N must never pick an iteration
        // that rode an artifact the previous iteration MEMOIZED. The
        // persistent on-disk IVF index is deliberately NOT cleared
        // (it is shared infrastructure other JVMs may be probing, and
        // a production DAG adopts it exactly like this) — adoption is
        // instead surfaced through the warm tag via externalHitCount,
        // and the index's cold build cost is recorded in BASELINE.md.
        if (coldMode) graft.queries.QueryMemo.clearAll()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        // queries that persist() intermediates would otherwise accumulate
        // cache across the run and skew later timings
        spark.catalog.clearCache()
        val wall = (System.nanoTime() - t0) / 1e9
        // wall is captured FIRST: the drain's sentinel job (~ms) runs
        // outside the measured window and its own task is excluded
        val snap = taskTimes.drainAndRead(spark)
        val taskSec = snap._1 - lastTaskSnap._1
        val cpuSec = snap._2 - lastTaskSnap._2
        lastTaskSnap = snap
        val spill = taskTimes.spillBytes()
        val spillB = (spill._1 - lastSpill._1, spill._2 - lastSpill._2)
        lastSpill = spill
        (wall, taskSec, cpuSec, spillB._1, spillB._2)
      }
      // warm = at least one iteration was served a memoized frame OR
      // adopted a persistent artifact (the on-disk IVF index): either
      // way the recorded time is not the standalone cost a cold
      // session would pay (VERDICT r09 item 2)
      // each axis takes its own min — the iteration with the best wall
      // is not necessarily the one with the least task time
      // (spill takes the MAX: it is a pressure diagnostic, and the
      // worst iteration is the one that explains an inflated column)
      (name, times.map(_._1).min, warmSignals() > hits0,
        graft.queries.QueryMemo.evictionCount - evict0,
        times.map(_._2).min, times.map(_._3).min,
        times.map(_._4).max, times.map(_._5).max)
    }
    val loadEnd = loadAvg()
    val extWindowSec = (System.nanoTime() - extT0) / 1e9
    val extLoad = externalLoad(extSnap0, cpuJiffies(), extWindowSec)
    val stealAvg = stealLoad(stealSnap0, stealJiffies(), extWindowSec)
    val contaminated = contaminatedStamp(loadStart, extLoad)
    if (contaminated && loadStart <= GateLoadMax)
      System.err.println(f"[bench] WARNING: mid-sweep co-tenant burn " +
        f"averaged $extLoad%.2f external cores > $ExtLoadMax%.1f " +
        f"(steal $stealAvg%.2f of it) — " +
        "stamping \"contaminated\":true; the sweep started quiet but " +
        "its window was not (VERDICT r15 item 1)")
    // The machine-readable channel is the BENCH_RESULT.json file (six
    // rounds of stdout-tail parsing failures proved the sbt-prefixed
    // stdout channel dead — see the note at the write below); the
    // printed copy of the same line is display-only, so its ~2.9 KB
    // size (200 milli-rounded qNN entries + the warm array) carries no
    // truncation risk for the file consumer. Keys are the unique qNN
    // prefixes; the full-name, full-resolution map goes to the
    // bench_detail.json sidecar for round-over-round diffing.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // prefix-keying is only sound while qNN prefixes are unique — fail
    // loudly the day a q66_a/q66_b pair would silently collide
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == results.size,
      s"non-unique bench key prefixes: ${prefixes.diff(prefixes.distinct).mkString(",")}")
    val qs = results
      .map { case (k, v, _, _, _, _, _, _) => "\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val taskQs = results
      .map { case (k, _, _, _, t, _, _, _) => "\"" + k.takeWhile(_ != '_') + "\":" + r3(t) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val taskTotal = results.map(_._5).sum
    val cpuTotal = results.map(_._6).sum
    val detail = results.map { case (k, v, _, _, _, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val taskDetail = results.map { case (k, _, _, _, t, _, _, _) => "\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    val cpuDetail = results.map { case (k, _, _, _, _, c, _, _) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    // per-query MAX-iteration spill bytes (memory, disk), non-zero
    // entries only — the §5 pressure diagnostic behind in-sweep-vs-solo
    // gaps (VERDICT r17 item 6); detail-file only, the stdout line's
    // schema is untouched
    val spillDetail = results
      .collect { case (k, _, _, _, _, _, sm, sd) if sm > 0 || sd > 0 =>
        "\"" + k + "\":[" + sm + "," + sd + "]" }
      .mkString("{", ",", "}")
    // queries whose measured time rode a QueryMemo artifact built
    // earlier in the sweep — their entries are join-cost, not
    // standalone cost (cold numbers live in BASELINE.md)
    val warmList = results.collect { case (k, _, true, _, _, _, _, _) => k }
    val warmJson = warmList.map("\"" + _.takeWhile(_ != '_') + "\"")
      .mkString("[", ",", "]")
    val warmDetail = warmList.map("\"" + _ + "\"").mkString("[", ",", "]")
    // warm-excluded subtotal (r10 ADVICE): `value` mixes memo-hit time
    // with real speedups; a consumer comparing across rounds without
    // honoring the warm array should compare THIS number instead —
    // only queries that built everything they measured.
    val totalNonwarm = results.collect { case (_, v, false, _, _, _, _, _) => v }.sum
    // any mid-sweep LRU eviction means a shared artifact was silently
    // re-built inside a later consumer's measurement — the §21 cliff.
    // Flag it loudly; the zero-eviction invariant at MaxEntries is
    // pinned by MaterializeSpec's registry sweep test.
    val evictions = results.map(_._4).sum
    val evictedList = results.collect { case (k, _, _, e, _, _, _, _) if e > 0 => k }
    if (!coldMode && evictions > 0)
      System.err.println(s"[bench] WARNING: $evictions mid-sweep QueryMemo " +
        s"evictions (queries: ${evictedList.mkString(",")}) — per-query " +
        "times after the first eviction re-charge artifact builds to " +
        "later consumers; raise QueryMemo.MaxEntries")
    val evictedJson = evictedList.map("\"" + _ + "\"").mkString("[", ",", "]")
    def r2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // the sweep's core count, stamped on both artifacts so a record
    // can never be mistaken for (or replaced by) a sweep at another
    // width (VERDICT r17 item 1: task-seconds are not comparable
    // across core counts on this VM). JSON number when numeric, else
    // a quoted string — additions-only, the maps stay last.
    val cpusJson =
      if (cpus.nonEmpty && cpus.forall(_.isDigit)) cpus
      else "\"" + cpus.filter(c => c.isLetterOrDigit || c == '.') + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (only.isDefined) "bench_probe.json"
        // a COLD full sweep is a companion measurement (VERDICT r12
        // item 7), never the artifact of record — its own file, so it
        // can't shadow the normal sweep's bench_detail.json
        else if (coldMode) "bench_cold.json"
        else "bench_detail.json"),
      s"""{"total":$total,"total_nonwarm":$totalNonwarm,"task_total":$taskTotal,"cpu_total":$cpuTotal,"sf":"$sfDir","cpu_count":$cpusJson,"iters":$iters,"cold":$coldMode,"contaminated":$contaminated,"loadavg":[${r2(loadStart)},${r2(loadEnd)}],"ext_load":${r2(extLoad)},"steal_load":${r2(stealAvg)},"evictions":$evictions,"evicted":$evictedJson,"warm":$warmDetail,"spill_bytes":$spillDetail,"queries":$detail,"tasks":$taskDetail,"cpus":$cpuDetail}""")
    // FIELD ORDER IS LOAD-BEARING (VERDICT r12 "what's wrong"): the
    // harness archives a bounded stdout TAIL, and a truncated tail
    // recovers whichever per-query map sits nearest the end. Round 12
    // serialized "tasks" after "queries" and the archived tail silently
    // parsed to TASK-seconds where every earlier round's tail parsed to
    // wall — a cross-round diff trap. The wall "queries" map therefore
    // stays the LAST map on the line; "tasks" rides before it and the
    // full-resolution copies live in bench_detail.json.
    // "cold" rides the line too: a cold sweep never writes
    // BENCH_RESULT.json, but its stdout copy is schema-identical to a
    // normal sweep's — without the marker an archived tail could pass
    // ~2× cold totals off as the sweep of record
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","total_nonwarm":${r3(totalNonwarm)},"task_total":${r3(taskTotal)},"cpu_total":${r3(cpuTotal)},"iters":$iters,"cpus":$cpusJson,"cold":$coldMode,"contaminated":$contaminated,"loadavg":[${r2(loadStart)},${r2(loadEnd)}],"ext_load":${r2(extLoad)},"steal_load":${r2(stealAvg)},"evictions":$evictions,"sf":"$sfDir","warm":$warmJson,"tasks":$taskQs,"queries":$qs}"""
    // The harness JSON-parses the result from a bounded stdout tail that
    // sbt prefixes with "[info] " and interleaves with stderr — six
    // rounds of BENCH_r*.json.parsed=null prove that channel is not
    // machine-readable. The fixed-path file IS: byte-exact compact JSON,
    // no prefixes, overwritten per run (referenced from BASELINE.md).
    if (only.isEmpty && !coldMode) {
      // non-record (lake, cpus) combinations get their own file — a
      // replica-lake sweep must never clobber the sf0.1 artifact of
      // record (r16 item 1), and neither may a record-lake sweep at a
      // non-record core count (r17 item 1: the driver's clean 8-core
      // scaling sweep replaced the clean 32-core record)
      val artifact = recordArtifactPath(sfDir, cpus)
      val recordPath = java.nio.file.Paths.get(artifact)
      if (artifact != "BENCH_RESULT.json")
        System.err.println(s"[bench] NOTE: ($sfDir, $cpus cores) is not the " +
          s"record configuration ($RecordLake at $RecordCpus) — writing " +
          s"$artifact; BENCH_RESULT.json untouched")
      val existing =
        if (java.nio.file.Files.isReadable(recordPath))
          Some(java.nio.file.Files.readString(recordPath))
        else None
      if (keepExistingRecord(contaminated, sfDir, existing))
        System.err.println("[bench] WARNING: this sweep is contaminated and " +
          s"$artifact holds a CLEAN artifact of record — refusing the " +
          "overwrite; this sweep's numbers are on stdout and in " +
          "bench_detail.json (VERDICT r14 item 2)")
      else
        java.nio.file.Files.writeString(recordPath, line): Unit
    }
    println(line)
    spark.stop()
  }
}
