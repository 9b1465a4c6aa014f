package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's single materialization seam: every place that used to
  * call `Dataset.localCheckpoint()` directly (memoized shared
  * artifacts, iterative-operator rounds, multi-consumer intermediates)
  * now goes through [[frame]] / the [[Ops.materialize]] extension, so
  * the binding is a DEPLOYMENT choice instead of 100 hard-coded calls.
  *
  * Two bindings:
  *
  *  - '''default''' — `localCheckpoint()`: truncates lineage into
  *    executor-local MEMORY_AND_DISK blocks. Free on `local[*]` and the
  *    right choice there, but on a real cluster an executor loss
  *    permanently destroys those blocks, and with lineage truncated the
  *    consumer job FAILS rather than recomputes (the r10 verdict's #1
  *    structural risk; MaterializeSpec reproduces the failure by
  *    dropping the blocks).
  *  - '''reliable''' — `checkpoint()` when the session conf
  *    `spark.graft.reliableCheckpoint=true`: writes the partitions to
  *    the checkpoint directory (HDFS/object store on a cluster), so a
  *    lost executor re-reads files instead of dying. The directory
  *    comes from `spark.graft.checkpointDir` (set lazily on the
  *    SparkContext on first use; an explicit
  *    `sparkContext.setCheckpointDir` beforehand wins). Enable
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` in
  *    long-lived sessions so checkpoint files of GC'd frames are
  *    reclaimed like local blocks are.
  *
  * Both bindings are EAGER (they run the job at the call site) —
  * callers rely on that for accumulator-based convergence checks
  * (ConnectedComponents) and for charging build cost to the producing
  * query rather than the first consumer (QueryMemo artifacts).
  */
object Materialize {

  /** Session conf key selecting the reliable binding. Read per call —
    * a RuntimeConfig lookup, so a test can flip bindings mid-session.
    */
  val ReliableConfKey = "spark.graft.reliableCheckpoint"

  /** Session conf key naming the reliable checkpoint directory; used
    * only when the SparkContext has no checkpoint dir set yet.
    */
  val CheckpointDirConfKey = "spark.graft.checkpointDir"

  /** Materialize `ds` under the session's configured binding. */
  def frame[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    if (reliable(spark)) {
      ensureCheckpointDir(spark)
      ds.checkpoint()
    } else ds.localCheckpoint()
  }

  private def reliable(s: SparkSession): Boolean =
    s.conf.getOption(ReliableConfKey).exists(_.equalsIgnoreCase("true"))

  /** Serializes the first-use check-then-set: QueryMemo runs builds on
    * concurrent threads, and two racing first materializations would
    * otherwise BOTH call setCheckpointDir (each minting a UUID subdir
    * — the loser's would never be cleaned) and register duplicate
    * cleanup listeners.
    */
  private val ckptDirLock = new Object

  private def ensureCheckpointDir(s: SparkSession): Unit = ckptDirLock.synchronized {
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = s.conf
        .getOption(CheckpointDirConfKey)
        .getOrElse(new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          "graft-checkpoints").getPath)
      sc.setCheckpointDir(dir)
      // setCheckpointDir creates a per-APPLICATION UUID subdir under
      // `dir`, and cleanCheckpoints reclaims only frames GC'd during
      // the app's lifetime — frames still referenced at shutdown would
      // leak their files forever (r11 ADVICE). The app's own subdir is
      // garbage once the app ends (checkpoint files are not readable
      // across applications), so delete it best-effort at application
      // end. Registered only when WE chose the dir: a caller that set
      // an explicit checkpoint dir beforehand owns its lifecycle.
      sc.getCheckpointDir.foreach(registerAppEndCleanup(sc, _))
    }
  }

  private def registerAppEndCleanup(
      sc: org.apache.spark.SparkContext, appDir: String): Unit =
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
        deleteRecursively(appDir, sc.hadoopConfiguration)
    })

  /** Best-effort recursive delete through the Hadoop FS API (works for
    * local paths and object stores alike); failures are swallowed — a
    * leftover checkpoint dir must never fail a shutdown. Deliberately
    * NOT `ObjectStore.deleteRecursively` (the `java.io.File` one copy
    * for local lake paths): a checkpoint dir can be an `hdfs://`/`s3a`
    * URI only the Hadoop FS API can resolve, and shutdown must swallow
    * every failure where lake deletes must not.
    */
  private[graft] def deleteRecursively(
      dir: String, conf: org.apache.hadoop.conf.Configuration): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).delete(p, true): Unit
    } catch { case _: Throwable => () }

  /** `ds.materialize()` — the fluent spelling used at every call site. */
  implicit final class Ops[T](private val ds: Dataset[T]) extends AnyVal {
    def materialize(): Dataset[T] = frame(ds)
  }
}
