package graft

import graft.expressions.FloatVectorDot
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native
  * expressions as SQL functions (`SELECT vec_dot(a, b)`), so the custom
  * codegen path is reachable from `spark.sql(...)` as well as the Column
  * API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))))
    // cosine as a pure catalyst tree over the native dot (builders must
    // not return Column-node wrappers), same null/zero-norm guard as
    // the Column API
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions._
        import org.apache.spark.sql.types.DoubleType
        val a = children(0)
        val b = children(1)
        val na = Sqrt(FloatVectorDot(a, a))
        val nb = Sqrt(FloatVectorDot(b, b))
        CaseWhen(
          Seq((Or(EqualTo(na, Literal(0.0)), EqualTo(nb, Literal(0.0))),
            Literal(null, DoubleType))),
          Some(Divide(FloatVectorDot(a, b), Multiply(na, nb))))
      }))
  }
}

/** Session factory applying the engine's recommended configuration —
  * what a cluster deployment would set once:
  *  - AQE on (default) with skew-join handling;
  *  - shuffle partitions sized to the local core count (a cluster sets
  *    this to 2-3× total cores; AQE coalesces the excess);
  *  - dynamic partition overwrite (the update-in-place write contract);
  *  - UTC session timezone (all local-time logic is explicit);
  *  - the graft SQL extensions.
  */
object GraftSession {
  def create(cpus: String): SparkSession = {
    // SPARK_GRAFT_RELIABLE=1 runs the harness mains under the CLUSTER
    // materialization profile (Materialize seam → reliable checkpoint
    // files instead of executor-local blocks) — the full-registry
    // parity gate for the binding a real deployment sets.
    val reliable = sys.env.get("SPARK_GRAFT_RELIABLE").contains("1")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — e.g.
    // `local-cluster[2,8,4096]` runs the same mains with executors as
    // SEPARATE processes (the multi-process parity gate; pair it with
    // SPARK_GRAFT_RELIABLE=1 for the full cluster profile). Executor
    // JVMs don't inherit the driver's classpath, so hand it over.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        System.getProperty("java.class.path")): Unit
    if (reliable) {
      builder.config(Materialize.ReliableConfKey, "true")
      builder.config(Materialize.CheckpointDirConfKey,
        sys.env.getOrElse("SPARK_GRAFT_CHECKPOINT_DIR",
          "/tmp/graft-reliable-ckpt"))
      // long-lived sessions: reclaim checkpoint FILES of GC'd frames
      // the way the ContextCleaner reclaims localCheckpoint blocks
      builder.config(
        "spark.cleaner.referenceTracking.cleanCheckpoints", "true"): Unit
    }
    val spark = builder
      // NOTE (round 10, measured): Spark's 4 MB file-open cost floors
      // the split size, so sub-4MB parquet tables scan as ONE
      // partition. Lowering the floor to 64 KB was tried and REVERTED:
      // it fixed the codec-bound media passes (q109 3.1→0.4 s) but
      // taxed all 200 queries with extra task-scheduling overhead
      // (+6 s total at sf0.1). The right fix is targeted — the media
      // generators repartition before their heavy per-row work
      // (MultimodalQueries.realPngMedia/realGifMedia) — not a global
      // knob whose cost lands on every tiny scan.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** The one definition of the harness-surface log silences (Bench,
  * Verify, the test session): loggers whose known-benign WARN spam
  * would bury the load-bearing output tail. Each silence is backed by
  * a mechanical gate that makes it safe: unpartitioned windows are
  * inventoried by WindowAuditSpec (a NEW site fails the test), and the
  * DataSource warning is q56's deliberate `_centroids` skip inside the
  * IVF index layout.
  */
object LogHygiene {
  def quietKnownWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
  }
}
