package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * one JSON line of per-query seconds. Results are materialized through
  * a `noop`-format write — unlike `count()`, which lets Catalyst prune
  * every non-grouping column, noop forces full evaluation of the
  * declared output, so the numbers reflect real query work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus)
    // absorb session/codegen warmup outside the measured queries
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // min over iterations damps shared-host load noise (~±20% observed)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        // queries that persist() intermediates would otherwise accumulate
        // cache across the run and skew later timings
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
