package graft

/** Scratch profiling entry (test scope, not part of the library):
  * runs one named query in a loop against a given sf dir so the JVM
  * can be thread-dumped / timed in isolation.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.create("32")
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(s"[probe] $name iter $i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
