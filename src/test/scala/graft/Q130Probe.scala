package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Scratch breakdown of q130's cost (test scope): per-stage task times
  * for one q130 run, to locate where the ~30× gap between the raw
  * per-doc codec work (~45 ms at sf0.1, measured in a JVM microbench)
  * and the bench's ~6.7 task-s column lives.
  */
object Q130Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create("32")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = si.taskMetrics
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"run=${ms.executorRunTime / 1e3}%7.2fs cpu=${ms.executorCpuTime / 1e9}%7.2fs " +
          f"gc=${ms.jvmGCTime / 1e3}%6.2fs ser=${ms.resultSerializationTime / 1e3}%5.2fs " +
          s"name=${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    import graft.queries.MultimodalQueries
    // warmup
    MultimodalQueries.q118(spark, dir).write.format("noop").mode("overwrite").save()
    stages.clear()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      MultimodalQueries.q130(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[q130probe] iter $i wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      Thread.sleep(500)
      stages.forEach(println)
      stages.clear()
    }
    spark.stop()
  }
}
