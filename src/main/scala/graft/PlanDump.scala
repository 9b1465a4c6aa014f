package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev tool behind PLANS.md: prints `.explain("formatted")` for the
  * named queries (all queries when none are named) so plan-shape
  * regressions can be diffed. Usage:
  * `runMain graft.PlanDump <sfDir> [queryName...]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
