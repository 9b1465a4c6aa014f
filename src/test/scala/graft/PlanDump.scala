package graft

import java.nio.file.{Files, Paths}

/** Scratch plan dumper (test scope): writes `.explain("formatted")` of
  * the named queries to a file, for refreshing PLANS.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dir = args(1)
    val names = args.drop(2)
    val spark = GraftSession.create("8")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      sb.append(s"## $n\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n```\n\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
