package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite run (getOrCreate reuses
  * it across suites in the same JVM; sbt forks one test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // Suite-log hygiene (r10 verdict item 5): every unpartitioned
    // window in src/main runs over an audited bounded frame whose
    // inventory WindowAuditSpec pins — a NEW unpartitioned window
    // fails that spec instead of relying on a reader spotting one
    // more `No Partition Defined` WARN among hundreds of known ones.
    // Same DataSource rule as Bench (q56's `_centroids` skip).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
    GraftSession.create("4")
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
