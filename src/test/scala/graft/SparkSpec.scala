package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite run (getOrCreate reuses
  * it across suites in the same JVM; sbt forks one test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // Suite-log hygiene (r10 verdict item 5): the silenced warnings
    // are each backed by a mechanical gate — see LogHygiene's scaladoc
    // and WindowAuditSpec.
    LogHygiene.quietKnownWarnings()
    GraftSession.create("4")
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
