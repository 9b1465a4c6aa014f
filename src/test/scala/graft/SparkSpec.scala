package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite run (getOrCreate reuses
  * it across suites in the same JVM; sbt forks one test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.create("4")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
