package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned lake layout — the 100 TB shape of the engine's
  * tables (SURVEY.md §1.3/§7.1): fact tables directory-partitioned by
  * their natural event-date key (`siri_vehicle_location` by
  * `recorded_at_time`'s date, here `events` by `to_date(ts)`), versioned
  * dimensions by their version `date` (gtfs_*). Every time-range
  * predicate then prunes at the DIRECTORY level before any file is
  * opened — the distributed equivalent of the reference's per-(date,
  * route) manual work units (`siri/common.py:8-39`), without the
  * driver-side loop.
  *
  * The flat single-file testdata layout stays the default for the
  * oracle gate (DuckDB reads the same files); this module is the
  * deployment layout, proven by LakeSpec's PartitionFilters assertions.
  */
object Lake {

  /** Materialize a fact table partitioned by the date of `tsCol`.
    * Files within a partition are sorted by (tsCol, idCol) so range
    * scans read sequentially and min/max row-group stats stay tight.
    */
  def writeFactByDay(df: DataFrame, tsCol: String, idCol: String,
                     path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .repartition(col("p_date"))
      .sortWithinPartitions(col("p_date"), col(tsCol), col(idCol))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  def readFact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Day-range scan: both bounds land on the partition column, so the
    * scan's PartitionFilters prune every out-of-range directory.
    */
  def scanDays(spark: SparkSession, path: String,
               fromDay: String, untilDay: String): DataFrame =
    readFact(spark, path)
      .filter(col("p_date") >= lit(fromDay) && col("p_date") < lit(untilDay))
}
