package graft.jobs

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational stats + freshness validation (SURVEY.md §2.4 A3/A4, §5):
  * the reference's `stats collect --validate` counts rows per entity per
  * day window and fails the run when the newest snapshot is older than
  * one hour (`stats/api.py:46-79,102-114`) — its only runtime health
  * gate. Here: one aggregation per table, union'd into a long-form stats
  * frame, plus the same freshness predicate returned as a value (the
  * caller decides the exit code).
  */
object StatsCollect {

  /** Long-form daily counts: (entity, day, n_rows). One job per table,
    * each a single partial-agg shuffle.
    */
  def dailyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    def count1(table: String, tsCol: String): DataFrame =
      Tables.load(spark, sfDir, table)
        .filter(col(tsCol).isNotNull)
        .groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(table).as("entity"), col("day"), col("n_rows"))
    count1("events", "ts")
      .unionByName(count1("orders", "o_orderdate"))
      .unionByName(count1("lineitem", "l_shipdate"))
  }

  /** Freshness gate: newest event within `maxAgeHours` of `now`.
    * Returns (fresh?, newest-ts) — the reference exits nonzero on stale
    * (`stats/api.py:108-114`).
    */
  def validateFreshness(spark: SparkSession, sfDir: String,
                        nowLit: String, maxAgeHours: Int): (Boolean, java.sql.Timestamp) = {
    val row = Tables.events(spark, sfDir)
      .agg(max(col("ts")).as("newest"))
      .select(col("newest"),
        (col("newest") >= lit(nowLit).cast("timestamp")
          - expr(s"INTERVAL $maxAgeHours HOURS")).as("fresh"))
      .head()
    (row.getBoolean(1), row.getTimestamp(0))
  }
}
