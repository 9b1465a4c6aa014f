package graft

import graft.jobs.StatsCollect
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dailyCounts covers every entity and sums to the table counts") {
    val stats = StatsCollect.dailyCounts(spark, sf)
    val byEntity = stats.groupBy("entity").agg(sum("n_rows").as("total"))
      .as[(String, Long)].collect().toMap
    assert(byEntity.keySet == Set("events", "orders", "lineitem"))
    assert(byEntity("events") ==
      Tables.events(spark, sf).filter($"ts".isNotNull).count())
    assert(byEntity("orders") == Tables.orders(spark, sf).count())
  }

  test("freshness gate passes near the data epoch and fails far after") {
    val (fresh, newest) = StatsCollect.validateFreshness(
      spark, sf, "2024-02-01 00:00:00", maxAgeHours = 72)
    assert(fresh && newest != null)
    val (stale, _) = StatsCollect.validateFreshness(
      spark, sf, "2024-06-01 00:00:00", maxAgeHours = 1)
    assert(!stale)
  }
}
