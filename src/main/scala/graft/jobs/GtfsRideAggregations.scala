package graft.jobs

import graft.operators.UpdateInPlace
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GTFS ride aggregations (`open_bus_stride_etl/gtfs/
  * update_ride_aggregations.py`): per planned ride, the first/last stop
  * by `stop_sequence` and the derived start/end times (A8) — the
  * reference sorts each ride's stops in Python; here one struct min/max
  * aggregation. The ≥90% completeness re-check (A4, `:58-74`) is
  * returned per date for the caller's ledger decision (T5 —
  * `sources/TaskLedger` drives the catch-up loop).
  */
object GtfsRideAggregations {

  /** Fill `first/last_gtfs_ride_stop_id`, `start_time`, `end_time`.
    * Rides with no stops keep NULLs (the reference's explicit
    * empty→NULL branch). Ties on `stop_sequence` → smallest stop id.
    */
  def run(gtfsRide: DataFrame, gtfsRideStop: DataFrame): DataFrame = {
    val perRide = gtfsRideStop
      .groupBy(col("gtfs_ride_id"))
      .agg(min(struct(col("stop_sequence"), col("id"), col("departure_time"))).as("f"),
        max(struct(col("stop_sequence"), col("id"), col("arrival_time"))).as("l"))
      .select(col("gtfs_ride_id").as("id"),
        col("f.id").as("new_first_gtfs_ride_stop_id"),
        col("l.id").as("new_last_gtfs_ride_stop_id"),
        col("f.departure_time").as("new_start_time"),
        col("l.arrival_time").as("new_end_time"))
    UpdateInPlace(gtfsRide, perRide, Seq("id"))
  }

  /** A4's zero-guarded completeness ratio per route date: percentage of
    * rides carrying both start and end times; a date is "missing" (needs
    * re-processing) below `minPct`.
    */
  def completeness(gtfsRide: DataFrame, gtfsRoute: DataFrame,
                   minPct: Double = 90.0): DataFrame =
    gtfsRide.alias("gr")
      .join(gtfsRoute.alias("gro"), col("gr.gtfs_route_id") === col("gro.id"))
      .groupBy(col("gro.date").as("date"))
      .agg(count(lit(1)).as("n_rides"),
        (when(count(lit(1)) === 0, 0.0).otherwise(
          count(when(col("gr.start_time").isNotNull &&
            col("gr.end_time").isNotNull, 1)) * 100.0 / count(lit(1))))
          .as("pct_complete"))
      .withColumn("is_missing", col("pct_complete") < minPct)
}
