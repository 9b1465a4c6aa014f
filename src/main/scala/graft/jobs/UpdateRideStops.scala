package graft.jobs

import graft.functions.GeoFunctions
import graft.operators.UpdateInPlace
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two ride-stop enrichment tasks
  * (`open_bus_stride_etl/siri/update_ride_stops_gtfs.py` and
  * `update_ride_stops_vehicle_locations.py`), each a per-(date, route)
  * Python loop with UPDATE batches in the reference — here one
  * distributed job each.
  */
object UpdateRideStops {

  /** Stop-code match (J10): fill `siri_ride_stop.gtfs_stop_id` by
    * joining `siri_stop.code = gtfs_stop.code` on the ride's date (the
    * GTFS version key). Gate (T4): the ride must be data-complete
    * (`updated_duration_minutes IS NOT NULL`); only NULL `gtfs_stop_id`
    * rows participate (P2's to-do predicate). Ties (same code loaded
    * twice for a date) resolve to the smallest gtfs_stop id.
    */
  def matchStopsGtfs(siriRideStop: DataFrame, siriStop: DataFrame,
                     siriRide: DataFrame, gtfsStop: DataFrame): DataFrame = {
    val gated = siriRideStop.alias("srs")
      .filter(col("srs.gtfs_stop_id").isNull)
      .join(siriRide.alias("sr"),
        col("srs.siri_ride_id") === col("sr.id") &&
          col("sr.updated_duration_minutes").isNotNull)
      .join(siriStop.alias("ss"), col("srs.siri_stop_id") === col("ss.id"))
      .select(col("srs.id").as("srs_id"), col("ss.code").as("s_code"),
        to_date(col("sr.scheduled_start_time")).as("ride_date"))
    val enrichment = gated
      .join(gtfsStop.alias("gs"),
        col("s_code") === col("gs.code") && col("ride_date") === col("gs.date"))
      .groupBy(col("srs_id"))
      .agg(min(col("gs.id")).as("new_gtfs_stop_id"))
      .withColumnRenamed("srs_id", "id")
    UpdateInPlace(siriRideStop, enrichment, Seq("id"))
  }

  /** Nearest vehicle location per matched stop (J11 + A7 + F2): for
    * each ride stop with a matched GTFS stop, the vehicle location of
    * the SAME RIDE minimizing haversine distance to the stop's
    * coordinates; ties → smallest location id. Also fills every
    * location's `distance_from_siri_ride_stop_meters` (whole meters,
    * HALF_UP — F5's declared rounding) against its OWN stop. Invalid /
    * missing coordinates yield NULL distance and never win the argmin
    * (the reference's try/except→None path).
    */
  def nearestLocations(siriRideStop: DataFrame, siriVehicleLocation: DataFrame,
                       gtfsStop: DataFrame): DataFrame = {
    // matched stops with their coordinates
    val stops = siriRideStop.alias("srs")
      .filter(col("srs.gtfs_stop_id").isNotNull)
      .join(gtfsStop.alias("gs"), col("srs.gtfs_stop_id") === col("gs.id"))
      .select(col("srs.id").as("stop_srs_id"),
        col("srs.siri_ride_id").as("ride_id"),
        col("gs.lat").as("stop_lat"), col("gs.lon").as("stop_lon"))

    // every location of the ride (via its own ride stop)
    val rideLocations = siriVehicleLocation.alias("svl")
      .join(siriRideStop.alias("own"),
        col("svl.siri_ride_stop_id") === col("own.id"))
      .select(col("svl.id").as("loc_id"),
        col("own.siri_ride_id").as("ride_id"),
        col("svl.siri_ride_stop_id").as("own_srs_id"),
        col("svl.lat").as("loc_lat"), col("svl.lon").as("loc_lon"))

    val dist = GeoFunctions.haversineMeters(
      col("loc_lat"), col("loc_lon"), col("stop_lat"), col("stop_lon"))

    // A7 argmin: every stop × its ride's locations, min (distance, id)
    val nearest = stops.join(rideLocations, Seq("ride_id"))
      .withColumn("d", dist)
      .filter(col("d").isNotNull)
      .groupBy(col("stop_srs_id").as("id"))
      .agg(min(struct(col("d"), col("loc_id"))).as("m"))
      .select(col("id"), col("m.loc_id").as("new_nearest_siri_vehicle_location_id"))
    UpdateInPlace(siriRideStop, nearest, Seq("id"))
  }

  /** Per-location distance to its own matched stop, whole meters. */
  def locationDistances(siriRideStop: DataFrame, siriVehicleLocation: DataFrame,
                        gtfsStop: DataFrame): DataFrame = {
    val enrichment = siriVehicleLocation.alias("svl")
      .join(siriRideStop.alias("srs"),
        col("svl.siri_ride_stop_id") === col("srs.id") &&
          col("srs.gtfs_stop_id").isNotNull)
      .join(gtfsStop.alias("gs"), col("srs.gtfs_stop_id") === col("gs.id"))
      .select(col("svl.id").as("id"),
        round(GeoFunctions.haversineMeters(
          col("svl.lat"), col("svl.lon"), col("gs.lat"), col("gs.lon")))
          .cast("int").as("new_distance_from_siri_ride_stop_meters"))
    UpdateInPlace(siriVehicleLocation, enrichment, Seq("id"))
  }
}
