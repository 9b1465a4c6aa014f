package graft.jobs

import graft.operators.UpdateInPlace
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's linchpin job (`siri add-ride-durations`,
  * `open_bus_stride_etl/siri/add_ride_durations.py`) — everything
  * downstream gates on its progress marker. Reference shape: a 1+2N
  * query pattern (keyset batches of 1,000 rides, two point queries per
  * ride, ORM mutation, commit per batch — SURVEY.md §3.1). Here: ONE
  * distributed job — join, aggregate, expression, update-in-place.
  *
  * Declared semantics (SURVEY.md §2.4 A5/A6, §2.9 T2/T3, §7.4):
  *  - first/last vehicle location per ride by `recorded_at_time`
  *    (NULL times never win — the reference's NULLS LAST take-first);
  *    ties broken by location id (deterministic, unlike the reference);
  *  - duration only once the ride is surely over
  *    (`last < now − 6h` — the completion watermark);
  *  - rides still incomplete 2 days after their scheduled start give up
  *    with duration 0;
  *  - `updated_duration_minutes := now` marks progress ONLY when one of
  *    those branches fired — pending rides stay NULL, so the job is
  *    idempotent and re-runnable (the IS-NULL to-do predicate).
  */
object AddRideDurations {

  /** @param nowLit deterministic "now" (`YYYY-MM-DD HH:MM:SS` UTC) —
    *               the reference uses wall-clock; tests pin it.
    */
  def run(siriRide: DataFrame, siriRideStop: DataFrame,
          siriVehicleLocation: DataFrame, nowLit: String): DataFrame = {
    val now = lit(nowLit).cast("timestamp")

    // J5 collapse: locations ⋈ ride_stops → per-ride first/last in one
    // aggregation (min/max of (time, id) structs, map-side combined)
    val perRide = siriVehicleLocation
      .filter(col("recorded_at_time").isNotNull)
      .join(siriRideStop.select(col("id").as("srs_id"), col("siri_ride_id")),
        col("siri_ride_stop_id") === col("srs_id"))
      .groupBy(col("siri_ride_id"))
      .agg(
        min(struct(col("recorded_at_time"), col("id"))).as("f"),
        max(struct(col("recorded_at_time"), col("id"))).as("l"))
      .select(col("siri_ride_id"),
        col("f.id").as("new_first_vehicle_location_id"),
        col("l.id").as("new_last_vehicle_location_id"),
        col("f.recorded_at_time").as("_first_t"),
        col("l.recorded_at_time").as("_last_t"))

    val enriched = siriRide.alias("r")
      .join(perRide, col("r.id") === col("siri_ride_id"), "left")
    val durationReady = col("_last_t").isNotNull &&
      col("_last_t") < now - expr("INTERVAL 6 HOURS")
    val giveUp = col("r.scheduled_start_time") < now - expr("INTERVAL 2 DAYS")
    val enrichment = enriched.select(
      col("r.id").as("id"),
      col("new_first_vehicle_location_id"),
      col("new_last_vehicle_location_id"),
      when(durationReady,
        round((unix_micros(col("_last_t")) - unix_micros(col("_first_t"))) / 6e7)
          .cast("int"))
        .when(giveUp, 0)
        .as("new_duration_minutes"),
      when(col("_last_t").isNotNull, now)
        .as("new_updated_first_last_vehicle_locations"),
      when(durationReady || giveUp, now).as("new_updated_duration_minutes"))

    UpdateInPlace(siriRide, enrichment, Seq("id"))
  }
}
