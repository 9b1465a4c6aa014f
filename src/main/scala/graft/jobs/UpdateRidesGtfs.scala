package graft.jobs

import graft.functions.TimeFunctions
import graft.operators.{BandJoin, UpdateInPlace}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SIRI↔GTFS ride matching (`siri update-rides-gtfs`,
  * `open_bus_stride_etl/siri/update_rides_gtfs.py`) — the reference runs
  * four `UPDATE … FROM` passes per date (journey-ref match, ±1/±3/±5-min
  * band cascade with ARBITRARY pick, FK resolution, exact-time match).
  * Here each match is one distributed join with DECLARED deterministic
  * arbitration (SURVEY.md §7.4):
  *
  *  - journey match (J8): `gtfs_ride.journey_ref` equals the key
  *    reconstructed from `siri_ride.journey_ref` (F3's 1-based
  *    split_part → 0-based split, century dropped), route+date keyed;
  *    ties → smallest gtfs_ride id;
  *  - band match (J7): nearest `start_time` within ±5 min on the same
  *    (operator_ref, line_ref, date) — one join replaces the cascade
  *    (anything matched at ±1 is also the global nearest within ±5);
  *    ties → smallest id;
  *  - resolution (J15): `gtfs_ride_id := coalesce(journey, route)` —
  *    journey-match wins, same precedence the reference reaches by
  *    running the journey UPDATE last;
  *  - exact match (J9): `scheduled_start_time = start_time`, ties →
  *    smallest id;
  *  - gate (T4): only rides with `updated_duration_minutes IS NOT NULL`
  *    (data-complete) and no prior match participate.
  */
object UpdateRidesGtfs {

  def run(siriRide: DataFrame, siriRoute: DataFrame,
          gtfsRide: DataFrame, gtfsRoute: DataFrame): DataFrame = {
    // candidate GTFS rides with their route identity, version-keyed
    val gtfs = gtfsRide.alias("gr")
      .join(gtfsRoute.alias("gro"), col("gr.gtfs_route_id") === col("gro.id"))
      .select(col("gr.id").as("g_id"), col("gr.journey_ref").as("g_journey_ref"),
        col("gr.start_time").as("g_start"),
        col("gro.operator_ref").as("g_op"), col("gro.line_ref").as("g_line"),
        col("gro.date").as("g_date"))

    // gated SIRI rides with route identity + derived keys
    val rides = siriRide.alias("sr")
      .filter(col("sr.updated_duration_minutes").isNotNull &&
        col("sr.gtfs_ride_id").isNull)
      .join(siriRoute.alias("rt"), col("sr.siri_route_id") === col("rt.id"))
      .select(col("sr.id").as("s_id"),
        col("sr.scheduled_start_time").as("s_start"),
        to_date(col("sr.scheduled_start_time")).as("s_date"),
        TimeFunctions.journeyRefKey(col("sr.journey_ref")).as("s_jkey"),
        col("rt.operator_ref").as("s_op"), col("rt.line_ref").as("s_line"))

    val routeKeys = col("s_op") === col("g_op") &&
      col("s_line") === col("g_line") && col("s_date") === col("g_date")

    // J8 — journey-ref match, smallest candidate id on ties. The
    // reference's journey UPDATE constrains ONLY the reconstructed ref
    // and the GTFS version date (`update_rides_gtfs.py:70-79`) — no
    // operator/line equality — so neither do we.
    val journeyMatch = rides.join(gtfs,
        col("s_date") === col("g_date") && col("s_jkey") === col("g_journey_ref"))
      .groupBy(col("s_id").as("j_sid"))
      .agg(min(col("g_id")).as("new_journey_gtfs_ride_id"))

    // J7 — single ±5-min band join, nearest start_time, id tiebreak
    val bandMatch = BandJoin.nearestWithin(
        rides, gtfs.withColumnRenamed("g_start", "g_ts"),
        equiKeys = Seq.empty, leftTs = "s_start", rightTs = "g_ts",
        toleranceSec = 5 * 60, leftId = "s_id", rightTieBreak = "g_id",
        extraCond = Some(routeKeys))
      .select(col("s_id").as("b_sid"), col("g_id").as("new_route_gtfs_ride_id"))

    // J9 — exact scheduled-time match. The reference accepts the GTFS
    // version of the ride's date OR the next day
    // (`gtfs_route.date between '{start_date}' and '{end_date}'` with
    // end = start + 1, `update_rides_gtfs.py:30-44,115-119`) so
    // late-night rides can match a next-day GTFS publication.
    val exactMatch = rides.join(gtfs,
        col("s_op") === col("g_op") && col("s_line") === col("g_line") &&
          col("g_date").between(col("s_date"), date_add(col("s_date"), 1)) &&
          col("s_start") === col("g_start"))
      .groupBy(col("s_id").as("e_sid"))
      .agg(min(col("g_id")).as("new_scheduled_time_gtfs_ride_id"))

    val enrichment = rides.select(col("s_id").as("id"))
      .join(journeyMatch, col("id") === col("j_sid"), "left")
      .join(bandMatch, col("id") === col("b_sid"), "left")
      .join(exactMatch, col("id") === col("e_sid"), "left")
      .select(col("id"),
        col("new_journey_gtfs_ride_id"),
        col("new_route_gtfs_ride_id"),
        col("new_scheduled_time_gtfs_ride_id"),
        // J15 precedence: journey-match overwrites route-match
        coalesce(col("new_journey_gtfs_ride_id"), col("new_route_gtfs_ride_id"))
          .as("new_gtfs_ride_id"))

    UpdateInPlace(siriRide, enrichment, Seq("id"))
  }
}
