package graft

import java.sql.{Date, Timestamp}

import graft.jobs.{AddRideDurations, UpdateRidesGtfs}
import org.apache.spark.sql.DataFrame

/** Golden test of the domain jobs over the FIXTURES.md SIRI+GTFS
  * mini-lake, covering every scenario that file requires: rides with
  * 0/1/many locations, NULL recorded_at_time, watermark-held and
  * gave-up durations, exact / in-band / boundary / ambiguous GTFS
  * matches, journey-refs that do and don't reconstruct, and the
  * downstream gating marker.
  */
class SiriPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Now = "2024-03-12 12:00:00"

  // ---- fixtures ----
  // ride 1: many locations, complete (last < now-6h); journey-ref
  //   reconstructs to gtfs ride 101; exact start-time match to 102
  // ride 2: one location, complete; no journey match; TWO band
  //   candidates 2min away (103) and 4min away (104) → nearest=103
  // ride 3: zero locations, scheduled >2 days ago → gives up (duration 0)
  // ride 4: null-time location ignored; candidate exactly at the +5min
  //   band boundary (105) → NOT matched (the reference band is open:
  //   `> start - n AND < start + n`)
  // ride 5: last location <6h old → still pending; NOT gated into
  //   GTFS matching even though a candidate (106) exists
  // ride 6: late-night ride whose exact start-time match (107) sits in
  //   the NEXT DAY's GTFS version → J9's date..date+1 window finds it;
  //   the band match does not (it is same-date keyed)

  private def siriRoute: DataFrame = Seq(
    (10L, "op1", "line1"), (11L, "op1", "line2")
  ).toDF("id", "operator_ref", "line_ref")

  private def siriRide: DataFrame = Seq(
    (1L, 10L, "2024-03-10-17-3", ts("2024-03-10 08:00:00")),
    (2L, 10L, "2024-03-10-99-9", ts("2024-03-10 09:00:00")),
    (3L, 11L, "2024-03-09-17-4", ts("2024-03-09 07:00:00")),
    (4L, 11L, "2024-03-10-55-1", ts("2024-03-10 10:00:00")),
    (5L, 10L, "2024-03-12-17-5", ts("2024-03-12 07:30:00")),
    (6L, 10L, "2024-03-11-88-8", ts("2024-03-11 23:50:00"))
  ).toDF("id", "siri_route_id", "journey_ref", "scheduled_start_time")
    .withColumn("duration_minutes", org.apache.spark.sql.functions.lit(null).cast("int"))
    .withColumn("first_vehicle_location_id", org.apache.spark.sql.functions.lit(null).cast("long"))
    .withColumn("last_vehicle_location_id", org.apache.spark.sql.functions.lit(null).cast("long"))
    .withColumn("updated_first_last_vehicle_locations", org.apache.spark.sql.functions.lit(null).cast("timestamp"))
    .withColumn("updated_duration_minutes", org.apache.spark.sql.functions.lit(null).cast("timestamp"))
    .withColumn("gtfs_ride_id", org.apache.spark.sql.functions.lit(null).cast("long"))
    .withColumn("route_gtfs_ride_id", org.apache.spark.sql.functions.lit(null).cast("long"))
    .withColumn("journey_gtfs_ride_id", org.apache.spark.sql.functions.lit(null).cast("long"))
    .withColumn("scheduled_time_gtfs_ride_id", org.apache.spark.sql.functions.lit(null).cast("long"))

  private def siriRideStop: DataFrame = Seq(
    (21L, 1L), (22L, 2L), (23L, 3L), (24L, 4L), (25L, 5L), (26L, 6L)
  ).toDF("id", "siri_ride_id")

  private def siriVehicleLocation: DataFrame = Seq(
    // ride 1: 08:02 → 08:49 (47 min)
    (31L, 21L, Some(ts("2024-03-10 08:02:00"))),
    (32L, 21L, Some(ts("2024-03-10 08:20:00"))),
    (33L, 21L, Some(ts("2024-03-10 08:49:00"))),
    // ride 2: single point
    (34L, 22L, Some(ts("2024-03-10 09:15:00"))),
    // ride 4: null time ignored, valid pair 10:01→10:31
    (35L, 24L, None),
    (36L, 24L, Some(ts("2024-03-10 10:01:00"))),
    (37L, 24L, Some(ts("2024-03-10 10:31:00"))),
    // ride 5: recent (within 6h of Now) → watermark holds
    (38L, 25L, Some(ts("2024-03-12 07:35:00"))),
    // ride 6: complete (well before Now-6h)
    (39L, 26L, Some(ts("2024-03-11 23:52:00")))
  ).toDF("id", "siri_ride_stop_id", "recorded_at_time")

  private def gtfsRoute: DataFrame = Seq(
    (201L, Date.valueOf("2024-03-10"), "op1", "line1"),
    (202L, Date.valueOf("2024-03-10"), "op1", "line2"),
    (203L, Date.valueOf("2024-03-12"), "op1", "line1")
  ).toDF("id", "date", "operator_ref", "line_ref")

  private def gtfsRide: DataFrame = Seq(
    (101L, 201L, "17_100324", ts("2024-03-10 08:10:00")), // journey match (r1)
    (102L, 201L, "xx_999999", ts("2024-03-10 08:00:00")), // exact time (r1)
    (103L, 201L, "yy_999999", ts("2024-03-10 09:02:00")), // band 2min (r2)
    (104L, 201L, "zz_999999", ts("2024-03-10 08:56:00")), // band 4min (r2)
    (105L, 202L, "ww_999999", ts("2024-03-10 10:05:00")), // boundary +5min (r4)
    (106L, 203L, "vv_999999", ts("2024-03-12 07:30:00")), // r5's would-be match
    (107L, 203L, "uu_999999", ts("2024-03-11 23:50:00"))  // next-day version, exact (r6)
  ).toDF("id", "gtfs_route_id", "journey_ref", "start_time")

  private lazy val afterDurations =
    AddRideDurations.run(siriRide, siriRideStop, siriVehicleLocation, Now)
  private lazy val afterMatch =
    UpdateRidesGtfs.run(afterDurations, siriRoute, gtfsRide, gtfsRoute)

  test("durations: first/last, watermark, give-up, null handling") {
    val m = afterDurations.select(
      $"id", $"first_vehicle_location_id", $"last_vehicle_location_id",
      $"duration_minutes",
      $"updated_duration_minutes".isNotNull.as("done"))
      .as[(Long, Option[Long], Option[Long], Option[Int], Boolean)]
      .collect().map(r => r._1 -> r).toMap

    assert(m(1L) == ((1L, Some(31L), Some(33L), Some(47), true)))
    assert(m(2L) == ((2L, Some(34L), Some(34L), Some(0), true)))  // 1 point → 0 min
    assert(m(3L) == ((3L, None, None, Some(0), true)))            // gave up
    assert(m(4L) == ((4L, Some(36L), Some(37L), Some(30), true))) // null time ignored
    assert(m(5L) == ((5L, Some(38L), Some(38L), None, false)))    // pending
  }

  test("durations job is idempotent") {
    val again = AddRideDurations.run(afterDurations, siriRideStop,
      siriVehicleLocation, Now)
    val a = afterDurations.select($"id", $"duration_minutes", $"first_vehicle_location_id")
      .as[(Long, Option[Int], Option[Long])].collect().toSet
    val b = again.select($"id", $"duration_minutes", $"first_vehicle_location_id")
      .as[(Long, Option[Int], Option[Long])].collect().toSet
    assert(a == b)
  }

  test("gtfs matching: journey precedence, nearest band, boundary, gating") {
    val m = afterMatch.select(
      $"id", $"journey_gtfs_ride_id", $"route_gtfs_ride_id",
      $"gtfs_ride_id", $"scheduled_time_gtfs_ride_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap

    // ride 1: journey match 101 wins over band/exact 102 (J15 precedence)
    assert(m(1L)._2.contains(101L))
    assert(m(1L)._4.contains(101L))
    assert(m(1L)._5.contains(102L)) // exact start-time recorded separately
    // ride 2: no journey key → nearest band candidate (2 min beats 4 min)
    assert(m(2L) == ((2L, None, Some(103L), Some(103L), None)))
    // ride 3: gave up (duration done) but no candidates on line2/03-09
    assert(m(3L) == ((3L, None, None, None, None)))
    // ride 4: exactly AT the +5min boundary → open band excludes it
    assert(m(4L) == ((4L, None, None, None, None)))
    // ride 5: pending → gated out even though 106 would match
    assert(m(5L) == ((5L, None, None, None, None)))
    // ride 6: exact match found in the NEXT day's GTFS version (J9's
    // date..date+1 window); same-date band match correctly absent
    assert(m(6L) == ((6L, None, None, None, Some(107L))))
  }

  test("matching preserves row count and leaves non-participating columns") {
    assert(afterMatch.count() == 6)
    assert(afterMatch.columns.toSet == siriRide.columns.toSet)
  }
}
