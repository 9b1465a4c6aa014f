package graft

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

import graft.jobs.SiriPackager
import graft.runner.Main
import org.apache.spark.sql.functions.lit

class PackagerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // one complete ride (two locations 08:05/08:20 UTC = 10:05/10:20
  // Israel winter time) and one pending ride excluded by the gate
  private val siriRoute = Seq((10L, "op1", "line1"))
    .toDF("id", "operator_ref", "line_ref")
  private val siriRide = Seq(
    (1L, 10L, "2024-03-10-17-3", "v1", ts("2024-03-10 08:00:00"),
      Some(47), Some(ts("2024-03-10 12:00:00")), Some(101L)),
    (2L, 10L, "2024-03-10-17-4", "v2", ts("2024-03-10 08:30:00"),
      None, None, None)
  ).toDF("id", "siri_route_id", "journey_ref", "vehicle_ref",
    "scheduled_start_time", "duration_minutes", "updated_duration_minutes",
    "gtfs_ride_id")
  private val siriStop = Seq((41L, "S100")).toDF("id", "code")
  private val siriRideStop = Seq(
    (21L, 1L, 41L, 1, Some(301L)), (22L, 2L, 41L, 1, None)
  ).toDF("id", "siri_ride_id", "siri_stop_id", "order", "gtfs_stop_id")
  private val siriSnapshot = Seq((61L, "2024/03/10/08/05"))
    .toDF("id", "snapshot_id")
  private val siriVehicleLocation = Seq(
    (51L, 21L, 61L, ts("2024-03-10 08:05:00"), 32.08, 34.78, 40, 180, 100),
    (52L, 21L, 61L, ts("2024-03-10 08:20:00"), 32.09, 34.78, 42, 181, 900),
    (53L, 22L, 61L, ts("2024-03-10 08:10:00"), 32.10, 34.78, 41, 182, 500)
  ).toDF("id", "siri_ride_stop_id", "siri_snapshot_id", "recorded_at_time",
    "lat", "lon", "velocity", "bearing", "distance_from_journey_start")
  private val gtfsRide = Seq((101L, "17_100324", ts("2024-03-10 08:10:00")))
    .toDF("id", "journey_ref", "start_time")
  private val gtfsStop = Seq(
    (301L, Date.valueOf("2024-03-10"), "S100", 32.0853, 34.7818, "תל אביב", "דיזנגוף"))
    .toDF("id", "date", "code", "lat", "lon", "city", "name")

  private def export = SiriPackager.exportRows(
    siriVehicleLocation, siriRideStop, siriRide, siriStop, siriRoute,
    siriSnapshot, gtfsRide, gtfsStop)

  test("export joins the chain, gates incomplete rides, pads dim dates") {
    val rows = export.collect()
    assert(rows.length == 2) // ride 2's location gated out
    val first = export.filter($"vehicle_location_id" === 51L).head()
    assert(first.getAs[String]("stop_city") == "תל אביב") // UTF-8 survives
    assert(first.getAs[String]("gtfs_journey_ref") == "17_100324")
  }

  test("normalizer: nulls to empty strings, Israel-local timestamps") {
    val n = SiriPackager.normalized(
      export.withColumn("duration_minutes", lit(null).cast("int")))
    val r = n.filter($"vehicle_location_id" === "51").head()
    assert(r.getAs[String]("duration_minutes") == "")
    assert(r.getAs[String]("recorded_at_time") == "2024-03-10 10:05:00") // UTC+2
    assert(n.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("hourly package: deterministic content, hash-skip on re-run") {
    val dir = Files.createTempDirectory("graft_pack").toString
    val r1 = SiriPackager.packageHour(spark, export, "2024-03-10.10", dir)
    assert(!r1.skipped && r1.rows == 2)
    assert(Files.exists(Paths.get(s"$dir/2024-03-10.10.zip")))
    val r2 = SiriPackager.packageHour(spark, export, "2024-03-10.10", dir,
      priorHash = Some(r1.sha256))
    assert(r2.skipped && r2.sha256 == r1.sha256) // byte-identical re-export
    // an hour with no rows still packages (empty csv, different hash)
    val r3 = SiriPackager.packageHour(spark, export, "2024-03-10.23", dir)
    assert(!r3.skipped && r3.rows == 0 && r3.sha256 != r1.sha256)
  }

  test("runner arg parsing: None-string sanitation, defaults, registry") {
    val a = Main.parse(Array("stats-collect", "--min-date", "None",
      "--max-date", "2024-01-05", "--num-days", "4"))
    assert(a.minDate.isEmpty && a.maxDate.contains("2024-01-05") && a.numDays == 4)
    assert(Main.parse(Array("stats-validate")).numDays == 1)
    assert(Main.parse(Array("run-dags", "--schedule", "@hourly"))
      .schedule.contains("@hourly"))
    assert(Main.parse(Array("run-dags", "--schedule", "None")).schedule.isEmpty)
    assert(Main.jobs.keySet == Set("stats-collect", "stats-validate", "run-dags",
      "artifact-upload", "artifact-list"))
  }
}
