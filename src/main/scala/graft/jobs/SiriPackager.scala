package graft.jobs

import graft.functions.TimeFunctions
import graft.sources.CsvPackage
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The hourly export packager (`open_bus_stride_etl/packagers/siri.py`,
  * SURVEY.md §3.2) — the reference's biggest read: a 6-table FK-chain
  * join (J1) + versioned-dim left joins (J2–J4), a 40-odd-column wide
  * projection (P1), the per-row normalizer (P7: NULL→'', timestamps →
  * Israel-local strings), deterministic export order (O5), and one
  * CSV+metadata+zip package per hour (S5/S6) with hash-based skip (T8).
  *
  * The reference streams this through a single-threaded Python row pump
  * with a server-side cursor; here the join/projection/sort run
  * distributed and only the per-hour packaging tail is driver-side.
  */
object SiriPackager {

  /** The enriched flat export row. Dimension date pad: the versioned
    * GTFS joins accept `date` within ±2 days of the row's ride date
    * (`packagers/siri.py:96-97` — J3's residual band).
    */
  def exportRows(siriVehicleLocation: DataFrame, siriRideStop: DataFrame,
                 siriRide: DataFrame, siriStop: DataFrame, siriRoute: DataFrame,
                 siriSnapshot: DataFrame, gtfsRide: DataFrame,
                 gtfsStop: DataFrame): DataFrame = {
    val rideDate = to_date(col("sr.scheduled_start_time"))
    val datePad = (d: Column) =>
      d >= date_sub(rideDate, 2) && d <= date_add(rideDate, 2)

    siriVehicleLocation.alias("svl")
      .join(siriRideStop.alias("srs"), col("svl.siri_ride_stop_id") === col("srs.id"))
      .join(siriRide.alias("sr"), col("srs.siri_ride_id") === col("sr.id"))
      // export gate (T4): only data-complete rides
      .filter(col("sr.updated_duration_minutes").isNotNull)
      .join(siriStop.alias("ss"), col("srs.siri_stop_id") === col("ss.id"))
      .join(siriRoute.alias("rt"), col("sr.siri_route_id") === col("rt.id"))
      .join(siriSnapshot.alias("sn"), col("svl.siri_snapshot_id") === col("sn.id"))
      .join(gtfsRide.alias("gr"), col("sr.gtfs_ride_id") === col("gr.id"), "left")
      .join(gtfsStop.alias("gs"),
        col("srs.gtfs_stop_id") === col("gs.id") && datePad(col("gs.date")), "left")
      .select(
        col("sr.id").as("siri_ride_id"),
        col("rt.operator_ref"), col("rt.line_ref"),
        col("sr.journey_ref"), col("sr.vehicle_ref"),
        col("srs.order").as("stop_order"),
        col("ss.code").as("stop_code"),
        col("svl.id").as("vehicle_location_id"),
        col("svl.recorded_at_time"),
        col("svl.lat"), col("svl.lon"),
        col("svl.velocity"), col("svl.bearing"),
        col("svl.distance_from_journey_start"),
        col("sn.snapshot_id"),
        col("sr.scheduled_start_time"),
        col("sr.duration_minutes"),
        col("gr.journey_ref").as("gtfs_journey_ref"),
        col("gr.start_time").as("gtfs_start_time"),
        col("gs.city").as("stop_city"), col("gs.name").as("stop_name"))
  }

  /** P7's row normalizer as pure expressions: every column to string,
    * NULL→'', timestamps to Israel-local `yyyy-MM-dd HH:mm:ss`.
    */
  def normalized(rows: DataFrame): DataFrame =
    rows.select(rows.schema.fields.map { f =>
      val c = col(f.name)
      val s = f.dataType.typeName match {
        case "timestamp" => TimeFunctions.israelIso(c)
        case _ => c.cast("string")
      }
      coalesce(s, lit("")).as(f.name)
    }.toIndexedSeq: _*)

  /** Package one Israel-local hour of export rows: deterministic
    * (ride, recorded_at_time, location id) order, one `YYYY-MM-DD.HH`
    * csv+metadata+zip, skipped when the content hash is unchanged.
    */
  def packageHour(spark: SparkSession, rows: DataFrame, hourIsrael: String,
                  outDir: String, priorHash: Option[String] = None): CsvPackage.PackageResult = {
    val hourStart = TimeFunctions.fromIsraelLocal(
      to_timestamp(lit(hourIsrael), "yyyy-MM-dd.HH"))
    val hourRows = rows
      .filter(col("recorded_at_time") >= hourStart &&
        col("recorded_at_time") < hourStart + expr("INTERVAL 1 HOUR"))
      .orderBy(col("siri_ride_id"), col("recorded_at_time"),
        col("vehicle_location_id"))
    val res = CsvPackage.write(normalized(hourRows), outDir, hourIsrael, priorHash)
    if (!res.skipped) CsvPackage.zip(outDir, hourIsrael)
    res
  }
}
