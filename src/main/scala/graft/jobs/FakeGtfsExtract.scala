package graft.jobs

import graft.functions.GeoFunctions
import graft.sources.CsvPackage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Area-scoped "fake GTFS" extraction (SURVEY.md §2.1 S12, §2.2 P8):
  * the reference cuts a mini schedule per configured area — a bbox over
  * stops plus an hour window over stop-times — and writes it as a
  * GTFS-shaped CSV bundle (`urbanaccess/areas.yaml:1-17`,
  * `update_areas_fake_gtfs.py:14-45`). Config is data (the `Area` list),
  * the filters are plain range predicates (both push into the scans),
  * and the sink is the standard package writer.
  */
object FakeGtfsExtract {

  /** bbox + local-hour window, the reference's area config shape. */
  case class Area(name: String, minLat: Double, minLon: Double,
                  maxLat: Double, maxLon: Double,
                  fromHour: Int, untilHour: Int)

  /** Stops inside the area's bbox. */
  def areaStops(gtfsStop: DataFrame, area: Area): DataFrame =
    gtfsStop.filter(GeoFunctions.inBBox(col("lat"), col("lon"),
      area.minLat, area.minLon, area.maxLat, area.maxLon))

  /** Stop-times at the area's stops within [fromHour, untilHour). */
  def areaStopTimes(gtfsRideStop: DataFrame, stops: DataFrame,
                    area: Area): DataFrame =
    gtfsRideStop
      .join(stops.select(col("id").as("gtfs_stop_id")), Seq("gtfs_stop_id"), "left_semi")
      .filter(hour(col("departure_time")) >= area.fromHour &&
        hour(col("departure_time")) < area.untilHour)

  /** Write the area's stops + stop_times as a two-file CSV bundle. */
  def run(spark: SparkSession, gtfsStop: DataFrame, gtfsRideStop: DataFrame,
          area: Area, outDir: String): Map[String, Long] = {
    val stops = areaStops(gtfsStop, area)
    val times = areaStopTimes(gtfsRideStop, stops, area)
    val r1 = CsvPackage.write(stops.orderBy("id"), outDir, s"${area.name}_stops")
    val r2 = CsvPackage.write(times.orderBy("id"), outDir, s"${area.name}_stop_times")
    Map("stops" -> r1.rows, "stop_times" -> r2.rows)
  }
}
