package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic math as pure column expressions (whole-stage-codegen'd).
  *
  * The reference computes WGS-84 geodesic distance per row in Python
  * (geopy, `open_bus_stride_etl/siri/update_ride_stops_vehicle_locations.py:20-30`)
  * — a per-row interpreter call. Here the same computation is a Catalyst
  * expression tree: it vectorizes inside WholeStageCodegen, never leaves
  * the JVM, and is usable in join residuals and aggregations.
  *
  * Haversine (spherical) is within ~0.3% of the Karney geodesic; the
  * reference stores distances rounded to whole meters and only consumes
  * them through an argmin (nearest location per stop), where the model
  * error cancels (SURVEY.md §7.5.2).
  */
object GeoFunctions {
  /** Mean Earth radius in meters (IUGG). */
  val EarthRadiusMeters: Double = 6371008.8

  /** Great-circle distance in meters between two (lat, lon) points given
    * in degrees. Null-safe: any null coordinate yields null (matching the
    * reference's try/except→None, `update_ride_stops_vehicle_locations.py:24-30`).
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2d
    val dLon = radians(lon2 - lon1) / 2d
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2d * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Bounding-box predicate (reference: fake-GTFS area extraction,
    * `urbanaccess/areas.yaml:1-17`). Pure conjunction of range predicates,
    * so Catalyst pushes it into the scan.
    */
  def inBBox(lat: Column, lon: Column,
             minLat: Double, minLon: Double, maxLat: Double, maxLon: Double): Column =
    lat.between(minLat, maxLat) && lon.between(minLon, maxLon)
}
