package graft.jobs

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.sources.{ArtifactUploader, ObjectStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The urbanaccess pipeline's full shape
  * (`urbanaccess/update_areas_fake_gtfs.py:13-78`, `areas.yaml:1-17`):
  * a YAML area config (bbox + Israel-local inclusive hour windows),
  * one fake-GTFS artifact per (area, GTFS date, hour window), and
  * SKIP-IF-EXISTS keyed by artifact prefix with a bbox-metadata match
  * (`:36-41` — an artifact whose recorded bbox differs from the current
  * config is rebuilt). Extraction and packaging reuse
  * [[FakeGtfsExtract]] / [[graft.sources.ArtifactUploader]].
  *
  * The reference iterates wall-clock `now - 1..32` days; here the date
  * axis is the set of GTFS versions actually present (same idempotent
  * per-date artifact contract, no dependence on when the job runs).
  */
object UpdateAreasFakeGtfs {

  case class AreaCfg(id: String, minLon: Double, minLat: Double,
                     maxLon: Double, maxLat: Double, hours: Seq[(Int, Int)])

  case class Report(created: Seq[String], skipped: Seq[String])

  /** Parse the reference-shaped areas YAML (id → bbox CSV + hour list). */
  def parseAreas(yaml: String): Seq[AreaCfg] = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    root.fieldNames().asScala.map { id =>
      val n = root.get(id)
      val bbox = n.get("bbox").asText().split(",").map(_.trim.toDouble)
      AreaCfg(id, bbox(0), bbox(1), bbox(2), bbox(3),
        n.get("hours").elements().asScala
          .map(h => (h.get(0).asInt(), h.get(1).asInt())).toSeq)
    }.toSeq
  }

  /** Inclusive hour-of-day window predicate. A window crossing midnight
    * (fromH > untilH, e.g. 22-02) wraps: hour >= from OR hour <= until —
    * a plain between would silently match nothing for such a config.
    */
  def hourWindow(hourCol: org.apache.spark.sql.Column,
                 fromH: Int, untilH: Int): org.apache.spark.sql.Column =
    if (fromH <= untilH) hourCol.between(fromH, untilH)
    else hourCol >= fromH || hourCol <= untilH

  def areasFromResource(path: String = "/graft/areas.yaml"): Seq[AreaCfg] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try parseAreas(new String(in.readAllBytes(), "UTF-8")) finally in.close()
  }

  def run(spark: SparkSession, store: ObjectStore, ledgerPath: String,
          gtfsStop: DataFrame, gtfsRideStop: DataFrame,
          areas: Seq[AreaCfg]): Report = {
    val dates = gtfsStop.select(col("date")).distinct()
      .collect().map(_.getDate(0)).sorted.toSeq
    // ONE ledger read per run, collected to a prefix → metadata map
    // (the per-combination probe would rescan the growing append-only
    // ledger A×W×D times). Latest successful row per prefix wins by
    // CREATED_AT (seq only tiebreaks — it is a per-JVM counter and
    // carries no ordering across runs); uploads made during THIS run
    // update the map so a duplicate (area, window, date) combination
    // in the config still skips.
    val ledgerState = scala.collection.mutable.Map.empty[String, String]
    ArtifactUploader.load(spark, ledgerPath)
      .filter(col("status") === "success")
      .groupBy("file_prefix")
      .agg(max(struct(col("created_at"), col("seq"), col("metadata_json"))).as("m"))
      .select(col("file_prefix"), col("m.metadata_json"))
      .collect().foreach(r => ledgerState(r.getString(0)) = r.getString(1))
    var created = Seq.empty[String]
    var skipped = Seq.empty[String]
    for {
      area <- areas
      (fromH, untilH) <- area.hours
      date <- dates
    } {
      val bboxCsv = s"${area.minLon},${area.minLat},${area.maxLon},${area.maxLat}"
      val prefix = s"stride-etl/urbanaccess/areas_fake_gtfs/" +
        f"${area.id}-$date-$fromH%02d-$untilH%02d"
      val existing = ledgerState.get(prefix)
        .exists(_.contains(s""""bbox":"$bboxCsv""""))
      if (existing) skipped :+= prefix
      else {
        val out = Files.createTempDirectory("graft-fake-gtfs")
        try {
          // the window is Israel-local INCLUSIVE [from, until]
          // (the areas config contract): pre-filter stop-times on the
          // Israel-local hour and give the extractor a pass-through
          // hour window; [[hourWindow]] wraps past-midnight configs
          val localTimes = gtfsRideStop.filter(hourWindow(
            hour(from_utc_timestamp(col("departure_time"), "Asia/Jerusalem")),
            fromH, untilH))
          FakeGtfsExtract.run(spark,
            gtfsStop.filter(col("date") === lit(date)), localTimes,
            FakeGtfsExtract.Area(area.id, area.minLat, area.minLon,
              area.maxLat, area.maxLon, fromHour = 0, untilHour = 24),
            out.toString)
          val meta = s"""{"area_id":"${area.id}","date":"$date","bbox":"$bboxCsv"}"""
          ArtifactUploader.upload(spark, ledgerPath, store, out, prefix, "",
            metadataJson = meta, isDirectory = true)
          ledgerState(prefix) = meta
          created :+= prefix
        } finally ObjectStore.deleteRecursively(out.toFile)
      }
    }
    Report(created, skipped)
  }
}
