package graft.jobs

import graft.Tables
import graft.operators.UpdateInPlace
import graft.sources.{ArtifactUploader, CsvPackage, LocalFsObjectStore, TaskLedger}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline composing the engine's pieces the way the
  * reference's DAG chain does (SURVEY.md §3: add-ride-durations →
  * update-rides-gtfs → packager), re-shaped for the lake:
  *
  *  1. enrichment — per-user first/last/duration with the 6h/2d
  *     watermark semantics (§2.4 A5/A6, §2.9 T2/T3), one aggregation;
  *  2. update-in-place — durations merged onto a user dimension table
  *     via left-join + coalesce + dynamic partition overwrite (§7.3,
  *     replacing the reference's `UPDATE … FROM`);
  *  3. packaging — per-day CSV packages with metadata + content hash,
  *     skipped when unchanged (§2.1 S5/S6, §2.9 T8);
  *  4. ledger — each day recorded in the idempotent task ledger, so a
  *     re-run only packages days that failed or changed (§2.9 T5).
  *
  * Each step is a separate distributed job; only the packaging tail and
  * the ledger bookkeeping run on the driver, over per-day metadata —
  * never over rows. Metrics are returned as a map (§2.4 A12's stats
  * counters, without println-driven observability).
  */
object EnrichAndPackage {

  case class Report(daysPackaged: Seq[String], daysSkipped: Seq[String],
                    rowsEnriched: Long, outDir: String,
                    artifactUrls: Seq[String] = Seq.empty)

  val NowLit = "2024-01-31 00:00:00"

  /** Step 1: per-user duration enrichment (the add-ride-durations shape). */
  def enrich(spark: SparkSession, sfDir: String): DataFrame = {
    val now = lit(NowLit).cast("timestamp")
    Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("f"),
        max(struct(col("ts"), col("event_id"))).as("l"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("f.ts").as("first_ts"), col("l.ts").as("last_ts"), col("n_events"),
        when(col("l.ts") < now - expr("INTERVAL 6 HOURS"),
          round((unix_micros(col("l.ts")) - unix_micros(col("f.ts"))) / 6e7).cast("long"))
          .when(col("f.ts") < now - expr("INTERVAL 2 DAYS"), 0L)
          .otherwise(lit(null).cast("long"))
          .as("new_duration_min"))
  }

  /** Run the full chain; `targetDir` holds the maintained user table,
    * `pkgDir` the CSV packages + ledger.
    */
  def run(spark: SparkSession, sfDir: String, targetDir: String,
          pkgDir: String): Report = {
    // 0. seed the maintained table on first run (progress columns null —
    //    the reference's IS-NULL to-do semantics)
    val targetPath = s"$targetDir/user_durations"
    if (!new java.io.File(targetPath).exists()) {
      Tables.events(spark, sfDir)
        .select(col("user_id")).distinct()
        .withColumn("duration_min", lit(null).cast("long"))
        .write.parquet(targetPath)
    }

    // 1-2. enrich + update-in-place
    val enrichment = enrich(spark, sfDir)
      .select(col("user_id"), col("new_duration_min"))
    val updated = UpdateInPlace(
      spark.read.parquet(targetPath), enrichment, Seq("user_id"))
      .withColumn("bucket", pmod(col("user_id"), lit(8)))
    val tmpOut = s"$targetDir/user_durations_next"
    UpdateInPlace.overwritePartitions(updated, tmpOut, Seq("bucket"))
    val rowsEnriched = spark.read.parquet(tmpOut).count()

    // 3-4. package each day once; ledger + content hash make re-runs no-ops
    val days = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).cast("date").as("date")).distinct()
    val ledgerPath = s"$pkgDir/ledger"
    // S7/S9: each published day-package is uploaded through the object
    // store with the artifact status ledger + collision-avoiding key
    // protocol (the reference uploads every packager result,
    // `artifacts/common.py:33-87`)
    val store = new LocalFsObjectStore(s"$pkgDir/objectstore")
    val artifactLedger = s"$pkgDir/artifact_ledger"
    var packaged = Seq.empty[String]
    var uploaded = Seq.empty[String]
    val processed = TaskLedger.catchUp(spark, ledgerPath, days, "package_day",
      maxIterations = 1000) { day =>
      val dayDf = Tables.events(spark, sfDir)
        .filter(to_date(col("ts")) === lit(day))
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("value"))
        .orderBy(col("ts"), col("event_id"))
      val res = CsvPackage.write(dayDf, pkgDir, day.toString)
      if (!res.skipped) {
        val zipPath = CsvPackage.zip(pkgDir, day.toString)
        val up = ArtifactUploader.upload(spark, artifactLedger, store,
          java.nio.file.Paths.get(zipPath), s"packages/$day", ".zip",
          metadataJson = s"""{"rows":${res.rows},"hash":"${res.sha256}"}""")
        uploaded :+= up.url
      }
      packaged :+= day.toString
      true
    }
    val skipped = days.collect().map(_.getDate(0).toString).toSeq
      .filterNot(processed.map(_.toString).contains)
    Report(packaged, skipped, rowsEnriched, pkgDir, uploaded)
  }
}
