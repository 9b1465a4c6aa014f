package graft.runner

import java.nio.file.{Files, Paths}

import graft.jobs._
import graft.sources.{ArtifactUploader, LocalFsObjectStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The named-table lake the DAG tasks read and maintain — the stand-in
  * for the reference's Postgres schema (`siri_ride`, `gtfs_ride`, …):
  * one parquet directory per table under a work dir. `replace` is the
  * `UPDATE`-equivalent publish: the new version is fully written to a
  * side directory first (the plan may read the current version — Spark
  * cannot overwrite a path it is reading), then swapped in.
  */
object SiriLake {
  def path(workDir: String, table: String): String = s"$workDir/$table"

  def read(spark: SparkSession, workDir: String, table: String): DataFrame =
    spark.read.parquet(path(workDir, table))

  def seed(df: DataFrame, workDir: String, table: String): Unit =
    df.write.mode("overwrite").parquet(path(workDir, table))

  def replace(spark: SparkSession, workDir: String, table: String,
              df: DataFrame): Unit = {
    val target = Paths.get(path(workDir, table))
    val next = Paths.get(path(workDir, s"${table}__next"))
    df.write.mode("overwrite").parquet(next.toString)
    graft.sources.ObjectStore.deleteRecursively(target.toFile)
    Files.move(next, target)
  }
}

/** Binds the DAG config (`resources/graft/dags.yaml`) to the domain
  * jobs: every reference pipeline the engine ports, runnable as one
  * config-driven chain (`Main` job `run-dags`). Each function takes the
  * resolved kwargs; `work_dir` locates the [[SiriLake]].
  */
object StrideDags {

  val config: Seq[DagDef] = JobGraph.fromResource()

  private def wd(kw: Map[String, String]): String =
    kw.getOrElse("work_dir", sys.error("work_dir kwarg required"))

  /** Deterministic "now" when passed (tests, backfills), wall-clock
    * otherwise (the reference's `datetime.now()`).
    */
  private def nowOf(kw: Map[String, String]): java.time.LocalDateTime =
    kw.get("now").map(n => java.sql.Timestamp.valueOf(n).toLocalDateTime)
      .getOrElse(java.time.LocalDateTime.now())

  val registry: Map[String, JobGraph.TaskFn] = Map(
    "gtfs.update_ride_aggregations" -> { (s, kw) =>
      val d = wd(kw)
      SiriLake.replace(s, d, "gtfs_ride", GtfsRideAggregations.run(
        SiriLake.read(s, d, "gtfs_ride"), SiriLake.read(s, d, "gtfs_ride_stop")))
    },

    "siri.add_ride_durations" -> { (s, kw) =>
      val d = wd(kw)
      val now = nowOf(kw).format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      SiriLake.replace(s, d, "siri_ride", AddRideDurations.run(
        SiriLake.read(s, d, "siri_ride"), SiriLake.read(s, d, "siri_ride_stop"),
        SiriLake.read(s, d, "siri_vehicle_location"), now))
    },

    "siri.update_ride_stops_gtfs" -> { (s, kw) =>
      val d = wd(kw)
      SiriLake.replace(s, d, "siri_ride_stop", UpdateRideStops.matchStopsGtfs(
        SiriLake.read(s, d, "siri_ride_stop"), SiriLake.read(s, d, "siri_stop"),
        SiriLake.read(s, d, "siri_ride"), SiriLake.read(s, d, "gtfs_stop")))
    },

    "siri.update_ride_stops_vehicle_locations" -> { (s, kw) =>
      val d = wd(kw)
      SiriLake.replace(s, d, "siri_ride_stop", UpdateRideStops.nearestLocations(
        SiriLake.read(s, d, "siri_ride_stop"),
        SiriLake.read(s, d, "siri_vehicle_location"),
        SiriLake.read(s, d, "gtfs_stop")))
      SiriLake.replace(s, d, "siri_vehicle_location",
        UpdateRideStops.locationDistances(
          SiriLake.read(s, d, "siri_ride_stop"),
          SiriLake.read(s, d, "siri_vehicle_location"),
          SiriLake.read(s, d, "gtfs_stop")))
    },

    "siri.update_rides_gtfs" -> { (s, kw) =>
      val d = wd(kw)
      SiriLake.replace(s, d, "siri_ride", UpdateRidesGtfs.run(
        SiriLake.read(s, d, "siri_ride"), SiriLake.read(s, d, "siri_route"),
        SiriLake.read(s, d, "gtfs_ride"), SiriLake.read(s, d, "gtfs_route")))
    },

    "packagers.siri.update_package" -> { (s, kw) =>
      val d = wd(kw)
      val rows = SiriPackager.exportRows(
        SiriLake.read(s, d, "siri_vehicle_location"),
        SiriLake.read(s, d, "siri_ride_stop"), SiriLake.read(s, d, "siri_ride"),
        SiriLake.read(s, d, "siri_stop"), SiriLake.read(s, d, "siri_route"),
        SiriLake.read(s, d, "siri_snapshot"), SiriLake.read(s, d, "gtfs_ride"),
        SiriLake.read(s, d, "gtfs_stop"))
      // hourly driver work-list, like the reference's hour loop
      // (`packagers/siri.py` hourly_update_packages)
      val hours = rows
        .select(translate(substring(
          graft.functions.TimeFunctions.israelIso(col("recorded_at_time")), 1, 13),
          " ", ".").as("h"))
        .distinct().orderBy("h").collect().map(_.getString(0))
      val outDir = s"$d/packages"
      val store = new LocalFsObjectStore(s"$d/objectstore")
      hours.foreach { hour =>
        val res = SiriPackager.packageHour(s, rows, hour, outDir)
        if (!res.skipped)
          ArtifactUploader.upload(s, s"$d/artifact_ledger", store,
            Paths.get(s"$outDir/$hour.zip"),
            s"stride-etl-packages/siri/$hour", ".zip",
            metadataJson = s"""{"rows":${res.rows},"hash":"${res.sha256}"}""")
      }
    },

    "siri.storage_backup_cleanup" -> { (s, kw) =>
      val d = wd(kw)
      StorageBackup.run(new LocalFsObjectStore(s"$d/objectstore"),
        Seq(
          StorageBackup.RootConfig(s"$d/siri_storage", None),
          StorageBackup.RootConfig(s"$d/parse_failed",
            Some("siri_etl_monitored_stop_visits_parse_failed"))),
        nowOf(kw).toLocalDate): Unit
    },

    "db.copy_backup_to_s3" -> { (s, kw) =>
      val d = wd(kw)
      DbBackupCopy.run(new LocalFsObjectStore(s"$d/objectstore"),
        s"$d/siri_storage", nowOf(kw)): Unit
    },

    "urbanaccess.update_areas_fake_gtfs" -> { (s, kw) =>
      val d = wd(kw)
      UpdateAreasFakeGtfs.run(s, new LocalFsObjectStore(s"$d/objectstore"),
        s"$d/artifact_ledger",
        SiriLake.read(s, d, "gtfs_stop"), SiriLake.read(s, d, "gtfs_ride_stop"),
        UpdateAreasFakeGtfs.areasFromResource()): Unit
    },

    "stats.collect" -> { (s, kw) =>
      StatsCollect.dailyCounts(s,
        kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required")))
        .count(): Unit
    },

    // beyond-reference: the training-corpus pipeline over the documents
    // lake, composed from the q34/q61 scoring, q48 dedup, q60 split and
    // q57 packing operators; tasks hand off through lake tables
    "corpus.score" -> { (s, kw) =>
      val d = wd(kw)
      val sf = kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required"))
      SiriLake.replace(s, d, "corpus_scores", CorpusPrepare.score(s, sf))
    },

    // `cluster_policy=lpa` switches clustering from q48's connected
    // components to q117's label-propagation communities (majority
    // vote: a chaining edge no longer fuses unrelated families) —
    // config, not code; unknown values hard-fail inside dedupDecide
    "corpus.dedup_decide" -> { (s, kw) =>
      val d = wd(kw)
      val sf = kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required"))
      val clusterPolicy = kw.get("cluster_policy") match {
        case None | Some("") => "cc"
        case Some(p) => p
      }
      SiriLake.replace(s, d, "corpus_dedup",
        CorpusPrepare.dedupDecide(s, sf, clusterPolicy))
    },

    // `keep_policy=survivor` switches the dedup keep from the min-id
    // canonical to q81's highest-quality cluster member;
    // `keep_policy=authority` to q108's highest-PageRank member —
    // config, not code, like `shard_tokens` (unknown values hard-fail
    // inside keptOf, same discipline as a missing sf_dir)
    "corpus.filter_pack" -> { (s, kw) =>
      val d = wd(kw)
      val sf = kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required"))
      val keepPolicy = kw.get("keep_policy") match {
        case None | Some("") => "canonical"
        case Some(p) => p
      }
      // `quality_gate=classifier` ALSO requires a positive q96 model
      // logit (already scored in the corpus_scores pass) — config, not
      // code, same hard-fail discipline
      val classifierGate = kw.get("quality_gate") match {
        case None | Some("") | Some("quality") => false
        case Some("classifier") => true
        case Some(other) => sys.error(s"unknown quality_gate '$other' " +
          "(expected 'quality' or 'classifier')")
      }
      val packed = CorpusPrepare.filterPack(s, sf,
        SiriLake.read(s, d, "corpus_scores"),
        SiriLake.read(s, d, "corpus_dedup"),
        keepPolicy = keepPolicy,
        classifierGate = classifierGate)
      SiriLake.replace(s, d, "corpus_packed", packed)
      CorpusPrepare.exportTrainJsonl(
        SiriLake.read(s, d, "corpus_packed"), s"$d/corpus_train_jsonl")
    },

    // `shard_tokens` kwarg switches the cut from ShardDocs-sized doc
    // counts to a token budget (greedy fill by subword count) — config,
    // not code: a trainer provisioning by tokens flips one override
    "corpus.shard_export" -> { (s, kw) =>
      val d = wd(kw)
      val packed = SiriLake.read(s, d, "corpus_packed")
      kw.get("shard_tokens").filter(_.nonEmpty) match {
        case Some(t) => CorpusPrepare.exportTrainShardsByTokens(
          packed, s"$d/corpus_train_shards", t.toLong)
        case None => CorpusPrepare.exportTrainShards(
          packed, s"$d/corpus_train_shards")
      }
    },

    // incremental-ingest twins: decide ONLY the incoming increment
    // against the existing corpus with the q58 policy — via the batch
    // path, or via a candidate lake a StreamingCorpus stream
    // materialized beforehand. Same policy code, same artifact
    // (JobsSpec pins the DAG-level equality).
    "corpus.dedup_decide_incremental" -> { (s, kw) =>
      val d = wd(kw)
      val sf = kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required"))
      SiriLake.replace(s, d, "corpus_dedup", CorpusPrepare.dedupArtifactOf(
        graft.queries.DedupQueries.q58(s, sf)))
    },

    "corpus.dedup_decide_streamed" -> { (s, kw) =>
      val d = wd(kw)
      val sf = kw.getOrElse("sf_dir", sys.error("sf_dir kwarg required"))
      val cand = kw.getOrElse("cand_path", sys.error("cand_path kwarg required"))
      // the increment is defined exactly as q58 defines it — by source
      val inc = graft.Tables.load(s, sf, "documents")
        .filter(col("source")
          .isin(graft.queries.DedupQueries.IncomingSources: _*))
        .select(col("doc_id"))
      SiriLake.replace(s, d, "corpus_dedup", CorpusPrepare.dedupArtifactOf(
        graft.streaming.StreamingCorpus.decide(s, cand, inc)))
    })
}
