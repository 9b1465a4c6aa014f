package graft.runner

import graft.GraftSession
import graft.jobs.StatsCollect
import org.apache.spark.sql.SparkSession

/** CLI entry (SURVEY.md §7.1 item 11): job name + date-window args,
  * replacing the reference's click CLI + Airflow `dags.yaml` kwargs
  * (`open_bus_stride_etl/cli.py`, `siri/dags.yaml`).
  *
  * Arg semantics follow the reference (`common.py:24-59`):
  *  - `--num-days N` derives [today − N, today];
  *  - explicit `--min-date/--max-date` win;
  *  - the literal strings "None"/"" (an Airflow templating quirk, F14)
  *    are treated as absent rather than parsed.
  */
object Main {

  case class Args(job: String, minDate: Option[String], maxDate: Option[String],
                  numDays: Int, sfDir: String, workDir: Option[String] = None,
                  source: Option[String] = None, prefix: Option[String] = None,
                  suffix: Option[String] = None, schedule: Option[String] = None)

  /** F14: Airflow passes the *string* "None" for unset kwargs. */
  def sanitize(v: Option[String]): Option[String] =
    v.map(_.trim).filter(s => s.nonEmpty && s != "None" && s != "null")

  def parse(argv: Array[String]): Args = {
    def opt(name: String): Option[String] =
      argv.sliding(2).collectFirst { case Array(`name`, v) => v }
    Args(
      job = argv.headOption.getOrElse("stats-collect"),
      minDate = sanitize(opt("--min-date")),
      maxDate = sanitize(opt("--max-date")),
      numDays = sanitize(opt("--num-days")).map(_.toInt).getOrElse(1),
      sfDir = sanitize(opt("--sf-dir")).getOrElse("/root/testdata/sf0.001"),
      workDir = sanitize(opt("--work-dir")),
      source = sanitize(opt("--source")),
      prefix = sanitize(opt("--prefix")),
      suffix = sanitize(opt("--suffix")),
      schedule = sanitize(opt("--schedule")))
  }

  /** Job registry — the dags.yaml equivalent. Each entry is pure
    * (SparkSession, Args) → printed report; jobs needing table paths
    * beyond the lake take them from args.
    */
  val jobs: Map[String, (SparkSession, Args) => Unit] = Map(
    "stats-collect" -> { (spark, a) =>
      StatsCollect.dailyCounts(spark, a.sfDir)
        .orderBy("entity", "day")
        .show(50, truncate = false)
    },
    "stats-validate" -> { (spark, a) =>
      val (fresh, newest) = StatsCollect.validateFreshness(
        spark, a.sfDir, "2024-01-31 00:00:00", maxAgeHours = 72)
      println(s"freshness: fresh=$fresh newest=$newest")
      if (!fresh) sys.exit(1) // the reference's stale-data exit code
    },
    // the reference's `artifacts upload` / `artifacts list` commands
    // (`artifacts/cli.py:11-30`) over the work dir's store + ledger
    "artifact-upload" -> { (spark, a) =>
      val wd = a.workDir.getOrElse(sys.error("--work-dir required"))
      val src = java.nio.file.Paths.get(
        a.source.getOrElse(sys.error("--source required")))
      val res = graft.sources.ArtifactUploader.upload(
        spark, s"$wd/artifact_ledger",
        new graft.sources.LocalFsObjectStore(s"$wd/objectstore"), src,
        a.prefix.getOrElse(sys.error("--prefix required")),
        a.suffix.getOrElse(""),
        isDirectory = java.nio.file.Files.isDirectory(src))
      println(s"uploaded: id=${res.artifactId}, url=${res.url}")
    },
    "artifact-list" -> { (spark, a) =>
      val wd = a.workDir.getOrElse(sys.error("--work-dir required"))
      graft.sources.ArtifactUploader.iterateArtifacts(
        spark, s"$wd/artifact_ledger", a.prefix.getOrElse(""))
        .show(100, truncate = false)
    },
    // the whole pipeline surface from the declarative DAG config —
    // the reference's `airflow.yaml` entry point
    "run-dags" -> { (spark, a) =>
      // --schedule "@hourly"/"@daily" runs one tier, like the
      // reference's Airflow schedule triggers; absent = all DAGs
      val results = JobGraph.run(spark, StrideDags.config, StrideDags.registry,
        overrides = Map(
          "work_dir" -> a.workDir.getOrElse(""),
          "sf_dir" -> a.sfDir,
          "min_date" -> a.minDate.getOrElse(""),
          "max_date" -> a.maxDate.getOrElse("")),
        scheduleFilter = a.schedule)
      results.foreach(r =>
        println(s"${r.dag}/${r.taskId}: ${r.status}${if (r.error.nonEmpty) s" (${r.error})" else ""}"))
      if (results.exists(_.status != "success")) sys.exit(1)
    })

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    val job = jobs.getOrElse(args.job,
      sys.error(s"unknown job '${args.job}'; known: ${jobs.keys.mkString(", ")}"))
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    try job(spark, args) finally spark.stop()
  }
}
