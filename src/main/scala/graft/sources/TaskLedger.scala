package graft.sources

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent per-date task ledger (SURVEY.md §2.9 T5, §2.3 J13):
  * the reference tracks which (date, task) pairs have completed in
  * `gtfs_data_task` and re-runs only missing or failed dates
  * (`idempotent_process_gtfs_data.py:81-132`), selecting them with a
  * NOT-IN subquery (`:95-108`).
  *
  * Here the ledger is a small parquet table and "dates needing work" is
  * an anti-join ∪ failed-join — the same union-of-missing-and-failed
  * semantics, computed in one pass instead of a per-date loop. At scale
  * the ledger stays tiny (one row per date×task), so it broadcasts.
  */
object TaskLedger {

  /** Ledger schema: date, task_name, success. Append-only; the latest
    * attempt per (date, task) wins, ties broken by attempt id.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    if (new java.io.File(path).exists())
      spark.read.parquet(path)
    else
      Seq.empty[(Date, String, Boolean, Long)]
        .toDF("date", "task_name", "success", "attempt")
  }

  def record(spark: SparkSession, path: String, date: Date,
             taskName: String, success: Boolean): Unit = {
    import spark.implicits._
    val attempt = System.currentTimeMillis()
    Seq((date, taskName, success, attempt))
      .toDF("date", "task_name", "success", "attempt")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Dates from `candidates` (one `date` column) that `taskName` still
    * needs: never attempted (anti-join, J13) or last attempt failed
    * (U1's union-with-dedup), newest first (O7).
    */
  def missingDates(candidates: DataFrame, ledger: DataFrame,
                   taskName: String): DataFrame = {
    val task = ledger.filter(col("task_name") === taskName)
    val latest = task.groupBy("date")
      .agg(max(struct(col("attempt"), col("success"))).as("last"))
      .select(col("date"), col("last.success").as("success"))
    val never = candidates.select("date")
      .join(task.select("date"), Seq("date"), "left_anti")
    val failed = candidates.select("date")
      .join(latest.filter(!col("success")), Seq("date"), "left_semi")
    never.union(failed).distinct().orderBy(col("date").desc)
  }

  /** The reference's catch-up loop (`idempotent_process_gtfs_data.py:
    * 81-132`): process missing dates one at a time until none remain,
    * recording success/failure after each. Returns processed dates.
    */
  def catchUp(spark: SparkSession, path: String, candidates: DataFrame,
              taskName: String, maxIterations: Int = 100)
             (process: Date => Boolean): Seq[Date] = {
    var done = Seq.empty[Date]
    var iter = 0
    var more = true
    while (more && iter < maxIterations) {
      iter += 1
      // one attempt per date per invocation: a date that failed THIS run
      // stays in missingDates, so skip past it to the next one
      val next = missingDates(candidates, load(spark, path), taskName)
        .collect().iterator.map(_.getDate(0)).find(!done.contains(_))
      next match {
        case Some(d) =>
          val ok = process(d)
          record(spark, path, d, taskName, ok)
          done :+= d
        case None => more = false
      }
    }
    done
  }
}
