package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one architectural translation the whole port hinges on
  * (SURVEY.md §7.3): the reference's `UPDATE ... FROM` join-updates
  * (`siri/update_rides_gtfs.py:69-119`, `update_ride_stops_gtfs.py:39-53`)
  * become left-join enrichment + `coalesce(new, old)` + atomic partition
  * overwrite. No in-place mutation exists in Spark — and none is needed:
  * unmatched rows keep their old (possibly null) values, so the
  * reference's `IS NULL` progress predicates (P2) keep working unchanged.
  *
  * Invariant (property-tested): row count is preserved — the enrichment
  * side must be unique per key (pre-aggregated / row_number'd), so the
  * left join can never duplicate target rows.
  */
object UpdateInPlace {

  /** @param target     the table being "updated"
    * @param enrichment unique-per-key DataFrame carrying new values;
    *                   its non-key columns must be named like the target
    *                   columns they update, prefixed `new_`.
    * @param keys       join key columns present on both sides
    */
  def apply(target: DataFrame, enrichment: DataFrame, keys: Seq[String]): DataFrame = {
    val newCols = enrichment.columns.filter(_.startsWith("new_")).toSeq
    val joined = target.join(enrichment, keys, "left")
    newCols.foldLeft(joined) { (df, nc) =>
      val c = nc.stripPrefix("new_")
      df.withColumn(c, coalesce(col(nc), col(c)))
    }.drop(newCols: _*)
  }

  /** Write side of the pattern: overwrite only the date partitions the
    * job touched (`spark.sql.sources.partitionOverwriteMode=dynamic`),
    * leaving the rest of the lake untouched — the Spark equivalent of the
    * reference's per-window transactions.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
