package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First/last-row-per-group (argmin/argmax) as a single shuffle-free-as-
  * possible aggregation.
  *
  * The reference emulates this with `ORDER BY ... LIMIT`-in-client per
  * group — a 2N-query pattern (`siri/add_ride_durations.py:28-48`) — or a
  * Python argmin loop (`siri/update_ride_stops_vehicle_locations.py:31-38`).
  * Spark-first this is ONE hash aggregation with partial (map-side)
  * combine: `min(struct(orderCols..., payload))`. Struct comparison is
  * lexicographic, so appending a unique id to the order key makes the
  * result deterministic under ties — the reference is nondeterministic
  * here (SURVEY.md §7.4).
  *
  * At scale: one shuffle on the group key, partial aggregation halves
  * network bytes; no window sort needed (a window would force a full
  * sort per partition — strictly worse for top-1 semantics).
  */
object ArgMinMax {

  /** Rows with nulls in any order column are dropped first — matching the
    * reference's `NULLS LAST` + take-first semantics (O1): a null-ordered
    * row can never win argmin/argmax.
    */
  def firstLastBy(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  tieBreak: String, payloadCols: Seq[String]): DataFrame = {
    val ord = Seq(col(orderCol), col(tieBreak))
    val payload = payloadCols.map(col)
    val s = struct(ord ++ payload: _*)
    df.filter(col(orderCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        min(s).as("_first"),
        max(s).as("_last"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-group argmin of `scoreCol`: keeps the full row minimizing
    * (score, tieBreak). One aggregation, deterministic.
    */
  def argMin(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
             tieBreak: Column, payloadCols: Seq[Column]): Column =
    min(struct(scoreCol +: tieBreak +: payloadCols: _*))
}
