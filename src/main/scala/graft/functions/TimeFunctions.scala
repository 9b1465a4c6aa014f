package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timezone / timestamp helpers.
  *
  * The reference stores UTC instants in Postgres and converts to
  * Israel-local time at the edges (`open_bus_stride_etl/common.py:12-21`,
  * `packagers/siri.py:77,83-88`). Session TZ stays UTC (build.sbt);
  * every local-time computation is an explicit expression here.
  */
object TimeFunctions {
  val IsraelTz = "Asia/Jerusalem"

  /** UTC instant → Israel-local wall time (reference `common.py:12-15`). */
  def toIsraelLocal(ts: Column): Column = from_utc_timestamp(ts, IsraelTz)

  /** Israel-local wall time → UTC instant (reference `common.py:18-21`).
    * Unlike the reference's F13 quirk (which applies *today's* DST offset
    * to any date, `common.py:69-71`), this uses the offset in effect at
    * the target instant — documented semantic fix, SURVEY.md §7.5.1.
    */
  def fromIsraelLocal(ts: Column): Column = to_utc_timestamp(ts, IsraelTz)

  /** Israel-local ISO string for export rows (reference row normalizer,
    * `packagers/siri.py:70-80`).
    */
  def israelIso(ts: Column): Column =
    date_format(toIsraelLocal(ts), "yyyy-MM-dd HH:mm:ss")

  /** `snapshot_id` path form `YYYY/MM/DD/HH/MM` (reference
    * `common.py:8-9` parses it; we format both ways).
    */
  def toSnapshotId(ts: Column): Column = date_format(ts, "yyyy/MM/dd/HH/mm")

  def parseSnapshotId(s: Column): Column = to_timestamp(s, "yyyy/MM/dd/HH/mm")

  /** The reference's journey_ref → GTFS key reconstruction
    * (`siri/update_rides_gtfs.py:72`):
    * `split_part(jr,'-',4) || '_' || split_part(jr,'-',3) ||
    *  split_part(jr,'-',2) || substr(split_part(jr,'-',1), 3)`
    * i.e. `YYYY-MM-DD-svc-x` → `x_svcDDYY…` (century dropped).
    * NOTE `split_part` is 1-based, Spark array index 0-based (F3).
    */
  def journeyRefKey(jr: Column): Column = {
    val p = split(jr, "-")
    concat(p(3), lit("_"), p(2), p(1), substring(p(0), 3, 2))
  }
}
