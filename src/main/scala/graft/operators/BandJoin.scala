package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Band (interval) join with deterministic nearest-match arbitration.
  *
  * Reference semantics: match a SIRI ride to a GTFS ride whose
  * `start_time` is within ±n minutes, cascading n = 1, 3, 5, each pass
  * picking an ARBITRARY match (`siri/update_rides_gtfs.py:12-28,80-97`;
  * `UPDATE ... FROM` with multiple candidates is nondeterministic).
  *
  * Spark-first rewrite (SURVEY.md §7.4): ONE equi-join on the exact keys
  * with the band as a residual predicate, then a per-left-row top-1 by
  * `(abs time diff, right tiebreak)`. Equivalent coverage to the cascade
  * (anything matched at ±1 is also the global nearest within ±5), but
  * deterministic and a single join pass instead of three.
  *
  * Time arithmetic is exact integer microseconds (`unix_micros`), never
  * float seconds — tie ordering must be bit-stable across engines and
  * partitionings.
  *
  * Scale notes: the equi keys carry the shuffle; the band is a cheap
  * residual evaluated inside the hash join, so no range explosion. With
  * a small right side (GTFS dims) Spark broadcasts it and the only
  * shuffle left is the window's hash partition on the left id. The
  * window is top-1 per left id; rows per id are band-bounded, so no skew
  * blowup at 100 TB — and AQE coalesces the post-join partitions.
  */
object BandJoin {

  /** Output: all `left` columns (alias `l`), all `right` columns (alias
    * `r`), plus `_diff_us` (abs time difference in microseconds).
    *
    * The band is OPEN (strict `<`), matching the reference's
    * `> start - n minutes AND < start + n minutes`
    * (`siri/update_rides_gtfs.py:22-23`): a row exactly at ±tolerance
    * does NOT match.
    *
    * @param equiKeys      exact-match key columns present on both sides
    * @param leftTs        timestamp column on `left`
    * @param rightTs       timestamp column on `right`
    * @param toleranceSec  band half-width in seconds
    * @param leftId        unique left row id (arbitration group)
    * @param rightTieBreak unique right-side column making arbitration total
    * @param extraCond     additional join predicate over the aliased
    *                      sides (columns must be unambiguous), e.g. the
    *                      route/date keys of the GTFS matcher
    */
  def nearestWithin(left: DataFrame, right: DataFrame,
                    equiKeys: Seq[String],
                    leftTs: String, rightTs: String,
                    toleranceSec: Long,
                    leftId: String, rightTieBreak: String,
                    extraCond: Option[Column] = None): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val diffUs = abs(unix_micros(col(s"l.$leftTs")) - unix_micros(col(s"r.$rightTs")))
    val cond = (equiKeys.map(k => col(s"l.$k") === col(s"r.$k")) ++
      extraCond :+
      (diffUs < toleranceSec * 1000000L)).reduce(_ && _)
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col("_diff_us").asc, col(s"r.$rightTieBreak").asc)
    l.join(r, cond, "inner")
      .withColumn("_diff_us", diffUs)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
