package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys.
  *
  * At 100 TB a handful of hot keys (one bus line with 100× the
  * telemetry, one document source with half the corpus) turn a plain
  * `groupBy` into a straggler stage: one reducer gets the hot key's
  * entire partition. Salting splits each key into `nSalts` sub-groups
  * aggregated in parallel (phase 1), then re-aggregates the per-salt
  * partials (phase 2, tiny — `nSalts` rows per key).
  *
  * Only algebraic aggregates (sum/count/min/max) decompose this way;
  * the caller supplies both phases. AQE's skew-join handling covers
  * JOIN skew at runtime; aggregation skew still needs this explicit
  * rewrite because the hash-aggregate's partitioning is fixed by the
  * grouping key.
  */
object SaltedAgg {

  /** @param phase1 per-(key, salt) aggregates, e.g. `sum(x) as s`
    * @param phase2 re-aggregation of phase-1 outputs, e.g. `sum(s) as s`
    */
  def apply(df: DataFrame, groupCols: Seq[String], nSalts: Int,
            phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(groupCols.head), monotonically_increasing_id()), lit(nSalts)))
    val partial = salted
      .groupBy((groupCols :+ "_salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
    partial
      .groupBy(groupCols.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }
}
