package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row at or
  * before its timestamp, per key — the time-series lookup ("state of X
  * when Y happened") that relational engines bolt on as `ASOF JOIN`.
  *
  * NOT implemented as join + filter + top-1: an equi-join on the key
  * with a `<=` residual fans out to every earlier right row (O(n·m)
  * per key) before arbitration prunes it. Instead the scalable
  * union+window form: tag both sides, union them, sort each key's
  * timeline once, and carry the latest right payload forward with
  * `last(ignoreNulls)` over the preceding frame. One shuffle, one sort,
  * zero fanout — the same plan shape at any scale; ties (equal ts) and
  * arbitration are made total by ordering right rows by id.
  */
object AsOfJoin {

  /** Output: all left columns + `asof_<valueCol>` (null when no right
    * row precedes the left row for that key).
    *
    * @param key      equi key present on both sides
    * @param leftTs   left timestamp column
    * @param rightTs  right timestamp column
    * @param valueCol right payload column to carry
    * @param rightId  unique right id making equal-ts arbitration total
    *                 (the LATEST id wins, matching "most recent state")
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       valueCol: String, rightId: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1)) // left sorts AFTER right at equal ts
      .withColumn("_rid", lit(null).cast("long"))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right
      .select(col(key), col(rightTs).as("_t"), lit(0).as("_side"),
        col(rightId).cast("long").as("_rid"), col(valueCol).as("_v"))
    val unioned = l.select((col(key) +: col("_t") +: col("_side") +:
        col("_rid") +: col("_v") +:
        leftCols.filter(_ != key).map(col).toSeq): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col(s"asof_$valueCol"): _*)
  }
}
