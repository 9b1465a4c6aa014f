package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (the same
  * hook third-party Spark libraries use): lets graft's native Catalyst
  * expressions surface as ordinary `Column`s without going through the
  * SQL parser.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True iff nothing is registered in the session's CacheManager —
    * the persist-hygiene assertion (a leaked `df.persist()` parks an
    * entry here until someone unpersists; localCheckpoint blocks do NOT
    * register and are reclaimed by the ContextCleaner on GC).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
