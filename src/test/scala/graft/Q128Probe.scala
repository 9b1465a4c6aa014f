package graft

import org.apache.spark.sql.functions._

/** Scratch probe for the q128 algebra (dev tool, like Q58Probe). */
object Q128Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("8")
    val dir = "/root/testdata/sf0.01"
    val dec = "decimal(38,0)"
    val perUser = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (expr("unix_micros(ts) div 86400000000") % 2 === 0).as("pre"))
      .groupBy("event_type", "user_id")
      .agg(
        sum(when(col("pre"), col("cents")).otherwise(0L)).cast(dec).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).cast(dec).as("y"))
      .withColumn("arm",
        graft.functions.DedupFunctions.md5Hash32(
          concat(lit("ab-"), col("user_id").cast("string"))) % 2)
      .filter(col("event_type") === "click")
    def armAgg(a: Int, e: org.apache.spark.sql.Column) =
      sum(when(col("arm") === a, e).otherwise(lit(0).cast(dec)))
    val m = perUser.groupBy("event_type").agg(
      armAgg(0, lit(1).cast(dec)).as("na"),
      armAgg(0, col("y")).as("sya"),
      armAgg(0, col("y") * col("y")).as("syya"),
      armAgg(1, col("y")).as("syb"),
      armAgg(1, col("y") * col("y")).as("syyb"),
      armAgg(1, lit(1).cast(dec)).as("nb"))
    m.show(false)
    m.selectExpr(
      "CAST((na * (1000000000000 * syya) - (1000000 * sya) * (1000000 * sya)) div (na * (na - 1)) AS DECIMAL(38,0)) AS varA",
      "CAST((1000000 * sya) div na AS DECIMAL(38,0)) AS mA",
      "CAST((1000000 * syb) div nb AS DECIMAL(38,0)) AS mB")
      .show(false)
    spark.stop()
  }
}
