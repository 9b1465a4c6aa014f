package graft

import graft.Materialize.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: synthesize an sf0.5-equivalent lake by key-shifted
  * replication of the read-only sf0.1 lake, for the scaling-exponent
  * spot-bench (SCALE.md §19). NOT a correctness surface — the driver's
  * generator owns the real distributions; replication preserves row
  * counts × factor, key-space growth (every id domain shifts per
  * replica, so joins/graphs grow as disjoint copies rather than
  * hot-key pileups), and per-row payload shapes. Text gets a per-replica
  * suffix so replicas are near- but not exact-duplicates (text-derived
  * queries keep realistic dup structure instead of a factor-sized exact
  * clone group per doc); n_chars is recomputed to keep its
  * `= length(text)` invariant. region/nation stay fixed (geography-
  * bounded dims, TESTDATA.md).
  *
  * Every key column shifts by the span of the table that OWNS the id
  * domain (customer's for c_custkey AND o_custkey, orders' for both
  * o_orderkey and l_orderkey, …) — shifting a foreign key by the fact
  * table's own max would silently misalign replicas whenever the
  * highest-id dimension row has no fact (round-10 review finding: the
  * sf0.1 maxima happen to coincide today, but the invariant must not
  * rest on that).
  *
  * Usage: `Test/runMain graft.ScaleUpData <outDir> <factor>`
  */
object ScaleUpData {

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val factor = args(1).toInt
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.create("32")

    /** id-domain span (max+1) of `key` in its OWNING table. */
    def spanOf(table: String, key: String): Long =
      Tables.load(spark, src, table).agg(max(col(key))).head().getLong(0) + 1L

    val custSpan = spanOf("customer", "c_custkey")
    val suppSpan = spanOf("supplier", "s_suppkey")
    val partSpan = spanOf("part", "p_partkey")
    val orderSpan = spanOf("orders", "o_orderkey")
    val eventSpan = spanOf("events", "event_id")
    val userSpan = spanOf("events", "user_id")
    val docSpan = spanOf("documents", "doc_id")
    val vecSpan = spanOf("embeddings", "vec_id")

    /** `factor` unioned copies of `df`, replica i shifting each listed
      * column by i·span of the table that owns its id domain.
      */
    def replicate(df: DataFrame, keys: Seq[(String, Long)],
                  perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = df.materialize()
      (0 until factor).map { i =>
        val shifted = keys.foldLeft(base) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(i * span))
        }
        perReplica(shifted, i)
      }.reduce(_ unionAll _)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.coalesce(8).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    Seq("region", "nation").foreach { t =>
      write(t, Tables.load(spark, src, t))
    }
    write("supplier", replicate(Tables.load(spark, src, "supplier"),
      Seq("s_suppkey" -> suppSpan)))
    write("customer", replicate(Tables.load(spark, src, "customer"),
      Seq("c_custkey" -> custSpan)))
    write("part", replicate(Tables.load(spark, src, "part"),
      Seq("p_partkey" -> partSpan)))
    write("orders", replicate(Tables.load(spark, src, "orders"),
      Seq("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)))
    write("lineitem", replicate(Tables.load(spark, src, "lineitem"),
      Seq("l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
        "l_suppkey" -> suppSpan)))
    write("events", replicate(Tables.load(spark, src, "events"),
      Seq("event_id" -> eventSpan, "user_id" -> userSpan)))
    write("embeddings", replicate(Tables.load(spark, src, "embeddings"),
      Seq("vec_id" -> vecSpan)))
    write("documents", replicate(Tables.load(spark, src, "documents"),
      Seq("doc_id" -> docSpan),
      (d, i) =>
        if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" r$i")))
          .withColumn("n_chars", length(col("text")).cast("long"))))
    spark.stop()
  }
}
