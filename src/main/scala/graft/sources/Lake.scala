package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned lake layout — the 100 TB shape of the engine's
  * tables (SURVEY.md §1.3/§7.1): fact tables directory-partitioned by
  * their natural event-date key (`siri_vehicle_location` by
  * `recorded_at_time`'s date, here `events` by `to_date(ts)`), versioned
  * dimensions by their version `date` (gtfs_*). Every time-range
  * predicate then prunes at the DIRECTORY level before any file is
  * opened — the distributed equivalent of the reference's per-(date,
  * route) manual work units (`siri/common.py:8-39`), without the
  * driver-side loop.
  *
  * The flat single-file testdata layout stays the default for the
  * oracle gate (DuckDB reads the same files); this module is the
  * deployment layout, proven by LakeSpec's PartitionFilters assertions.
  */
object Lake {

  /** Materialize a fact table partitioned by the date of `tsCol`.
    * Files within a partition are sorted by (tsCol, idCol) so range
    * scans read sequentially and min/max row-group stats stay tight.
    */
  def writeFactByDay(df: DataFrame, tsCol: String, idCol: String,
                     path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .repartition(col("p_date"))
      .sortWithinPartitions(col("p_date"), col(tsCol), col(idCol))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  def readFact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Day-range scan: both bounds land on the partition column, so the
    * scan's PartitionFilters prune every out-of-range directory.
    */
  def scanDays(spark: SparkSession, path: String,
               fromDay: String, untilDay: String): DataFrame =
    readFact(spark, path)
      .filter(col("p_date") >= lit(fromDay) && col("p_date") < lit(untilDay))

  /** Index-layout write: one directory per `keyCol` value — the layout
    * of an IVF inverted-list index (or any list-sharded artifact). A
    * probe that filters on `keyCol` becomes a partition-pruned scan of
    * ONLY the probed directories (PartitionFilters, zero data files
    * opened elsewhere); files are sorted by `sortCol` within each list
    * so row-group min/max stats stay tight for id lookups.
    */
  def writeListPartitioned(df: DataFrame, keyCol: String, sortCol: String,
                           path: String): Unit =
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(sortCol))
      .write.mode("overwrite").partitionBy(keyCol).parquet(path)

  // ---- Z-order layout ----

  /** Bit-interleaved Morton (Z-order) value of two non-negative integer
    * columns already scaled to `bits` bits each: bit i of `a` lands at
    * position 2i+1, bit i of `b` at 2i. Pure column math (shifts, AND,
    * OR) — codegen'd, no UDF.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Scale a numeric column linearly into [0, 2^bits) given its global
    * min/max (degenerate ranges collapse to 0).
    */
  private def scaleToBits(c: Column, mn: Double, mx: Double,
                          bits: Int): Column = {
    val span = mx - mn
    if (span <= 0) lit(0L)
    else least(lit((1L << bits) - 1),
      floor((c.cast("double") - mn) / span * ((1L << bits) - 1)).cast("long"))
  }

  /** Z-order-clustered write: interleave the two columns' scaled bits
    * into a Morton key, range-partition into `numFiles` output files on
    * that key, and sort within each file. Every file then covers a
    * COMPACT RECTANGLE of the (a, b) space instead of a full-range
    * stripe, so parquet min/max stats prune files for predicates on
    * EITHER column — the multi-dimensional generalization of
    * [[writeFactByDay]]'s single-key sort. At 100 TB this is the
    * standard layout for fact tables queried by two independent
    * selective dimensions (ride × time, doc × quality): a plain sort
    * helps one dimension and leaves the other unprunable.
    *
    * The min/max pre-pass is one tiny aggregate; the write is one
    * range exchange — the same cost as any clustered write.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    // empty input / all-null column → degenerate range → z = 0 for every
    // row (single cluster), instead of an NPE out of Row.getDouble
    def d(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val z = interleaveBits(
      scaleToBits(col(colA), d(0), d(1), bits),
      scaleToBits(col(colB), d(2), d(3), bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  // ---- small-file compaction ----

  /** Compact a parquet directory's small files to ~`targetBytes` per
    * file: list current bytes, coalesce to ceil(bytes/target) (never
    * 0), rewrite to a side directory, then swap via two renames. The
    * data is never destroyed — at every instant it exists in full at
    * `path`, `path__old`, or `path__compacting` — but the swap is NOT
    * one atomic operation: a crash between the renames (or a
    * concurrent reader racing them) can observe `path` briefly
    * missing. A re-run SELF-HEALS that state (the `__old` backup is
    * renamed back before compacting). Deployments that need
    * fully-atomic publish use the named-table lake's pointer swap
    * (`SiriLake.replace`); this direct-path form is for tables
    * addressed by physical path. Small files are the classic silent
    * killer of 100 TB scans (one task + one footer read per file);
    * periodic compaction keeps file count proportional to data size,
    * not to ingest batch count.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    // self-heal a previous run that crashed between its two renames
    if (!fs.exists(p) && fs.exists(old)) {
      require(fs.rename(old, p), s"compact: cannot restore $path from $old")
    }
    val bytes = fs.getContentSummary(p).getLength
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    require(fs.rename(p, old), s"compact: cannot stage $path")
    if (!fs.rename(tmp, p)) {
      require(fs.rename(old, p),
        s"compact: swap failed AND restore failed — data is at $old")
      throw new IllegalStateException(s"compact: swap failed for $path")
    }
    fs.delete(old, true)
    nOut
  }
}
