package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed publishing — the co-located-join tool for tables that are
  * JOINED REPEATEDLY on the same key at scale (SURVEY.md §7: the fact
  * side joined to rides/stops on every hourly run). Writing both sides
  * bucketed (and sorted) by the join key pins identical partitioning
  * into the table layout, so every subsequent join is exchange-free: a
  * sort-merge join reads matching buckets directly — no shuffle of the
  * 100 TB side, every run, forever. The price is one clustered write,
  * paid once per publish instead of one shuffle per query.
  *
  * Bucketed tables need the session catalog (bucket metadata lives in
  * the table definition, not the files), so this is the one sink that
  * goes through `saveAsTable`; everything else in the lake is plain
  * path-addressed parquet.
  */
object BucketedLake {

  /** Publish `df` as a bucketed+sorted parquet table in the session
    * catalog. Same `nBuckets` and key on both sides of a planned join,
    * or the exchange comes back. Re-publishing replaces the table; an
    * orphaned managed-table directory (metadata lost with a previous
    * session, files still on disk) is cleared first, since saveAsTable
    * refuses to create over an existing location.
    */
  def publish(df: DataFrame, table: String, bucketCol: String,
              nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the catalog lowercases identifiers and the warehouse conf is a
    // (possibly URI-encoded) file URI — resolve both or the orphan
    // survives the cleanup
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath =
      try java.nio.file.Paths.get(new java.net.URI(wh))
      catch { case _: Exception => java.nio.file.Paths.get(wh.stripPrefix("file:")) }
    ObjectStore.deleteRecursively(
      whPath.resolve(table.toLowerCase(java.util.Locale.ROOT)).toFile)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
