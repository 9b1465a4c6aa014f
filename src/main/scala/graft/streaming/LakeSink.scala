package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming → parquet-lake ingestion with replay-safe appends.
  *
  * Structured Streaming re-delivers a micro-batch WITH THE SAME
  * batchId after a failure/restart; a plain append sink would then
  * duplicate those rows. Writing each batch to its own
  * `batch_id=<id>` partition directory with overwrite makes the
  * delivery idempotent: a replay rewrites the same directory instead
  * of appending beside it — the standard exactly-once-ish recipe when
  * the target is a plain parquet directory rather than a
  * transactional table. Readers see the batch id as a partition
  * column (useful for ingest audits) and prune on it like any other.
  *
  * Downstream hygiene: many tiny batch directories are the small-files
  * problem by construction — schedule [[graft.sources.Lake.compact]]
  * over cold partitions.
  */
object LakeSink {

  /** One micro-batch, delivered idempotently (same `batchId` → same
    * directory, overwritten).
    */
  def appendIdempotent(df: DataFrame, batchId: Long, path: String): Unit =
    df.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** The stream writer: attach `.option("checkpointLocation", ...)`
    * and `.start()` (or a trigger) at the call site.
    */
  def writeTo(stream: DataFrame, path: String): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        appendIdempotent(batch.toDF(), id, path)
    }
}
