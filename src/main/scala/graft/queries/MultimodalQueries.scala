package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque
  * `binary` payload columns with typed metadata, decoded batch-wise
  * inside executors via `Dataset.mapPartitions` (the Scala analog of a
  * Pandas `mapInPandas` UDF: one iterator per partition, arbitrary
  * per-batch native code, typed output schema).
  *
  * The actual codec is STUBBED — no image/audio libraries exist in this
  * container — with [[MediaCodecStub]], a deterministic fake whose
  * arithmetic is also expressible in the DuckDB oracle, so the
  * Spark-side plumbing (binary column, partition-batched decode,
  * explicit output schema, frame-sample explode shape) is fully real
  * AND hash-checked. Swapping in a real decoder changes only the stub
  * body.
  *
  * Scale shape: decode is a narrow per-partition map — no shuffle, no
  * driver involvement; payload bytes never leave the executor. Frame
  * sampling explodes to `ceil(n_bytes/step)` rows via a generator, so
  * output size is controlled by `step`, not payload size.
  */
object MultimodalQueries {

  /** Input row: id + opaque payload (here synthesized from `text` bytes —
    * the lake has no real media blobs; the column TYPE and the plumbing
    * are the point).
    */
  case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Typed metadata a real decoder would emit. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, format: String)

  /** STUB decoder — deterministic fake standing in for an image codec.
    * A real implementation would parse the container header; this
    * derives plausible fields from the bytes so results are checkable.
    */
  object MediaCodecStub {
    val Formats: IndexedSeq[String] = IndexedSeq("jpg", "png", "webp")

    def decode(m: MediaIn): MediaMeta = {
      val n = m.payload.length.toLong
      val first = if (n > 0) m.payload(0) & 0xff else 0
      MediaMeta(m.doc_id, n,
        width = 64L + n % 577L,
        height = 64L + (n * 31L) % 353L,
        format = Formats((first % 3).toInt))
    }
  }

  private def media(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** q40 — batch decode: binary payload → typed metadata row, one
    * executor-side pass (`mapPartitions`), schema from the case-class
    * encoder.
    */
  def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).as[MediaIn]
      .mapPartitions(_.map(MediaCodecStub.decode))
      .toDF()
  }

  /** q41 — frame sampling: one row per sampled frame offset (every
    * `FrameStep` bytes), with the stub "frame feature" (the byte value
    * at the offset). The generator (`explode(sequence(...))`) is the
    * real plumbing a video pipeline uses; only the feature is fake.
    */
  val FrameStep = 16L

  def q41(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), length(col("payload")).cast("long") - 1,
          lit(FrameStep))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(expr("substr(CAST(payload AS STRING), CAST(frame_idx + 1 AS INT), 1)"))
          .cast("long").as("byte_val"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_media_metadata" -> (q40 _),
    "q41_frame_sample" -> (q41 _))

  val oracles: Map[String, String] = Map(
    "q40_media_metadata" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | 64 + CAST(octet_length(encode(text)) AS BIGINT) % 577 AS width,
        | 64 + (CAST(octet_length(encode(text)) AS BIGINT) * 31) % 353 AS height,
        | CASE ascii(substr(text, 1, 1)) % 3
        |  WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents""".stripMargin,
    "q41_frame_sample" ->
      s"""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
         | CAST(ascii(substr(text, CAST(f + 1 AS INT), 1)) AS BIGINT) AS byte_val
         |FROM documents
         |CROSS JOIN unnest(range(0, octet_length(encode(text)), $FrameStep)) AS t(f)
         |WHERE octet_length(encode(text)) > 0""".stripMargin)
}
