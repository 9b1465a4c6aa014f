package graft.sources

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S9 — artifact upload with the reference's status ledger and
  * collision-avoiding key protocol (`artifacts/common.py:16-87`):
  *
  *  1. a ledger row is written with status `uploading` BEFORE any bytes
  *     move (`:38-47` inserts the Artifact row and commits first);
  *  2. the target key is `artifacts/{prefix}{suffix}`, falling back to
  *     `artifacts/{prefix}__{N}{suffix}` for N = 2..30 until a key not
  *     already in the store is found (`:50-64`'s `aws s3 ls` probe loop
  *     — re-publishing the same prefix never overwrites history);
  *  3. on success the row transitions to `success` with the public URL
  *     (`:80-86`); on any failure it transitions to `error` with the
  *     message (`:74-78`) and the exception propagates;
  *  4. directories are zipped first with root-relative entry names and
  *     the suffix gains `.zip` (`:17-29,35-36`).
  *
  * The ledger is an append-only parquet table (latest row per artifact
  * id wins), the same representation [[TaskLedger]] uses; at scale it
  * is one tiny row per published artifact and always broadcasts.
  */
object ArtifactUploader {

  val Statuses = Seq("uploading", "success", "error")
  val MaxKeyAttempts = 30

  /** Artifact ids must be unique ACROSS JVMs writing the same ledger
    * (two drivers sharing a work dir, or a restart): random 63-bit ids,
    * not a time-seeded counter whose ranges can overlap. `seq` only
    * orders the status rows OF ONE artifact, which are always written
    * by the JVM that minted its id, so a per-JVM counter is safe.
    */
  private def newId(): Long =
    java.util.concurrent.ThreadLocalRandom.current().nextLong() & Long.MaxValue
  private val seqGen = new AtomicLong(0L)

  case class UploadResult(artifactId: Long, key: String, url: String)

  private def record(spark: SparkSession, ledgerPath: String, id: Long,
                     filePrefix: String, status: String, metadataJson: String,
                     error: String, url: String, fileSize: Long): Unit = {
    import spark.implicits._
    Seq((id, filePrefix, status, metadataJson, error, url,
        new Timestamp(System.currentTimeMillis()), fileSize, seqGen.incrementAndGet()))
      .toDF("artifact_id", "file_prefix", "status", "metadata_json",
        "error", "url", "created_at", "file_size", "seq")
      .write.mode(SaveMode.Append).parquet(ledgerPath)
  }

  /** Current artifact states: latest ledger row per artifact id. */
  def load(spark: SparkSession, ledgerPath: String): DataFrame = {
    import spark.implicits._
    val raw =
      if (new java.io.File(ledgerPath).exists()) spark.read.parquet(ledgerPath)
      else Seq.empty[(Long, String, String, String, String, String, Timestamp, Long, Long)]
        .toDF("artifact_id", "file_prefix", "status", "metadata_json",
          "error", "url", "created_at", "file_size", "seq")
    raw.groupBy("artifact_id")
      .agg(max(struct(col("seq"), col("file_prefix"), col("status"),
        col("metadata_json"), col("error"), col("url"), col("created_at"),
        col("file_size"))).as("last"))
      .select(col("artifact_id"), col("last.file_prefix").as("file_prefix"),
        col("last.status").as("status"),
        col("last.metadata_json").as("metadata_json"),
        col("last.error").as("error"), col("last.url").as("url"),
        col("last.created_at").as("created_at"),
        col("last.file_size").as("file_size"),
        col("last.seq").as("seq"))
  }

  /** The reference's `upload_artifact` (`artifacts/common.py:33-87`). */
  def upload(spark: SparkSession, ledgerPath: String, store: ObjectStore,
             sourcePath: Path, targetPrefix: String, targetSuffix: String,
             metadataJson: String = "null",
             isDirectory: Boolean = false): UploadResult = {
    val (file, suffix) =
      if (isDirectory) {
        val tmp = Files.createTempFile("graft-artifact", ".zip")
        ObjectStore.zipDirectory(sourcePath, tmp)
        (tmp, s"$targetSuffix.zip")
      } else (sourcePath, targetSuffix)
    val id = newId()
    record(spark, ledgerPath, id, targetPrefix, "uploading", metadataJson,
      "", "", Files.size(file))
    try {
      val key = ObjectStore.freeKey(store, s"artifacts/$targetPrefix$suffix",
        n => s"artifacts/${targetPrefix}__$n$suffix", MaxKeyAttempts)
      val url = store.put(file, key)
      record(spark, ledgerPath, id, targetPrefix, "success", metadataJson,
        "", url, Files.size(file))
      UploadResult(id, key, url)
    } catch {
      case e: Throwable =>
        record(spark, ledgerPath, id, targetPrefix, "error", metadataJson,
          String.valueOf(e), "", Files.size(file))
        throw e
    } finally {
      if (isDirectory) Files.deleteIfExists(file): Unit // the temp zip
    }
  }

  /** The reference's `iterate_artifacts` (`artifacts/common.py:90-106`):
    * successful artifacts whose prefix starts with `filePrefix`, newest
    * first, optionally limited.
    */
  def iterateArtifacts(spark: SparkSession, ledgerPath: String,
                       filePrefix: String, limit: Option[Int] = None): DataFrame = {
    val base = load(spark, ledgerPath)
      .filter(col("status") === "success" &&
        col("file_prefix").startsWith(filePrefix))
      // seq breaks created_at (millis) ties for same-JVM uploads;
      // random artifact ids carry no ordering
      .orderBy(col("created_at").desc, col("seq").desc)
      .drop("seq")
    limit.fold(base)(base.limit)
  }
}
