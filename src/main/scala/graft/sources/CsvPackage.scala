package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's packaging sinks/sources re-expressed (SURVEY.md §2.1):
  *
  *  - S5 (CSV + metadata sink): `DF.dump_to_path` writing `res_1.csv` +
  *    `datapackage.json` with schema + content hash
  *    (`packagers/siri.py:125-128,484-488`);
  *  - S6 (zip packaging): rename + archive → `YYYY-MM-DD.HH.zip`
  *    (`packagers/siri.py:150-160`);
  *  - T8 (change detection): skip re-publish when the content hash is
  *    unchanged (`packagers/siri.py:140-147,194-202`);
  *  - S3 (all-strings CSV source): legacy CSV ingest with every column
  *    read as string (`packagers/siri.py:435-437`).
  *
  * Executors write the CSV shards in parallel; only the tiny
  * driver-side packaging tail (concat-rename, metadata JSON, zip) is
  * sequential — the reference did the whole export through a
  * single-threaded Python row pump. A package is one export unit (one
  * hour of data, §2.9 T6), so `coalesce(1)` bounds only the unit size,
  * not the job: different hours package concurrently.
  */
object CsvPackage {

  case class PackageResult(csvPath: String, metadataPath: String,
                           sha256: String, rows: Long, skipped: Boolean)

  /** Write `df` as ONE csv file + metadata JSON under `dir`. When
    * `skipIfHash` matches the new content hash, nothing is rewritten
    * (T8's skip-unchanged semantics).
    */
  def write(df: DataFrame, dir: String, name: String,
            skipIfHash: Option[String] = None): PackageResult = {
    val tmp = s"$dir/_staging_$name"
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(tmp)
    val shard = new File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no csv shard written under $tmp"))
    val bytes = Files.readAllBytes(shard.toPath)
    val hash = sha256Hex(bytes)
    val rows = math.max(0L, bytes.count(_ == '\n').toLong - 1L) // minus header
    if (skipIfHash.contains(hash)) {
      deleteRecursively(new File(tmp))
      return PackageResult(s"$dir/$name.csv", s"$dir/$name.datapackage.json",
        hash, rows, skipped = true)
    }
    val csvPath = Paths.get(dir, s"$name.csv")
    Files.createDirectories(csvPath.getParent)
    Files.move(shard.toPath, csvPath, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(new File(tmp))
    val metadataPath = Paths.get(dir, s"$name.datapackage.json")
    val fields = df.schema.fields
      .map(f => s"""{"name":"${f.name}","type":"${f.dataType.simpleString}"}""")
      .mkString("[", ",", "]")
    Files.writeString(metadataPath,
      s"""{"name":"$name","hash":"sha256:$hash","rows":$rows,"fields":$fields}""")
    PackageResult(csvPath.toString, metadataPath.toString, hash, rows, skipped = false)
  }

  /** Zip the package pair into `<dir>/<name>.zip` (S6). */
  def zip(dir: String, name: String): String = {
    val zipPath = s"$dir/$name.zip"
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
    try Seq(s"$name.csv", s"$name.datapackage.json").foreach { entry =>
      out.putNextEntry(new ZipEntry(entry))
      out.write(Files.readAllBytes(Paths.get(dir, entry)))
      out.closeEntry()
    } finally out.close()
    zipPath
  }

  /** S3: read a CSV (optionally .gz — decompression is automatic) with
    * EVERY column as a nullable string, the legacy ingest contract. No
    * schema inference pass over the data.
    */
  def readAllStrings(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .schema(StructType(columns.map(c => StructField(c, StringType, nullable = true))))
      .csv(path)

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  private def deleteRecursively(f: File): Unit =
    ObjectStore.deleteRecursively(f)
}
