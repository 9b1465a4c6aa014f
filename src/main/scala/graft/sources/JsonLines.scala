package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) source/sink — the lingua franca of
  * training-data exchange (every public corpus dump, eval set, and
  * annotation batch ships as .jsonl or .jsonl.gz).
  *
  * Read discipline for scale and safety:
  *  - the schema is REQUIRED: schema inference reads the whole corpus
  *    once before the real scan (a 2× cost at 100 TB) and silently
  *    widens types on dirty data;
  *  - corrupt lines land in a quarantine column instead of failing the
  *    job or being silently dropped (PERMISSIVE +
  *    `columnNameOfCorruptRecord`), so ingest can count and sample
  *    them — the reference's sanitation stance (F14) applied to JSON;
  *  - gzip input is fine for archival interchange but each .gz file is
  *    one non-splittable task — repartition after read, or prefer
  *    many smaller files upstream (documented here because it is the
  *    single most common JSONL-at-scale footgun).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Schema-enforced JSONL read with corrupt-line quarantine. The
    * returned frame has the given schema plus [[CorruptCol]] (null for
    * clean rows, the raw line for broken ones).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Clean rows only. Implemented over a TEXT scan + `from_json` with
    * an in-struct corrupt field rather than [[read]]: any downstream
    * query that prunes away every schema column (`.count()` is enough)
    * would otherwise leave the JSON source's internal corrupt column as
    * the scan's only referenced column, which Spark rejects
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Blank lines are skipped (the
    * JSONL convention).
    */
  def readClean(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    val parsed = from_json(col("value"), schema.add(CorruptCol, "string"),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
    spark.read.text(path)
      .filter(trim(col("value")) =!= "" &&
        parsed.getField(CorruptCol).isNull)
      .select(parsed.as("_p"))
      .select((schema.fieldNames.map(f => col(s"_p.$f"))): _*)
  }

  /** The quarantined raw lines, for counting/sampling in ingest
    * reports. Implemented over a TEXT scan + `from_json` (null on a
    * malformed line) rather than the JSON source's internal corrupt
    * column: Spark rejects any query whose scan references only
    * `_corrupt_record` (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
    * library function should not have to cache to count its own
    * rejects. Blank lines are not corrupt (the JSONL convention
    * ignores them).
    */
  def corruptLines(spark: SparkSession, path: String,
                   schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions._
    // from_json yields an all-null struct (not null) on malformed input,
    // so route the raw line into an in-struct corrupt field, exactly as
    // the JSON source does
    val parsed = from_json(col("value"), schema.add(CorruptCol, "string"),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol))
    spark.read.text(path)
      .filter(trim(col("value")) =!= "" &&
        parsed.getField(CorruptCol).isNotNull)
      .select(col("value").as(CorruptCol))
  }

  /** JSONL write; `gzipped` trades splittability for interchange size
    * (see class doc). `numFiles` bounds the file count the same way
    * [[Lake.compact]] does after the fact. `partitionCols` lays the
    * export out as one directory per key (shard-per-bin exports) —
    * partition values live in the path, not the row body, and come
    * back as columns on read.
    */
  def write(df: DataFrame, path: String, numFiles: Int = 0,
            gzipped: Boolean = false,
            partitionCols: Seq[String] = Nil): Unit = {
    val out = if (numFiles > 0) df.coalesce(numFiles) else df
    val w0 = out.write.mode("overwrite")
    val w1 = if (partitionCols.nonEmpty) w0.partitionBy(partitionCols: _*) else w0
    (if (gzipped) w1.option("compression", "gzip") else w1).json(path)
  }
}
