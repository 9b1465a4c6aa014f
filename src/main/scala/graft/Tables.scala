package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated star-schema lake
  * (`/root/testdata/sf*`; see TESTDATA.md) and, in the reference's terms,
  * the moral equivalent of the SQLAlchemy model registry the reference
  * imports (`open_bus_stride_etl/siri/add_ride_durations.py:9-10`).
  *
  * Scans go straight through `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom: predicate pushdown, column pruning and (for a
  * partitioned lake) partition pruning all reach the parquet reader.
  * No schema inference cost: parquet footers carry the schema.
  *
  * At 100 TB the only change is the path (s3a://...) and the layout
  * (directory-partitioned by the natural date key); the API is unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimensions that a 100 TB plan should broadcast rather than
    * shuffle. `region`/`nation` are bounded by geography; `supplier`/
    * `part`/`customer` grow with SF but stay orders of magnitude under
    * the fact tables (`lineitem`, `events`).
    */
  val broadcastableDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The lake stores `events.ts` as parquet TIMESTAMP(NANOS), which
    // Spark 4 rejects by default. Read nanos as long and truncate to
    // micros (integer `div` — never float division: 1.7e18 ns exceeds
    // the 2^53 double mantissa). Truncation matches DuckDB's ns→us cast,
    // so oracle comparisons stay exact. No sub-microsecond residue
    // exists in the data (verified: epoch_ns % 1000 == 0 everywhere).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType && isNanosColumn(name, f.name))
        d.withColumn(f.name,
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(s"${f.name} div 1000")))
      else d
    }
  }

  /** Columns stored as TIMESTAMP(NANOS) in the lake (read back as long). */
  private def isNanosColumn(table: String, column: String): Boolean =
    table == "events" && column == "ts"

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
