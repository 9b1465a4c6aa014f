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
    // The lake has stored `events.ts` two ways across driver
    // generations; both must read back as TimestampType (LTZ) carrying
    // the same epoch-micros instant, because every downstream operator
    // (unix_micros, date_trunc, window frames) and every DuckDB oracle
    // assumes instant semantics in the UTC session zone:
    //  * TIMESTAMP(NANOS): Spark 4 rejects it by default — read nanos
    //    as long and truncate to micros below (integer `div`, never
    //    float: 1.7e18 ns exceeds the 2^53 double mantissa; truncation
    //    matches DuckDB's ns→us cast, no sub-us residue in the data).
    //  * TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4's NTZ
    //    inference would surface TIMESTAMP_NTZ, which breaks
    //    unix_micros and every Timestamp-typed encoder. Disable the
    //    inference so naive micros read as the same UTC instants
    //    DuckDB's naive TIMESTAMP sees — values identical to the
    //    nanos-era path, bit-for-bit.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
