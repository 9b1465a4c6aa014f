package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** JSON handling (§2.8 F11): q27 extracts by regexp so its DuckDB oracle
  * needs no JSON extension; this spec pins that the production JSON path
  * (`get_json_object` / `from_json`) agrees with the regexp shortcut on
  * the lake's `props` column, and that `to_json` round-trips.
  */
class JsonSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("get_json_object and from_json agree with the regexp extraction") {
    val e = Tables.load(spark, sf, "events")
    val cmp = e.select(
      regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("long").as("via_regex"),
      get_json_object($"props", "$.k").cast("long").as("via_path"),
      from_json($"props", StructType(Seq(StructField("k", LongType))))
        .getField("k").as("via_schema"))
    assert(cmp.filter(
      !($"via_regex" <=> $"via_path") || !($"via_regex" <=> $"via_schema")
    ).count() == 0)
    assert(cmp.filter($"via_path".isNotNull).count() > 0)
  }

  test("to_json round-trips a struct payload") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "name")
      .select(to_json(struct($"id", $"name")).as("j"))
    val back = df.select(
      get_json_object($"j", "$.id").cast("long").as("id"),
      get_json_object($"j", "$.name").as("name"))
      .as[(Long, Option[String])].collect().toSet
    assert(back == Set((1L, Some("a")), (2L, None)))
  }
}
