package graft

import java.nio.file.Files
import java.sql.Date

import graft.sources.{CsvPackage, TaskLedger}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("CsvPackage writes one csv + metadata, skips unchanged, zips") {
    val dir = Files.createTempDirectory("graft_pkg").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r1 = CsvPackage.write(df, dir, "2024-01-01.10")
    assert(!r1.skipped && r1.rows == 2)
    assert(new java.io.File(r1.csvPath).exists())
    val meta = Files.readString(java.nio.file.Paths.get(r1.metadataPath))
    assert(meta.contains(s""""hash":"sha256:${r1.sha256}""""))
    assert(meta.contains(""""name":"id","type":"bigint""""))

    // identical content → skip (T8); changed content → new hash
    val r2 = CsvPackage.write(df, dir, "2024-01-01.10", Some(r1.sha256))
    assert(r2.skipped && r2.sha256 == r1.sha256)
    val r3 = CsvPackage.write(Seq((3L, "c")).toDF("id", "name"),
      dir, "2024-01-01.10", Some(r1.sha256))
    assert(!r3.skipped && r3.sha256 != r1.sha256)

    val zipPath = CsvPackage.zip(dir, "2024-01-01.10")
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = zf.entries().asIterator()
      val names = Iterator.continually(entries)
        .takeWhile(_.hasNext).map(_.next().getName).toSet
      assert(names == Set("2024-01-01.10.csv", "2024-01-01.10.datapackage.json"))
    } finally zf.close()
  }

  test("readAllStrings round-trips every column as nullable string") {
    val dir = Files.createTempDirectory("graft_csv").toString
    CsvPackage.write(Seq((1L, "x"), (2L, "")).toDF("id", "v"), dir, "legacy")
    val back = CsvPackage.readAllStrings(spark, s"$dir/legacy.csv", Seq("id", "v"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() == 2)
    assert(back.select($"id").as[String].collect().toSet == Set("1", "2"))
  }

  test("TaskLedger: anti-join missing dates, failed retry, catch-up loop") {
    val path = Files.createTempDirectory("graft_ledger").toString + "/ledger"
    val candidates = Seq(
      Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02"),
      Date.valueOf("2024-01-03")).toDF("date")

    // nothing recorded → all dates missing, newest first (O7)
    val m0 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect().toSeq
    assert(m0 == Seq(Date.valueOf("2024-01-03"), Date.valueOf("2024-01-02"),
      Date.valueOf("2024-01-01")))

    // catch-up processes every date once; 01-02 fails and stays missing
    val processed = TaskLedger.catchUp(spark, path, candidates, "agg") {
      d => d != Date.valueOf("2024-01-02")
    }
    assert(processed.toSet == Set(Date.valueOf("2024-01-01"),
      Date.valueOf("2024-01-02"), Date.valueOf("2024-01-03")))
    val m1 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect().toSeq
    assert(m1 == Seq(Date.valueOf("2024-01-02"))) // failed → retry next run

    // a later successful attempt wins over the old failure
    TaskLedger.record(spark, path, Date.valueOf("2024-01-02"), "agg", success = true)
    val m2 = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "agg")
      .as[Date].collect()
    assert(m2.isEmpty)

    // other tasks are unaffected (task_name is part of the key)
    val mOther = TaskLedger.missingDates(candidates, TaskLedger.load(spark, path), "other")
      .as[Date].collect()
    assert(mOther.length == 3)
  }
}
