package graft

import java.nio.file.Files

import graft.jobs.EnrichAndPackage
import org.apache.spark.sql.functions._

class JobsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("EnrichAndPackage runs end-to-end and is idempotent") {
    val base = Files.createTempDirectory("graft_job").toString
    val r1 = EnrichAndPackage.run(spark, sf, s"$base/t", s"$base/p")
    val nUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(r1.rowsEnriched == nUsers) // update-in-place preserves rows
    assert(r1.daysPackaged.nonEmpty && r1.daysSkipped.isEmpty)
    // every packaged day produced csv + metadata + zip
    r1.daysPackaged.foreach { d =>
      assert(new java.io.File(s"$base/p/$d.csv").exists())
      assert(new java.io.File(s"$base/p/$d.datapackage.json").exists())
      assert(new java.io.File(s"$base/p/$d.zip").exists())
    }

    // durations landed and watermark semantics hold: every user whose
    // last event predates now-6h has a non-null duration
    val updated = spark.read.parquet(s"$base/t/user_durations_next")
    assert(updated.count() == nUsers)
    assert(updated.filter($"duration_min".isNotNull).count() > 0)

    // second run: ledger marks every day done → nothing re-packaged
    val r2 = EnrichAndPackage.run(spark, sf, s"$base/t", s"$base/p")
    assert(r2.daysPackaged.isEmpty)
    assert(r2.daysSkipped.toSet == r1.daysPackaged.toSet)
    assert(r2.rowsEnriched == nUsers) // enrichment re-run stays stable
  }
}
