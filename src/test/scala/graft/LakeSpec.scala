package graft

import java.nio.file.Files

import graft.operators.SaltedAgg
import graft.sources.Lake
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned lake prunes partitions on day-range scans") {
    val dir = Files.createTempDirectory("graft_lake").toString + "/events"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull)
    Lake.writeFactByDay(events, "ts", "event_id", dir)

    val nDays = events.select(to_date($"ts")).distinct().count()
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("p_date=")) == nDays)

    val scan = Lake.scanDays(spark, dir, "2024-01-10", "2024-01-12")
    val plan = scan.queryExecution.executedPlan.toString
    // the day range must land in PartitionFilters (directory pruning),
    // NOT in PushedFilters (per-file evaluation)
    assert(plan.contains("PartitionFilters: ["))
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
      .contains("p_date"))
    // row counts match the unpartitioned filter
    val expected = events
      .filter(to_date($"ts") >= "2024-01-10" && to_date($"ts") < "2024-01-12")
      .count()
    assert(scan.count() == expected)
  }

  test("bucketed tables join without any exchange") {
    import graft.sources.BucketedLake
    val facts = (0 until 5000).map(i => (i.toLong % 500, i.toDouble))
      .toDF("user_id", "amount")
    val dims = (0L until 500L).map(u => (u, s"user$u")).toDF("user_id", "name")
    BucketedLake.publish(facts, "bk_facts", "user_id", 8)
    BucketedLake.publish(dims, "bk_dims", "user_id", 8)
    val joined = BucketedLake.read(spark, "bk_facts")
      .hint("merge") // force SMJ so the assertion is about exchanges, not broadcast
      .join(BucketedLake.read(spark, "bk_dims"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // co-located: no shuffle either side
    assert(joined.count() == 5000)
  }

  test("salted aggregation equals direct groupBy on skewed data") {
    // hot key 0 carries 10x the rows of every other key
    val skewed = (0 until 11000).map { i =>
      (if (i < 10000) 0L else (i % 100).toLong, i.toDouble)
    }.toDF("k", "v")
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .as[(Long, Double, Long, Double)].collect().toSet
    val salted = SaltedAgg(skewed, Seq("k"), nSalts = 8,
      phase1 = Seq(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx")),
      phase2 = Seq(sum("s").as("s"), sum("n").as("n"), max("mx").as("mx")))
      .as[(Long, Double, Long, Double)].collect().toSet
    assert(salted.map(r => (r._1, r._3, r._4)) == direct.map(r => (r._1, r._3, r._4)))
    // double sums may legitimately differ in association order; compare rounded
    assert(salted.map(r => (r._1, math.round(r._2))) ==
      direct.map(r => (r._1, math.round(r._2))))
  }
}
