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

  test("interleaveBits produces the Morton order") {
    val rows = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(Lake.interleaveBits($"a", $"b", 2).as("z"))
      .as[Long].collect().toSeq
    // a-bits land at odd positions, b-bits at even:
    // (0,0)→0, (3,0)→0b1010=10, (0,3)→0b0101=5, (3,3)→15, (2,1)→0b1001=9
    assert(rows == Seq(0L, 10L, 5L, 15L, 9L))
  }

  test("z-ordered layout keeps per-file ranges tight on BOTH dimensions") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_partkey", $"l_suppkey")
    Lake.writeZOrdered(li, "l_partkey", "l_suppkey", dir + "/z", numFiles = 16)

    def avgExtent(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min($"l_partkey"), max($"l_partkey"),
            min($"l_suppkey"), max($"l_suppkey")).head()
        ((r.getLong(1) - r.getLong(0)).toDouble,
          (r.getLong(3) - r.getLong(2)).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val whole = li.agg(
      max($"l_partkey") - min($"l_partkey"),
      max($"l_suppkey") - min($"l_suppkey")).head()
    val (fullA, fullB) = (whole.getLong(0).toDouble, whole.getLong(1).toDouble)

    // z-order: every file covers a compact rectangle — both dims tight
    val (za, zb) = avgExtent(dir + "/z")
    assert(za / fullA < 0.6, s"partkey extent ${za / fullA}")
    assert(zb / fullB < 0.6, s"suppkey extent ${zb / fullB}")

    // baseline: sorting by ONE key leaves the other dimension unpruned
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.parquet(dir + "/sorted")
    val (_, sb) = avgExtent(dir + "/sorted")
    assert(sb / fullB > 0.8, s"single-sort suppkey extent ${sb / fullB}")

    // and nothing was lost
    assert(spark.read.parquet(dir + "/z").count() == li.count())
  }

  test("compact folds small files into the target size and keeps the data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(20).write.parquet(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(nFiles == 20)
    val nOut = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(nOut == 1 && nFiles == 1)
    assert(spark.read.parquet(dir).select($"id").as[Long].collect().sorted.toSeq
      == (1L to 10000L))
    // the staging/backup directories are gone
    assert(!new java.io.File(dir + "__old").exists())
    assert(!new java.io.File(dir + "__compacting").exists())
  }

  test("compact self-heals a crash between its two renames") {
    val base = Files.createTempDirectory("graft_heal").toString
    val dir = base + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(dir)
    // simulate a crash window: live path staged away, swap never ran
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "__old")))
    Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(spark.read.parquet(dir).count() == 2)
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("writeZOrdered handles empty input without throwing") {
    val dir = Files.createTempDirectory("graft_zempty").toString + "/z"
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    Lake.writeZOrdered(empty, "a", "b", dir, numFiles = 4)
    assert(spark.read.parquet(dir).count() == 0)
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
