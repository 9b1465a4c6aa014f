package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.jobs.EnrichAndPackage
import graft.runner.{JobGraph, SiriLake, StrideDags}
import org.apache.spark.sql.functions._

class JobsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hourWindow matches plain ranges and wraps past-midnight windows") {
    import graft.jobs.UpdateAreasFakeGtfs.hourWindow
    import org.apache.spark.sql.functions.col
    val hours = (0 until 24).toDF("h")
    def sel(fromH: Int, untilH: Int): Seq[Int] =
      hours.filter(hourWindow(col("h"), fromH, untilH))
        .as[Int].collect().toSeq.sorted
    assert(sel(7, 9) == Seq(7, 8, 9))           // plain inclusive range
    assert(sel(5, 5) == Seq(5))                 // single-hour window
    assert(sel(22, 2) == Seq(0, 1, 2, 22, 23))  // wraps midnight
  }

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

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Seed a consistent mini-lake: one complete ride (1) whose journey
    * ref resolves to gtfs ride 101, one still-pending ride (2) the
    * watermark gates out of everything downstream.
    */
  private def seedLake(wd: String): Unit = {
    val nullL = lit(null).cast("long")
    SiriLake.seed(Seq((10L, "op1", "line1"))
      .toDF("id", "operator_ref", "line_ref"), wd, "siri_route")
    SiriLake.seed(Seq(
      (1L, 10L, "2024-03-10-17-3", "v1", ts("2024-03-10 08:00:00")),
      (2L, 10L, "2024-03-12-99-9", "v2", ts("2024-03-12 11:30:00")))
      .toDF("id", "siri_route_id", "journey_ref", "vehicle_ref",
        "scheduled_start_time")
      .withColumn("duration_minutes", lit(null).cast("int"))
      .withColumn("first_vehicle_location_id", nullL)
      .withColumn("last_vehicle_location_id", nullL)
      .withColumn("updated_first_last_vehicle_locations", lit(null).cast("timestamp"))
      .withColumn("updated_duration_minutes", lit(null).cast("timestamp"))
      .withColumn("gtfs_ride_id", nullL)
      .withColumn("route_gtfs_ride_id", nullL)
      .withColumn("journey_gtfs_ride_id", nullL)
      .withColumn("scheduled_time_gtfs_ride_id", nullL), wd, "siri_ride")
    SiriLake.seed(Seq((41L, "S100")).toDF("id", "code"), wd, "siri_stop")
    SiriLake.seed(Seq((21L, 1L, 41L, 1), (22L, 2L, 41L, 1))
      .toDF("id", "siri_ride_id", "siri_stop_id", "order")
      .withColumn("gtfs_stop_id", nullL)
      .withColumn("nearest_siri_vehicle_location_id", nullL), wd, "siri_ride_stop")
    SiriLake.seed(Seq((61L, "2024/03/10/08/05")).toDF("id", "snapshot_id"),
      wd, "siri_snapshot")
    SiriLake.seed(Seq(
      (51L, 21L, 61L, ts("2024-03-10 08:05:00"), 32.08, 34.78, 40, 180, 100),
      (52L, 21L, 61L, ts("2024-03-10 08:20:00"), 32.09, 34.78, 42, 181, 900),
      (53L, 22L, 61L, ts("2024-03-12 11:35:00"), 32.10, 34.78, 41, 182, 500))
      .toDF("id", "siri_ride_stop_id", "siri_snapshot_id", "recorded_at_time",
        "lat", "lon", "velocity", "bearing", "distance_from_journey_start")
      .withColumn("distance_from_siri_ride_stop_meters", lit(null).cast("int")),
      wd, "siri_vehicle_location")
    SiriLake.seed(Seq((201L, Date.valueOf("2024-03-10"), "op1", "line1"))
      .toDF("id", "date", "operator_ref", "line_ref"), wd, "gtfs_route")
    SiriLake.seed(Seq((101L, 201L, "17_100324"))
      .toDF("id", "gtfs_route_id", "journey_ref")
      .withColumn("start_time", lit(null).cast("timestamp"))
      .withColumn("end_time", lit(null).cast("timestamp"))
      .withColumn("first_gtfs_ride_stop_id", nullL)
      .withColumn("last_gtfs_ride_stop_id", nullL), wd, "gtfs_ride")
    SiriLake.seed(Seq(
      (301L, Date.valueOf("2024-03-10"), "S100", 32.0853, 34.7818, "TA", "Dizengoff"))
      .toDF("id", "date", "code", "lat", "lon", "city", "name"), wd, "gtfs_stop")
    SiriLake.seed(Seq(
      (401L, 101L, 301L, 1, ts("2024-03-10 08:10:00"), ts("2024-03-10 08:10:00")),
      (402L, 101L, 301L, 2, ts("2024-03-10 08:40:00"), ts("2024-03-10 08:40:00")))
      .toDF("id", "gtfs_ride_id", "gtfs_stop_id", "stop_sequence",
        "arrival_time", "departure_time"), wd, "gtfs_ride_stop")
    // S10/S11 fixtures: an expired raw-storage day (pre-cutoff), an
    // expired parse-failed day (backed up before removal), the latest
    // DB backup dump
    Files.createDirectories(java.nio.file.Paths.get(s"$wd/siri_storage/2024/02/01"))
    Files.writeString(java.nio.file.Paths.get(s"$wd/siri_storage/2024/02/01/raw.br"), "raw")
    Files.createDirectories(java.nio.file.Paths.get(s"$wd/parse_failed/2024/02/01"))
    Files.writeString(java.nio.file.Paths.get(s"$wd/parse_failed/2024/02/01/bad.json"), "{}")
    Files.createDirectories(java.nio.file.Paths.get(s"$wd/siri_storage/stride_db_backup"))
    Files.writeString(java.nio.file.Paths.get(s"$wd/siri_storage/stride_db_backup/stride_db.sql.gz"), "dump")
  }

  test("corpus-prepare DAG: score, dedup, filter, pack, JSONL export") {
    import graft.queries.{CorpusQueries, DedupQueries}
    val wd = Files.createTempDirectory("graft_corpus_dag").toString
    val corpusDag = StrideDags.config.filter(_.name == "graft-corpus-prepare")
    assert(corpusDag.nonEmpty)
    val results = JobGraph.run(spark, corpusDag, StrideDags.registry,
      overrides = Map("work_dir" -> wd, "sf_dir" -> sf))
    assert(results.forall(_.status == "success"), results.mkString("\n"))

    val packed = SiriLake.read(spark, wd, "corpus_packed")
    // every surviving row is its own canonical and above the bar
    val expected = graft.Tables.load(spark, sf, "documents")
      .join(DedupQueries.clusterLabels(spark, sf), "doc_id")
      .filter($"doc_id" === $"canonical_doc_id")
      .filter(graft.functions.TextFunctions.qualityScore($"text")
        >= graft.jobs.CorpusPrepare.MinQuality)
      .count()
    assert(packed.count() == expected && expected > 0)
    // the fused scorer's entropy is bit-identical to q61 (same TextJvm
    // definition, same column round) for every document
    val mismatch = SiriLake.read(spark, wd, "corpus_scores")
      .select($"doc_id", $"entropy".as("e_job"))
      .join(CorpusQueries.q61(spark, sf).select($"doc_id", $"entropy"), "doc_id")
      .filter(!($"e_job" <=> $"entropy")).count()
    assert(mismatch == 0)
    // split fractions follow the md5 discipline (exactly q60's labels)
    val splits = packed.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val q60 = CorpusQueries.q60(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(splits.forall { case (id, sp) => q60(id) == sp })
    // packing restarts per (source, split): no split inherits bin ids
    // consumed by another split's token budget
    val minBins = packed.groupBy($"source", $"split")
      .agg(org.apache.spark.sql.functions.min($"bin_id").as("mn"))
      .select($"mn").as[Long].collect()
    assert(minBins.nonEmpty && minBins.forall(_ == 0L))
    // the JSONL export holds exactly the train split, laid out as one
    // directory per (source, bin) — the bin boundary is physical
    val jsonl = spark.read.json(s"$wd/corpus_train_jsonl")
    assert(jsonl.count() == packed.filter($"split" === "train").count())
    assert(jsonl.columns.contains("bin_id"))
    val srcDirs = new java.io.File(s"$wd/corpus_train_jsonl").listFiles()
      .filter(_.getName.startsWith("source="))
    assert(srcDirs.nonEmpty &&
      srcDirs.forall(_.listFiles().exists(_.getName.startsWith("bin_id="))))
    // the shard export holds the SAME train rows, shuffled into
    // fixed-size shards: every shard but the last is full, positions
    // are a clean 0..size-1 run, and the md5 order mixes sources
    val k = CorpusQueries.ShardDocs
    val shards = spark.read.json(s"$wd/corpus_train_shards")
      .select($"doc_id", $"shard_id", $"pos_in_shard", $"source")
    val nTrain = packed.filter($"split" === "train").count()
    assert(shards.count() == nTrain)
    val byShard = shards.select($"shard_id", $"pos_in_shard")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val lastShard = byShard.keys.max
    byShard.foreach { case (sid, poss) =>
      val size = if (sid == lastShard) nTrain - sid * k else k
      assert(poss == (0L until size), s"shard $sid positions: $poss")
    }
    // shuffle actually interleaves: some full shard holds >1 source
    assert(byShard.size == (nTrain + k - 1) / k)
    val multiSource = shards.groupBy($"shard_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"source").as("ns"))
      .filter($"ns" > 1).count()
    assert(multiSource > 0)
  }

  test("keep_policy=survivor keeps exactly q81's best-quality cluster members") {
    import graft.jobs.CorpusPrepare
    import graft.queries.DedupQueries
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val kept = CorpusPrepare
      .filterPack(spark, sf, scores, dedup, keepPolicy = "survivor")
      .select($"doc_id").as[Long].collect().toSet
    // the DAG's survivor keep must equal q81's selection ∩ quality bar
    val expected = DedupQueries.q81(spark, sf)
      .filter($"is_survivor" &&
        $"quality" >= graft.jobs.CorpusPrepare.MinQuality)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expected && kept.nonEmpty)
    // the policies may keep DIFFERENT counts: a cluster whose min-id
    // copy fails the quality bar but whose best copy passes survives
    // only under the survivor policy — so the only cross-policy
    // invariant is per-cluster: never more than one keeper
    val canonical = CorpusPrepare
      .filterPack(spark, sf, scores, dedup)
      .select($"doc_id").as[Long].collect().toSet
    val labels = DedupQueries.clusterLabels(spark, sf)
      .select($"doc_id", $"canonical_doc_id").as[(Long, Long)]
      .collect().toMap
    assert(kept.groupBy(labels).forall(_._2.size == 1))
    assert(canonical.groupBy(labels).forall(_._2.size == 1))
  }

  test("keep_policy=authority keeps exactly q108's max-rank cluster members") {
    import graft.jobs.CorpusPrepare
    import graft.queries.DedupQueries
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val kept = CorpusPrepare
      .filterPack(spark, sf, scores, dedup, keepPolicy = "authority")
      .select($"doc_id").as[Long].collect().toSet
    // the DAG's authority keep must equal q108's selection ∩ quality bar
    val expected = DedupQueries.q108(spark, sf)
      .filter($"is_survivor")
      .join(scores.filter($"quality" >= CorpusPrepare.MinQuality), "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expected && kept.nonEmpty)
    // per-cluster invariant: never more than one keeper
    val labels = DedupQueries.clusterLabels(spark, sf)
      .select($"doc_id", $"canonical_doc_id").as[(Long, Long)]
      .collect().toMap
    assert(kept.groupBy(labels).forall(_._2.size == 1))
    // this corpus's LSH clusters are symmetric (pairs/triangles — every
    // member ties on rank, so min-id wins and authority coincides with
    // canonical); the policy's BITE is pinned on a constructed
    // asymmetric cluster instead: a non-min-id hub with the highest
    // rank must beat the min-id member
    val labs = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("doc_id", "canonical_doc_id")
    val ranks = Seq((1L, 10L), (2L, 99L), (3L, 10L))
      .toDF("doc_id", "pr_rank")
    val surv = DedupQueries.authoritySurvivors(labs, ranks)
      .filter($"is_survivor").select($"doc_id").as[Long].collect().toSeq
    assert(surv == Seq(2L))
    // a hard-fail policy string stays a hard failure
    val err = intercept[RuntimeException] {
      CorpusPrepare.filterPack(spark, sf, scores, dedup,
        keepPolicy = "authroity").count()
    }
    assert(err.getMessage.contains("unknown keep_policy"))
  }

  test("keep_policy=core keeps exactly the deepest-peel cluster members") {
    import graft.jobs.CorpusPrepare
    import graft.queries.DedupQueries
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val kept = CorpusPrepare
      .filterPack(spark, sf, scores, dedup, keepPolicy = "core")
      .select($"doc_id").as[Long].collect().toSet
    // the DAG's core keep must equal the selector ∩ quality bar
    val expected = DedupQueries.coreSurvivors(
        CorpusPrepare.dedupDecide(spark, sf)
          .filter($"canonical_doc_id".isNotNull),
        DedupQueries.q131(spark, sf))
      .filter($"is_survivor")
      .join(scores.filter($"quality" >= CorpusPrepare.MinQuality), "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expected && kept.nonEmpty)
    // per-cluster invariant: never more than one keeper
    val labels = DedupQueries.clusterLabels(spark, sf)
      .select($"doc_id", $"canonical_doc_id").as[(Long, Long)]
      .collect().toMap
    assert(kept.groupBy(labels).forall(_._2.size == 1))
    // the policy's BITE on a constructed asymmetric cluster: the
    // in-core member beats a later-peeled one regardless of id order,
    // depth ties fall to degree, and a graph-absent member (depth −1,
    // an exact-dup collapsee) loses to any attested member
    val labs = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("doc_id", "canonical_doc_id")
    val peels = Seq(
      (1L, 3L, Some(1L), false), // pendant, peeled round 1
      (2L, 5L, None, true),      // in-core — must win
      (3L, 9L, Some(2L), false)) // deeper than 1, shallower than core
      .toDF("doc_id", "degree", "peel_round", "in_core")
    // doc 4 absent from the graph entirely
    val surv = DedupQueries.coreSurvivors(labs, peels)
      .filter($"is_survivor").select($"doc_id").as[Long].collect().toSeq
    assert(surv == Seq(2L))
    // degree tiebreak at equal depth
    val peels2 = Seq((1L, 3L, Some(1L), false), (2L, 7L, Some(1L), false))
      .toDF("doc_id", "degree", "peel_round", "in_core")
    val surv2 = DedupQueries.coreSurvivors(
        Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "canonical_doc_id"), peels2)
      .filter($"is_survivor").select($"doc_id").as[Long].collect().toSeq
    assert(surv2 == Seq(2L))
  }

  test("publishAnalyticsZOrdered: packed corpus lands z-clustered with " +
    "row fidelity and tight n_tokens extents per file") {
    import graft.jobs.CorpusPrepare
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val packed = CorpusPrepare.filterPack(spark, sf, scores, dedup)
    val dir = java.nio.file.Files.createTempDirectory("graft_zcorpus")
      .toString + "/corpus_z"
    CorpusPrepare.publishAnalyticsZOrdered(packed, dir, numFiles = 8)
    val back = spark.read.parquet(dir)
    // row fidelity: same doc set, no text column in the analytics layout
    assert(back.count() == packed.count())
    assert(back.select($"doc_id").as[Long].collect().toSet ==
      packed.select($"doc_id").as[Long].collect().toSet)
    assert(!back.columns.contains("text"))
    // geometry: the requested file count, each a compact token band —
    // average per-file n_tokens extent well under the global range
    // (the LakeSpec tightness claim, asserted on the corpus publisher)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.toString)
    assert(files.length == 8)
    val whole = packed.agg(max($"n_tokens") - min($"n_tokens")).head()
      .getLong(0).toDouble
    val avgExtent = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"n_tokens"), max($"n_tokens")).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }.sum / files.length
    assert(avgExtent / whole < 0.7, s"token extent ${avgExtent / whole}")
  }

  test("cluster_policy=lpa: community labels refine CC clusters, canonicals " +
    "are members, and the DAG keep only ever grows") {
    import graft.jobs.CorpusPrepare
    import graft.queries.DedupQueries
    val cc = DedupQueries.clusterLabels(spark, sf)
      .select($"doc_id", $"canonical_doc_id").as[(Long, Long)]
      .collect().toMap
    val lpa = CorpusPrepare.dedupDecide(spark, sf, clusterPolicy = "lpa")
      .select($"doc_id", $"canonical_doc_id").as[(Long, Long)]
      .collect().toMap
    assert(lpa.keySet == cc.keySet) // every doc decided under both
    // refinement: two docs sharing an LPA cluster share a CC cluster
    // (labels only travel along edges), so LPA can split but never
    // merge CC clusters
    lpa.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(cc).toSet.size == 1)
    }
    // the canonical is an actual member of its own cluster — the
    // keep_policy=canonical guard (an absent-label canonical would
    // silently drop the whole community)
    lpa.foreach { case (_, canon) => assert(lpa(canon) == canon) }
    // refinement ⇒ at least as many clusters ⇒ at least as many kept
    // docs under the same keep policy
    val scores = CorpusPrepare.score(spark, sf)
    val keptCc = CorpusPrepare
      .filterPack(spark, sf, scores, CorpusPrepare.dedupDecide(spark, sf))
      .select($"doc_id").as[Long].collect().toSet
    val keptLpa = CorpusPrepare
      .filterPack(spark, sf, scores,
        CorpusPrepare.dedupDecide(spark, sf, clusterPolicy = "lpa"))
      .select($"doc_id").as[Long].collect().toSet
    // stronger than a count: a CC-kept doc is its CC cluster's min,
    // hence its LPA sub-cluster's min, hence kept under lpa too
    assert(keptCc.subsetOf(keptLpa) && keptLpa.nonEmpty)
    // per-LPA-cluster invariant: never more than one keeper
    assert(keptLpa.groupBy(lpa).forall(_._2.size == 1))
    // a typo'd policy hard-fails like keep_policy does
    val err = intercept[RuntimeException] {
      CorpusPrepare.dedupDecide(spark, sf, clusterPolicy = "lp")
    }
    assert(err.getMessage.contains("unknown cluster_policy"))
  }

  test("quality_gate=classifier keeps exactly the baseline ∩ q96 keep set") {
    import graft.jobs.CorpusPrepare
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val baseline = CorpusPrepare.filterPack(spark, sf, scores, dedup)
      .select($"doc_id").as[Long].collect().toSet
    val gated = CorpusPrepare
      .filterPack(spark, sf, scores, dedup, classifierGate = true)
      .select($"doc_id").as[Long].collect().toSet
    val modelKeep = graft.queries.SearchQueries.q96(spark, sf)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(gated == (baseline intersect modelKeep))
    // the gate must DO something on this corpus, and not empty it
    assert(gated.nonEmpty && gated != baseline)
  }

  test("token-bounded shard export: budget respected, greedy-full replay matches, sources mixed") {
    import graft.jobs.CorpusPrepare
    val wd = Files.createTempDirectory("graft_tokshard").toString
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    val packed = CorpusPrepare.filterPack(spark, sf, scores, dedup)
    val budget = 2000L
    CorpusPrepare.exportTrainShardsByTokens(packed, s"$wd/shards", budget)
    val shards = spark.read.json(s"$wd/shards")
      .select($"doc_id", $"n_subword", $"shard_id", $"cum_tokens_global",
        $"source")
      .as[(Long, Long, Long, Long, String)].collect()
    val train = packed.filter($"split" === "train")
      .select($"doc_id", $"n_subword").as[(Long, Long)].collect().toMap
    assert(train.nonEmpty && shards.map(_._1).toSet == train.keySet)
    // replay the greedy fill locally in the same md5-permutation order:
    // shard id AND global cumsum must match the export row-for-row
    def hexMd5(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    var cum = 0L
    val expected = train.toSeq
      .sortBy { case (id, _) => (hexMd5(id), id) }
      .map { case (id, n) =>
        cum += n
        id -> ((cum - n) / budget, cum)
      }.toMap
    shards.foreach { case (id, _, sid, cumG, _) =>
      assert(expected(id) == ((sid, cumG)),
        s"doc $id: got ($sid,$cumG), expected ${expected(id)}")
    }
    // shard k owns the docs STARTING in cum range [k·B, (k+1)·B) — the
    // SequencePacking bin contract: a boundary-straddling doc overfills
    // its shard rather than splitting. So the invariants are (a) shards
    // TILE the token axis: every non-final shard's cumsum reaches its
    // boundary (full, nothing deferred), and (b) overfill is bounded by
    // one document, never cumulative
    val cumEnd = shards.groupBy(_._3).view
      .mapValues(_.map(_._4).max).toMap
    val lastShard = cumEnd.keys.max
    assert(lastShard > 0, "budget too large for the corpus — test is vacuous")
    val maxDoc = train.values.max
    (0L until lastShard).foreach { sid =>
      assert(cumEnd(sid) >= (sid + 1) * budget, s"shard $sid under-filled")
      assert(cumEnd(sid) < (sid + 1) * budget + maxDoc,
        s"shard $sid overfilled by more than one doc")
    }
    // the md5 permutation interleaves sources within shards
    assert(shards.groupBy(_._3).values
      .exists(_.map(_._5).distinct.length > 1))
    // and the DAG task honors the shard_tokens kwarg — same rows as the
    // direct API call (the switch is config, not code)
    SiriLake.replace(spark, wd, "corpus_packed", packed)
    StrideDags.registry("corpus.shard_export")(spark,
      Map("work_dir" -> wd, "shard_tokens" -> budget.toString))
    val viaDag = spark.read.json(s"$wd/corpus_train_shards")
      .select($"doc_id", $"shard_id", $"cum_tokens_global")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaDag == shards.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("streamed-ingest corpus DAG ships the identical increment " +
    "artifact as the batch-incremental DAG") {
    import graft.queries.DedupQueries
    import graft.streaming.{DocEv, StreamingCorpus, StreamingDedup}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    // ≥50 clean tokens → quality ≥ 0.5 survives filterPack's bar
    val words = (n: Int, p: String) => (0 until n).map(i => s"$p$i").mkString(" ")
    val dupOfExisting = words(60, "alpha")
    val incPair = words(60, "beta")
    val existing = Seq(
      (1L, "src00", "en", dupOfExisting),
      (2L, "src00", "en", words(60, "gamma")))
    val incoming = Seq( // q58's IncomingSources — the increment
      (101L, "src18", "en", dupOfExisting), // dup of existing → dropped
      (102L, "src18", "en", incPair), // intra-increment pair: 102 kept,
      (103L, "src19", "en", incPair), //   103 → canonical 102, dropped
      (104L, "src19", "en", words(60, "epsilon"))) // unique → kept
    val sfDir = Files.createTempDirectory("graft_sdag_sf").toString
    (existing ++ incoming).toDF("doc_id", "source", "lang", "text")
      .write.parquet(s"$sfDir/documents.parquet")

    // materialize the candidate lake: corpus backfill micro-batch, then
    // the increment micro-batch, through the replay-safe LakeSink
    val candDir = Files.createTempDirectory("graft_sdag_cand").toString
    val in = MemoryStream[DocEv]
    val q = StreamingCorpus.writeCandidates(
        StreamingDedup.candidates(in.toDS(), DedupQueries.NBands,
          DedupQueries.RowsPerBand, horizonMinutes = 60),
        s"$candDir/cand")
      .option("checkpointLocation", s"$candDir/ckpt").start()
    try {
      in.addData(existing.map(r => DocEv(r._1, r._4, ts("2024-01-01 10:00:00"))))
      q.processAllAvailable()
      in.addData(incoming.map(r => DocEv(r._1, r._4, ts("2024-01-01 10:05:00"))))
      q.processAllAvailable()
    } finally q.stop()

    // run BOTH DAGs — streamed ingest vs batch-incremental
    def runDag(name: String, over: Map[String, String]): String = {
      val wd = Files.createTempDirectory(s"graft_sdag_$name").toString
      val dag = StrideDags.config.filter(_.name == name)
      assert(dag.nonEmpty, s"$name not in dags.yaml")
      val res = JobGraph.run(spark, dag, StrideDags.registry,
        overrides = over ++ Map("work_dir" -> wd, "sf_dir" -> sfDir))
      assert(res.forall(_.status == "success"), res.mkString("\n"))
      wd
    }
    val wdS = runDag("graft-corpus-prepare-streamed",
      Map("cand_path" -> s"$candDir/cand"))
    val wdB = runDag("graft-corpus-prepare-incremental", Map.empty)

    def packedOf(wd: String) = SiriLake.read(spark, wd, "corpus_packed")
      .select($"doc_id", $"source", $"split", $"bin_id", $"n_tokens")
      .as[(Long, String, String, Long, Long)].collect().toSet
    val streamed = packedOf(wdS)
    val batch = packedOf(wdB)
    assert(streamed == batch, s"artifacts diverge:\n$streamed\nvs\n$batch")
    // and the increment semantics held: only kept incoming docs shipped
    assert(streamed.map(_._1) == Set(102L, 104L))
  }

  test("bucketed corpus intermediates: doc_id joins run exchange-free") {
    import graft.jobs.CorpusPrepare
    val scores = CorpusPrepare.score(spark, sf)
    val dedup = CorpusPrepare.dedupDecide(spark, sf)
    CorpusPrepare.publishBucketed(spark, sf, scores, dedup, prefix = "jtest")
    // the 3-way doc_id join carries zero exchanges: both joins read
    // co-located buckets (the 100 TB documents side never shuffles)
    val plan = CorpusPrepare.keptBucketed(spark, "jtest")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // identical rows to the flat path, packing included
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select($"doc_id", $"split", $"bin_id", $"cum_tokens" * 0 + $"bin_id")
    val flat = CorpusPrepare.filterPack(spark, sf, scores, dedup)
      .select($"doc_id", $"split", $"bin_id")
      .as[(Long, String, Long)].collect().toSet
    val bucketed = CorpusPrepare.filterPackBucketed(spark, "jtest")
      .select($"doc_id", $"split", $"bin_id")
      .as[(Long, String, Long)].collect().toSet
    assert(flat.nonEmpty && bucketed == flat)
  }

  test("the whole pipeline surface runs from the declarative DAG config") {
    val wd = Files.createTempDirectory("graft_dags").toString
    seedLake(wd)
    // the streamed-ingest DAG is the one config with an external
    // precondition (a candidate lake a running stream materialized —
    // its cand_path has no default by design); its end-to-end run and
    // artifact equality have a dedicated test below
    val timerDags = StrideDags.config
      .filter(_.scheduleInterval != "@continuous")
    val results = JobGraph.run(spark, timerDags, StrideDags.registry,
      overrides = Map("work_dir" -> wd, "sf_dir" -> sf,
        "now" -> "2024-03-12 12:00:00"))
    assert(results.nonEmpty && results.forall(_.status == "success"),
      results.mkString("\n"))

    // gtfs aggregation filled start/end from the ride's stops
    val g = SiriLake.read(spark, wd, "gtfs_ride")
      .select($"id", $"start_time", $"first_gtfs_ride_stop_id",
        $"last_gtfs_ride_stop_id")
      .as[(Long, Timestamp, Option[Long], Option[Long])].head()
    assert(g == ((101L, ts("2024-03-10 08:10:00"), Some(401L), Some(402L))))

    // durations + gtfs matching landed on the complete ride only
    val rides = SiriLake.read(spark, wd, "siri_ride")
      .select($"id", $"duration_minutes", $"gtfs_ride_id",
        $"journey_gtfs_ride_id")
      .as[(Long, Option[Int], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(rides(1L) == ((1L, Some(15), Some(101L), Some(101L))))
    assert(rides(2L) == ((2L, None, None, None))) // pending: gated out

    // ride-stop enrichment: stop-code match + nearest location
    val srs = SiriLake.read(spark, wd, "siri_ride_stop")
      .select($"id", $"gtfs_stop_id", $"nearest_siri_vehicle_location_id")
      .as[(Long, Option[Long], Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(srs(21L) == ((21L, Some(301L), Some(52L)))) // 52 is nearest
    assert(srs(22L) == ((22L, None, None)))
    assert(SiriLake.read(spark, wd, "siri_vehicle_location")
      .filter($"distance_from_siri_ride_stop_meters".isNotNull).count() == 2)

    // packager produced the Israel-local hour package and its artifact
    assert(new java.io.File(s"$wd/packages/2024-03-10.10.zip").exists())
    assert(graft.sources.ArtifactUploader.iterateArtifacts(spark,
      s"$wd/artifact_ledger", "stride-etl-packages/siri/").count() == 1)

    // fake-GTFS: one artifact per (area, gtfs date, hour window), and
    // the in-bbox stop landed in the tel-aviv morning extract
    val fakeArts = graft.sources.ArtifactUploader.iterateArtifacts(spark,
      s"$wd/artifact_ledger", "stride-etl/urbanaccess/areas_fake_gtfs/")
    assert(fakeArts.count() == 3) // (2 + 1) area windows x 1 gtfs date
    assert(new java.io.File(s"$wd/objectstore/artifacts/" +
      "stride-etl/urbanaccess/areas_fake_gtfs/central-district-2024-03-10-07-11.zip").exists())

    // second run of the urbanaccess DAG: everything skips (idempotent)
    val again = graft.runner.JobGraph.run(spark,
      StrideDags.config.filter(_.name.contains("urbanaccess")),
      StrideDags.registry, overrides = Map("work_dir" -> wd))
    assert(again.forall(_.status == "success"))
    assert(graft.sources.ArtifactUploader.iterateArtifacts(spark,
      s"$wd/artifact_ledger", "stride-etl/urbanaccess/").count() == 3)

    // backup+retention: raw day removed outright, parse-failed day
    // backed up then removed, DB dump copied to the dated path
    assert(!new java.io.File(s"$wd/siri_storage/2024/02/01").exists())
    assert(!new java.io.File(s"$wd/parse_failed/2024").exists()) // pruned empty
    assert(new java.io.File(s"$wd/objectstore/" +
      "siri_etl_monitored_stop_visits_parse_failed/2024/02/01.tar.bz2").exists())
    assert(new java.io.File(
      s"$wd/objectstore/stride_db_backups/2024/03/12/120000.sql.gz").exists())
    // the watched DB-backup source file itself is untouched
    assert(new java.io.File(s"$wd/siri_storage/stride_db_backup/stride_db.sql.gz").exists())
  }

  test("storage backup: tar.bz2 contents, __N collision, 7-day cutoff") {
    import graft.jobs.StorageBackup
    import graft.sources.LocalFsObjectStore
    val base = Files.createTempDirectory("graft_bk").toString
    val store = new LocalFsObjectStore(s"$base/store")
    def mkday(day: String, file: String, content: String): Unit = {
      val d = java.nio.file.Paths.get(s"$base/r/$day")
      Files.createDirectories(d)
      Files.writeString(d.resolve(file), content): Unit
    }
    mkday("2024/03/01", "a.txt", "A")  // expired (cutoff = 03-05)
    mkday("2024/03/06", "b.txt", "B")  // within the week: kept
    val cfg = Seq(StorageBackup.RootConfig(s"$base/r", Some("bk")))
    val rep = StorageBackup.run(store, cfg, java.time.LocalDate.parse("2024-03-12"))
    assert(rep.backedUp == Seq("bk/2024/03/01.tar.bz2"))
    assert(rep.removed == Seq("2024/03/01"))
    assert(new java.io.File(s"$base/r/2024/03/06/b.txt").exists())

    // the archive round-trips with ./-relative names
    val dl = Files.createTempFile("graft_bk_dl", ".tar.bz2")
    assert(store.get("bk/2024/03/01.tar.bz2", dl))
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
        Files.newInputStream(dl)))
    try {
      val e = tin.getNextEntry
      assert(e.getName == "./a.txt")
      assert(new String(tin.readAllBytes()) == "A")
      assert(tin.getNextEntry == null)
    } finally tin.close()

    // same day re-appears -> second backup takes the __2 key
    mkday("2024/03/01", "a.txt", "A")
    val rep2 = StorageBackup.run(store, cfg, java.time.LocalDate.parse("2024-03-12"))
    assert(rep2.backedUp == Seq("bk/2024/03/01__2.tar.bz2"))
  }

  test("SiriLake.replace keeps the current version when the new one fails") {
    val wd = Files.createTempDirectory("graft_lake").toString
    SiriLake.seed(Seq((1L, "a")).toDF("id", "v"), wd, "t")
    val bad = Seq((2L, "b")).toDF("id", "v")
      .withColumn("boom", raise_error(lit("new version exploded")))
    intercept[Exception] { SiriLake.replace(spark, wd, "t", bad) }
    // the failed write went to the side directory; the table is intact
    assert(SiriLake.read(spark, wd, "t")
      .select($"id", $"v").as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("shipped DAG config is well-formed and fully resolvable") {
    val dags = StrideDags.config
    assert(dags.nonEmpty)
    assert(dags.map(_.name).distinct.size == dags.size) // unique dag names
    val fns = dags.flatMap(_.tasks).map(_.function).toSet
    val unresolved = fns -- StrideDags.registry.keySet
    assert(unresolved.isEmpty, s"config names unregistered functions: $unresolved")
    // every schedule is one of the reference's two timer tiers, or the
    // streamed-ingest tier (driven by an always-on stream + on-demand
    // decide runs — a timer scheduler must NOT pick it up)
    assert(dags.map(_.scheduleInterval).toSet
      .subsetOf(Set("@hourly", "@daily", "@continuous")))
  }

  test("object store key probe gives up after the attempt budget") {
    val store = new graft.sources.LocalFsObjectStore(
      Files.createTempDirectory("graft_probe").toString)
    val f = Files.createTempFile("graft_probe_src", ".txt")
    Files.writeString(f, "x")
    store.put(f, "k.txt")
    (2 to 3).foreach(n => store.put(f, s"k__$n.txt"))
    // plain + __2 + __3 taken, budget 3 → error; budget 4 → __4
    intercept[RuntimeException] {
      graft.sources.ObjectStore.freeKey(store, "k.txt", n => s"k__$n.txt", 3)
    }
    assert(graft.sources.ObjectStore.freeKey(store, "k.txt",
      n => s"k__$n.txt", 4) == "k__4.txt")
  }

  test("DAG executor: empty-string overrides leave YAML defaults in force") {
    val dags = JobGraph.parseYaml(
      """dags:
        |  - name: d
        |    tasks:
        |      - id: t
        |        function: probe
        |        kwargs:
        |          num_days: {default: "4"}
        |          min_date: {}
        |""".stripMargin)
    var seen: Map[String, String] = Map.empty
    val registry: Map[String, JobGraph.TaskFn] =
      Map("probe" -> ((_, kw) => { seen = kw }))
    // unset CLI flags arrive as "" (and Airflow's literal "None"):
    // neither may erase the default
    JobGraph.run(spark, dags, registry,
      overrides = Map("num_days" -> "", "min_date" -> "None"))
    assert(seen == Map("num_days" -> "4"))
    // a real override wins over the default
    JobGraph.run(spark, dags, registry,
      overrides = Map("num_days" -> "7", "min_date" -> "2024-01-01"))
    assert(seen == Map("num_days" -> "7", "min_date" -> "2024-01-01"))
  }

  test("DAG executor: failed task skips the rest of its DAG only") {
    val dags = JobGraph.parseYaml(
      """dags:
        |  - name: d1
        |    tasks:
        |      - id: t1
        |        function: boom
        |      - id: t2
        |        function: fine
        |  - name: d2
        |    schedule_interval: "@hourly"
        |    tasks:
        |      - id: t3
        |        function: fine
        |""".stripMargin)
    val registry: Map[String, JobGraph.TaskFn] = Map(
      "boom" -> ((_, _) => sys.error("kaput")),
      "fine" -> ((_, _) => ()))
    val rs = JobGraph.run(spark, dags, registry)
    assert(rs.map(r => (r.dag, r.taskId, r.status)) == Seq(
      ("d1", "t1", "error"), ("d1", "t2", "skipped"), ("d2", "t3", "success")))
    assert(rs.head.error.contains("kaput"))
    // schedule filter selects only the matching tier
    val hourly = JobGraph.run(spark, dags, registry,
      scheduleFilter = Some("@hourly"))
    assert(hourly.map(_.taskId) == Seq("t3"))
  }
}
