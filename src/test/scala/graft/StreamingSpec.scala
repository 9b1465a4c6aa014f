package graft

import java.sql.Timestamp

import graft.streaming.{DocEv, Ev, EventStreams, StreamingDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming near-dup: banded state pairs a late near-duplicate with its original") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEv]
    val q = StreamingDedup.candidates(in.toDS(),
        nBands = 8, rowsPerBand = 2, horizonMinutes = 60)
      .writeStream.format("memory").queryName("sdup")
      .outputMode("append").start()
    try {
      val base = (0 until 30).map(i => s"w$i").mkString(" ")
      val other = (0 until 30).map(i => s"zz$i").mkString(" ")
      in.addData(DocEv(1L, base, ts("2024-01-01 10:00:00")),
        DocEv(2L, other, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // a near-identical doc arrives in a LATER micro-batch: the
      // per-band state pairs it with doc 1 (identical signature → every
      // band collides), never with the unrelated doc 2
      in.addData(DocEv(3L, base, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val pairRows = StreamingDedup.pairs(
        spark.table("sdup").as[graft.streaming.DupCandidate])
        .collect()
      // the 8 band collisions collapse to ONE distinct pair
      assert(pairRows.toSeq == Seq((1L, 3L)))
      // every one of the 8 bands reported the collision
      assert(spark.table("sdup").count() == 8)
      // replaying doc 3 adds no self-pairs
      in.addData(DocEv(3L, base, ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      assert(spark.table("sdup").count() == 8)
    } finally q.stop()
  }

  test("pairsForEachBatch emits one distinct pair per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamingDedup.pairsForEachBatch(
        StreamingDedup.candidates(in.toDS(),
          nBands = 8, rowsPerBand = 2, horizonMinutes = 60)) { batch =>
        got.synchronized { got ++= batch.collect() }: Unit
      }.start()
    try {
      val base = (0 until 30).map(i => s"w$i").mkString(" ")
      in.addData(DocEv(1L, base, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // identical doc in a later batch: 8 band collisions arrive in ONE
      // micro-batch and collapse to a single distinct pair
      in.addData(DocEv(3L, base, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(got.synchronized(got.toSeq) == Seq((1L, 3L)))
    } finally q.stop()
  }

  test("hourlyStats aggregates per (hour, type) over micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.hourlyStats(in.toDF())
      .writeStream.format("memory").queryName("hs")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(1, 10, "click", ts("2024-01-01 10:05:00"), 1.0),
        Ev(2, 10, "click", ts("2024-01-01 10:55:00"), 2.0),
        Ev(3, 11, "view", ts("2024-01-01 10:10:00"), 5.0))
      q.processAllAvailable()
      in.addData(Ev(4, 10, "click", ts("2024-01-01 11:05:00"), 4.0))
      q.processAllAvailable()
      val rows = spark.table("hs")
        .select($"hour", $"event_type", $"n_events", $"sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 10:00:00"), "view", 1L, 5.0),
        (ts("2024-01-01 11:00:00"), "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sc = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    val q = EventStreams.intervalJoin(l.toDS(), r.toDS(), withinMinutes = 30)
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append()).start()
    try {
      l.addData(Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0))
      r.addData(
        Ev(101, 10, "buy", ts("2024-01-01 10:10:00"), 5.0),  // +10m: joins
        Ev(102, 10, "buy", ts("2024-01-01 11:00:00"), 9.0),  // +60m: outside
        Ev(103, 10, "buy", ts("2024-01-01 09:50:00"), 7.0),  // before: outside
        Ev(104, 99, "buy", ts("2024-01-01 10:10:00"), 3.0))  // other user
      q.processAllAvailable()
      // a right row arriving in a LATER batch still joins (within state)
      r.addData(Ev(105, 10, "buy", ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("ivj")
        .select($"l_event_id", $"r_event_id", $"value_delta")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 101L, 4.0), (1L, 105L, 1.0)))
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and on event-time timeout") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // session 1: two events 10 min apart; then a 2-hour gap within the
      // same batch closes it immediately
      in.addData(
        Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0),
        Ev(2, 10, "click", ts("2024-01-01 10:10:00"), 2.0),
        Ev(3, 10, "click", ts("2024-01-01 12:30:00"), 4.0))
      q.processAllAvailable()
      // advancing the watermark far past 12:30+30min times out the open
      // session — emission is event-time-driven, not wall-clock-driven
      in.addData(Ev(9, 99, "click", ts("2024-01-01 23:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(Ev(10, 99, "click", ts("2024-01-02 23:00:00"), 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .select($"user_id", $"session_start", $"session_end", $"n_events", $"total_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(sessions.contains(
        (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0)))
      assert(sessions.contains(
        (10L, ts("2024-01-01 12:30:00"), ts("2024-01-01 12:30:00"), 1L, 4.0)))
    } finally q.stop()
  }

  test("file-source stream catches up over a parquet directory (AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString + "/in"
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    events.write.parquet(dir)
    val q = EventStreams.hourlyStats(EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("fs_hs")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      val streamed = spark.table("fs_hs")
        .agg(org.apache.spark.sql.functions.sum($"n_events")).as[Long].head()
      assert(streamed == events.count())
    } finally q.stop()
  }

  test("dedupWithinWatermark drops replayed ids across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0),
        Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0), // in-batch dup
        Ev(2, 10, "click", ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0)) // replay
      q.processAllAvailable()
      in.addData(Ev(3, 10, "click", ts("2024-01-01 10:10:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dd").select($"event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("LakeSink appends batches idempotently (replay-safe)") {
    import graft.streaming.LakeSink
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val in = MemoryStream[Ev]
    val q = LakeSink.writeTo(in.toDF(), dir).start()
    try {
      in.addData(Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(Ev(2, 11, "view", ts("2024-01-01 11:00:00"), 2.0))
      q.processAllAvailable()
      val read = spark.read.parquet(dir)
      assert(read.count() == 2)
      // batch id is a partition column readers can audit/prune on
      assert(read.columns.contains("batch_id"))
      assert(read.select($"batch_id").distinct().count() == 2)
      // a REPLAYED batch (same id) rewrites its directory, no dup rows
      LakeSink.appendIdempotent(
        Seq(Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0)).toDF(),
        batchId = 0L, dir)
      assert(spark.read.parquet(dir).count() == 2)
    } finally q.stop()
  }

  test("batch q42 and streaming sessionize agree on the same events") {
    // the lake's events at sf0.001 through the BATCH sessionizer vs the
    // same rows folded through the streaming session logic (state-machine
    // equivalence, gap = 6h to match q42)
    val sfDir = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q42(spark, sfDir)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val evs = Tables.load(spark, sfDir, "events")
      .filter($"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
    val gapMs = 6 * 3600 * 1000L
    // keep the original Timestamp objects: the lake has microsecond
    // precision, which epoch-millis reconstruction would truncate
    val replay = evs.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Timestamp, Timestamp, Long)]
      var start = sorted.head.ts
      var last = sorted.head.ts
      var n = 0L
      sorted.foreach { e =>
        if (e.ts.getTime - last.getTime > gapMs) {
          sessions += ((uid, start, last, n))
          start = e.ts; n = 0
        }
        last = e.ts; n += 1
      }
      sessions += ((uid, start, last, n))
      sessions
    }.toSet
    assert(batch == replay)
  }

  test("streaming candidates through the lake decide exactly like batch q58") {
    // e2e: existing corpus streams through in micro-batch 1, the
    // incoming batch in micro-batch 2; candidates materialize via
    // LakeSink and the SAME decisionFromCandidates policy code as q58.
    // The batch side runs real q58 over a documents table holding the
    // same rows — keep/drop decisions must be identical.
    import graft.queries.DedupQueries
    import graft.streaming.StreamingCorpus
    implicit val sqlCtx = spark.sqlContext

    val words = (n: Int, p: String) => (0 until n).map(i => s"$p$i").mkString(" ")
    val dupOfExisting = words(30, "alpha")
    val incPair = words(30, "beta")
    val existing = Seq( // sources OUTSIDE IncomingSources = the corpus
      (1L, "src00", dupOfExisting),
      (2L, "src00", words(30, "gamma")),
      (3L, "src01", words(30, "delta")))
    val incoming = Seq( // q58's IncomingSources
      (101L, "src18", dupOfExisting), // linked to existing → dropped
      (102L, "src18", incPair), // incoming-only near-dup pair:
      (103L, "src19", incPair), //   canonical 102 kept, 103 dropped
      (104L, "src19", words(30, "epsilon"))) // unique → kept
    assert(incoming.forall(r => DedupQueries.IncomingSources.contains(r._2)))

    // batch path: q58 over a documents table with these exact rows
    val sfDir = java.nio.file.Files.createTempDirectory("graft_sc_sf").toString
    (existing ++ incoming).toDF("doc_id", "source", "text")
      .write.parquet(s"$sfDir/documents.parquet")
    val batch = DedupQueries.q58(spark, sfDir)
      .select($"doc_id", $"linked_existing", $"canonical_doc_id", $"kept")
      .as[(Long, Boolean, Long, Boolean)].collect().toSet

    // streaming path: corpus backfill then the incoming micro-batch
    val candDir = java.nio.file.Files.createTempDirectory("graft_sc").toString
    val in = MemoryStream[DocEv]
    val q = StreamingCorpus.writeCandidates(
        StreamingDedup.candidates(in.toDS(),
          DedupQueries.NBands, DedupQueries.RowsPerBand,
          horizonMinutes = 60), s"$candDir/cand")
      .option("checkpointLocation", s"$candDir/ckpt").start()
    try {
      in.addData(existing.map(r =>
        DocEv(r._1, r._3, ts("2024-01-01 10:00:00"))))
      q.processAllAvailable()
      in.addData(incoming.map(r =>
        DocEv(r._1, r._3, ts("2024-01-01 10:05:00"))))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingCorpus.decide(spark, s"$candDir/cand",
        incoming.map(_._1).toDF("doc_id"))
      .select($"doc_id", $"linked_existing", $"canonical_doc_id", $"kept")
      .as[(Long, Boolean, Long, Boolean)].collect().toSet

    assert(batch == Set(
      (101L, true, 101L, false),
      (102L, false, 102L, true),
      (103L, false, 102L, false),
      (104L, false, 104L, true)))
    assert(streamed == batch)
  }

  test("blocklistMonitor: streamed verdicts equal the batch ones, bloom " +
    "never misses a true member") {
    import graft.streaming.StreamingCorpus
    implicit val sqlCtx = spark.sqlContext
    // blocklist: the 3-gram "a b c" (plus its own shingle set)
    val bloom = Seq("a b c").toDF("s").stat.bloomFilter("s", 10L, 0.01)
    val docs = Seq(
      DocEv(1L, "a b c d e", ts("2024-01-01 10:00:00")), // hits at pos 0
      DocEv(2L, "d e f g h", ts("2024-01-01 10:01:00")), // clean
      DocEv(3L, "x a b c", ts("2024-01-01 10:02:00")),   // hits at pos 1
      DocEv(4L, "a b", ts("2024-01-01 10:03:00")))       // too short to shingle
    val in = MemoryStream[DocEv]
    val q = StreamingCorpus.blocklistMonitor(in.toDS(), bloom)
      .writeStream.format("memory").queryName("blm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("blm")
        .select($"doc_id", $"n_bloom_hits", $"flagged")
        .as[(Long, Long, Boolean)].collect().toSet
      // the same stateless map over a BATCH frame: identical verdicts
      val batch = StreamingCorpus.blocklistMonitor(docs.toDS(), bloom)
        .select($"doc_id", $"n_bloom_hits", $"flagged")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
      val byId = streamed.map(r => r._1 -> ((r._2, r._3))).toMap
      assert(byId(1L)._2 && byId(1L)._1 >= 1L) // no false negatives
      assert(byId(3L)._2)
      assert(byId(4L) == ((0L, false))) // sub-shingle docs never flag
      // doc 2's shingles are non-members; at fpp 0.01 over 3 probes a
      // flag would be a ~3% fluke — assert the deterministic outcome
      assert(!byId(2L)._2)
    } finally q.stop()
  }

  test("anomalyMonitor: streamed scores equal batch q102 row-for-row, " +
    "state survives a micro-batch split") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    val subset = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull && $"user_id" < 8)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    subset.coalesce(1).write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.TimeseriesQueries.q102(spark, dir)
      .select($"event_id", $"mean_centi", $"z_centi", $"is_anomaly")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      .toSet
    // split the feed mid-stream in global event-time order: per user,
    // everything in batch 1 precedes batch 2, so the carried state is
    // genuinely exercised
    val evs = subset.as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val in = MemoryStream[Ev]
    val q = EventStreams.anomalyMonitor(in.toDS())
      .writeStream.format("memory").queryName("anm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(second.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("anm")
        .select($"event_id", $"mean_centi", $"z_centi", $"is_anomaly")
        .as[(Long, Long, Option[Long], Boolean)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      assert(streamed.exists(_._3.isDefined))
    } finally q.stop()
  }

  test("rollingFeatures: streamed features equal batch q105 row-for-row, " +
    "eviction keeps state window-bounded across a micro-batch split") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_roll").toString
    val subset = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull && $"user_id" < 8)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    subset.coalesce(1).write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.TimeseriesQueries.q105(spark, dir)
      .select($"event_id", $"n_1h", $"sum_centi_1h", $"n_24h", $"sum_centi_24h")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val evs = subset.as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val in = MemoryStream[Ev]
    val q = EventStreams.rollingFeatures(in.toDS())
      .writeStream.format("memory").queryName("roll")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(second.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("roll")
        .select($"event_id", $"n_1h", $"sum_centi_1h", $"n_24h", $"sum_centi_24h")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // the features are non-trivial: some event must have >1 in-window
      assert(streamed.exists(_._4 > 1L))
    } finally q.stop()
  }

  test("funnelMonitor: latest streamed row per user equals batch q110 " +
    "across a micro-batch split; emits only on advancement") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_funl").toString
    val subset = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull && $"value".isNotNull && $"event_type".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    subset.coalesce(1).write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.TimeseriesQueries.q110(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    val evs = subset.as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val in = MemoryStream[Ev]
    val q = EventStreams.funnelMonitor(in.toDS())
      .writeStream.format("memory").queryName("funl")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(second.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("funl")
        .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect()
      // per user keep the deepest (latest) emission
      val last = streamed.groupBy(_._1).map { case (u, rs) =>
        u -> rs.maxBy(_._2)
      }
      assert(last.nonEmpty)
      // every streamed user matches batch exactly; batch-only users are
      // those whose funnel events never advanced past emission (none —
      // step 1 alone already emits), so key sets agree on users with
      // at least one completed step
      val batchStarted = batch.filter(_._2._2 > 0)
      assert(last.toMap == batchStarted)
      // emissions are transitions only: at most one per user per batch
      assert(streamed.groupBy(_._1).forall(_._2.length <= 2))
    } finally q.stop()
  }

  test("funnelMonitor idle TTL: an expired user's funnel is forgotten and " +
    "restarts fresh; an active user within TTL keeps their step times") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.funnelMonitor(in.toDS(), idleTimeoutHours = Some(4))
      .writeStream.format("memory").queryName("funlttl")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 and user 2 both reach step 1 at 08:00
      in.addData(Ev(1L, 1L, "view", ts("2024-01-01 08:00:00"), 1.0),
        Ev(2L, 2L, "view", ts("2024-01-01 08:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2: user 2 stays active at 10:00 (inside their 4h TTL);
      // the 10:00 watermark does not expire anyone yet
      in.addData(Ev(3L, 2L, "click", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // batch 3: a 20:00 event pushes the watermark past user 1's
      // 12:00 expiry (and user 2's 14:00) — both states drop
      in.addData(Ev(4L, 3L, "view", ts("2024-01-01 20:00:00"), 1.0))
      q.processAllAvailable()
      // batch 4: user 1 returns with a CLICK — with their view
      // forgotten it cannot advance; then a fresh view restarts the
      // funnel with the NEW time, not the 08:00 one
      in.addData(Ev(5L, 1L, "click", ts("2024-01-01 20:30:00"), 1.0))
      q.processAllAvailable()
      in.addData(Ev(6L, 1L, "view", ts("2024-01-01 20:40:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("funlttl")
        .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect()
      def us(s: String) = Some(ts(s).getTime * 1000L)
      val u1 = rows.filter(_._1 == 1L).sortBy(_._3)
      // user 1: the 08:00 step-1 row, then the fresh 20:40 restart —
      // and NO step-2 row from the post-expiry click
      assert(u1.map(r => (r._2, r._3)).toSeq ==
        Seq((1L, us("2024-01-01 08:00:00")), (1L, us("2024-01-01 20:40:00"))))
      // user 2 advanced to step 2 while inside the TTL
      assert(rows.filter(_._1 == 2L).map(_._2).max == 2L)
    } finally q.stop()
  }

  test("funnelMonitor state survives a checkpointed restart: step times " +
    "from before the stop persist into the recovered query") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fout").toString
    def t(sec: Int) = ts(f"2024-01-01 10:00:$sec%02d")
    val in = MemoryStream[Ev]
    def start() = EventStreams.funnelMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // batch 1: the user reaches step 1 (view) — then the query STOPS
    val q1 = start()
    try {
      in.addData(Ev(1L, 7L, "view", t(0), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: the recovered state must carry
    // t_view, so a click alone completes step 2 with the ORIGINAL time
    val q2 = start()
    try {
      in.addData(Ev(2L, 7L, "click", t(5), 1.0),
        Ev(3L, 7L, "purchase", t(9), 1.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(outDir)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._2)
    def us(sec: Int) = Some(t(sec).getTime * 1000L)
    // one emission per advancing micro-batch: (1 step) then (3 steps)
    assert(rows.map(_._2).toSeq == Seq(1L, 3L))
    assert(rows.last == ((7L, 3L, us(0), us(5), us(9))))
  }

  test("kmvUsersMonitor: streamed sketch equals batch q115 EXACTLY under " +
    "shuffled arrival and micro-batch splits (order-free state)") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.queries.SamplingQueries
      .q115(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"kmv_users").as[(String, Long)]
      .collect().toMap
    val evs = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"user_id".isNotNull && $"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
    // adversarial arrival: deterministic shuffle, three uneven batches
    val shuffled = new scala.util.Random(7).shuffle(evs.toVector)
    val parts = Seq(shuffled.take(100), shuffled.slice(100, 101),
      shuffled.drop(101))
    val in = MemoryStream[Ev]
    val q = EventStreams.kmvUsersMonitor(in.toDS())
      .writeStream.format("memory").queryName("kmv")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      // the LAST emission per type is the full-set sketch — exactly
      // the batch value, because KMV state is a function of the set
      val streamed = spark.table("kmv")
        .as[(String, Long)].collect()
        .grouped(1).toSeq // keep arrival order
      val last = streamed.flatten.foldLeft(Map.empty[String, Long]) {
        case (m, (t, v)) => m + (t -> v)
      }
      // batch q115 filters only user_id; the stream subset also drops
      // null ts/value rows — on this dataset those filters drop no
      // user coverage, so the sketches agree (asserted, not assumed)
      assert(last == batch && last.nonEmpty)
    } finally q.stop()
  }

  test("classifierMonitor: streamed q96 verdicts equal the batch query's") {
    import graft.streaming.StreamingCorpus
    implicit val sqlCtx = spark.sqlContext
    // score real corpus documents through the stream so the equality
    // check runs against q96 itself, not a reimplementation
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().take(50)
      .zipWithIndex
      .map { case ((id, text), i) =>
        DocEv(id, text, ts(f"2024-01-01 10:${i % 60}%02d:00")) }
    val in = MemoryStream[DocEv]
    val q = StreamingCorpus.classifierMonitor(in.toDS())
      .writeStream.format("memory").queryName("clm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("clm")
        .select($"doc_id", $"feat_sum", $"keep")
        .as[(Long, Long, Boolean)].collect().toSet
      val expected = graft.queries.SearchQueries
        .q96(spark, "/root/testdata/sf0.001")
        .filter($"doc_id".isin(docs.map(_.doc_id).toIndexedSeq: _*))
        .select($"doc_id", $"feat_sum", $"keep")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(streamed == expected && streamed.nonEmpty)
      assert(streamed.exists(_._3) && streamed.exists(!_._3))
    } finally q.stop()
  }

  test("mediaMonitor: streamed AVI metadata equals the batch q40 decode; " +
    "a corrupt container is quarantined, not thrown") {
    import graft.streaming.{MediaEv, StreamingCorpus}
    implicit val sqlCtx = spark.sqlContext
    // real generator payloads, so the equality check runs against the
    // q40 batch decode itself, not a reimplementation
    val ids = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id").as[Long].collect().take(20)
    val events = ids.zipWithIndex.map { case (id, i) =>
      MediaEv(id, graft.queries.MultimodalQueries.aviPayload(id),
        ts(f"2024-01-01 10:${i % 60}%02d:00"))
    }
    val goodBytes = graft.queries.MultimodalQueries.aviPayload(ids.head)
    val corrupt = MediaEv(-1L, goodBytes.take(goodBytes.length / 2),
      ts("2024-01-01 10:59:00"))
    val in = MemoryStream[MediaEv]
    val q = StreamingCorpus.mediaMonitor(in.toDS())
      .writeStream.format("memory").queryName("mm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((events :+ corrupt).toIndexedSeq: _*)
      q.processAllAvailable()
      val rows = spark.table("mm")
        .select($"doc_id", $"n_bytes", $"width", $"height", $"n_frames",
          $"ok")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      val streamed = rows.filter(_._6)
        .map(r => (r._1, r._2, r._3, r._4)).toSet
      val batch = graft.queries.MultimodalQueries
        .q40(spark, "/root/testdata/sf0.001")
        .filter($"doc_id".isin(ids.toIndexedSeq: _*))
        .select($"doc_id", $"n_bytes", $"width", $"height")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // frame count decoded from the container, not echoed
      rows.filter(_._6).foreach { r =>
        assert(r._5 == graft.queries.MultimodalQueries.aviFrames(r._1))
      }
      // the truncated container arrived, was flagged, and did not kill
      // the stream (every good row above came through the same batch)
      val bad = rows.filter(!_._6)
      assert(bad.map(_._1).toSeq == Seq(-1L))
      assert(bad.head._3 == -1L && bad.head._4 == -1L)
    } finally q.stop()
  }

  test("audioMonitor: streamed WAV features equal the batch q118 decode; " +
    "a corrupt container is quarantined, not thrown") {
    import graft.streaming.{MediaEv, StreamingCorpus}
    implicit val sqlCtx = spark.sqlContext
    // real generator payloads (the q118 WavCodec containers), so the
    // equality check runs against the batch decode itself
    val sample = graft.queries.MultimodalQueries
      .realWavMedia(spark, "/root/testdata/sf0.001").collect().take(20)
    val events = sample.zipWithIndex.map { case (m, i) =>
      MediaEv(m.doc_id, m.payload, ts(f"2024-01-01 10:${i % 60}%02d:00"))
    }
    val corrupt = MediaEv(-1L, sample.head.payload.take(20),
      ts("2024-01-01 10:59:00"))
    val in = MemoryStream[MediaEv]
    val q = StreamingCorpus.audioMonitor(in.toDS())
      .writeStream.format("memory").queryName("am")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((events :+ corrupt).toIndexedSeq: _*)
      q.processAllAvailable()
      val rows = spark.table("am")
        .select($"doc_id", $"n_samples", $"sample_rate", $"sum_abs",
          $"n_transitions", $"ok")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      val ids = sample.map(_.doc_id).toSet
      val streamed = rows.filter(_._6)
        .map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
      val batch = graft.queries.MultimodalQueries
        .q118(spark, "/root/testdata/sf0.001")
        .filter($"doc_id".isin(ids.toSeq: _*))
        .select($"doc_id", $"n_samples", $"sample_rate", $"sum_abs",
          $"n_transitions")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // the truncated container arrived, was flagged, and did not kill
      // the stream (every good row above came through the same batch)
      val bad = rows.filter(!_._6)
      assert(bad.map(_._1).toSeq == Seq(-1L))
      assert(bad.head._2 == -1L && bad.head._4 == -1L)
    } finally q.stop()
  }

  test("audioMonitor quarantines a WELL-FORMED stereo container: batch " +
    "q118 requires mono PCM16, so the stream must not pass it through") {
    import graft.streaming.{MediaEv, StreamingCorpus}
    import java.nio.{ByteBuffer, ByteOrder}
    implicit val sqlCtx = spark.sqlContext
    // a structurally valid 2-channel PCM16 container: take a mono clip
    // and re-true channels/byteRate/blockAlign consistently, so
    // WavCodec.decode ACCEPTS it and only the monitor's format gate
    // can reject it
    val stereo = {
      val b = graft.functions.WavCodec
        .encode(8000, Array.tabulate(100)(i => (i - 50).toShort)).clone()
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(22, 2.toShort) // nChannels
      bb.putInt(28, 8000 * 4)    // byteRate = rate · blockAlign
      bb.putShort(32, 4.toShort) // blockAlign = channels · 2
      b
    }
    assert(graft.functions.WavCodec.decode(stereo).meta.channels == 2)
    val good = graft.queries.MultimodalQueries
      .realWavMedia(spark, "/root/testdata/sf0.001").collect().head
    val in = MemoryStream[MediaEv]
    val q = StreamingCorpus.audioMonitor(in.toDS())
      .writeStream.format("memory").queryName("am2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(MediaEv(good.doc_id, good.payload, ts("2024-01-01 10:00:00")),
        MediaEv(-2L, stereo, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      val rows = spark.table("am2").select($"doc_id", $"ok")
        .as[(Long, Boolean)].collect().toMap
      assert(rows(good.doc_id))
      assert(!rows(-2L), "stereo container must be quarantined, not scored")
    } finally q.stop()
  }

  test("mediaMonitor survives a checkpointed restart: verdict rows stay " +
    "contiguous across the stop, no container is re-decoded twice") {
    import graft.streaming.{MediaEv, StreamingCorpus}
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_mout").toString
    val ids = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id").as[Long].collect().take(12)
    def ev(id: Long, i: Int) =
      MediaEv(id, graft.queries.MultimodalQueries.aviPayload(id),
        ts(f"2024-01-01 10:${i % 60}%02d:00"))
    val (first, second) = ids.zipWithIndex.map((ev _).tupled).splitAt(7)
    val in = MemoryStream[MediaEv]
    def start() = StreamingCorpus.mediaMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // batch 1 decodes the first tranche — then the query STOPS
    val q1 = start()
    try { in.addData(first.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: the monitor is a stateless
    // per-row decode, so recovery must (a) not replay tranche 1 into
    // duplicate verdict rows and (b) decode tranche 2 normally
    val q2 = start()
    try { in.addData(second.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(outDir)
      .select($"doc_id", $"n_bytes", $"ok")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == ids.length, "re-decode duplicates or lost rows")
    assert(rows.map(_._1).sorted.toSeq == ids.sorted.toSeq)
    rows.foreach { case (id, nBytes, ok) =>
      assert(ok)
      assert(nBytes == graft.queries.MultimodalQueries.aviPayload(id).length)
    }
  }

  test("audioMonitor survives a checkpointed restart: verdict rows stay " +
    "contiguous across the stop, no clip is re-decoded twice") {
    import graft.streaming.{MediaEv, StreamingCorpus}
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ack").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_aout").toString
    val clips = graft.queries.MultimodalQueries
      .realWavMedia(spark, "/root/testdata/sf0.001").collect().take(12)
    def ev(m: graft.queries.MultimodalQueries.MediaIn, i: Int) =
      MediaEv(m.doc_id, m.payload, ts(f"2024-01-01 10:${i % 60}%02d:00"))
    val (first, second) = clips.zipWithIndex.map((ev _).tupled).splitAt(7)
    val in = MemoryStream[MediaEv]
    def start() = StreamingCorpus.audioMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // batch 1 decodes the first tranche — then the query STOPS
    val q1 = start()
    try { in.addData(first.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: like mediaMonitor the decode is
    // a stateless per-row map, so recovery must (a) not replay tranche 1
    // into duplicate verdict rows and (b) decode tranche 2 normally
    val q2 = start()
    try { in.addData(second.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(outDir)
      .select($"doc_id", $"n_bytes", $"ok")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == clips.length, "re-decode duplicates or lost rows")
    assert(rows.map(_._1).sorted.toSeq == clips.map(_.doc_id).sorted.toSeq)
    val sizeById = clips.map(c => c.doc_id -> c.payload.length.toLong).toMap
    rows.foreach { case (id, nBytes, ok) =>
      assert(ok)
      assert(nBytes == sizeById(id))
    }
  }

  test("qualityMonitor: windowed quality matches the batch TextJvm math, " +
    "watermark drops a too-late document") {
    import graft.streaming.StreamingCorpus
    implicit val sqlCtx = spark.sqlContext
    val good = (0 until 60).map(i => s"w$i").mkString(" ") // long, clean
    val bad = "x!!! y???"                                  // short, punct-heavy
    val in = MemoryStream[DocEv]
    // Append mode: a window only EMITS once the watermark passes its
    // end — finalized rows, never revised (the dashboard contract)
    val q = StreamingCorpus.qualityMonitor(in.toDS(), watermarkMinutes = 15)
      .writeStream.format("memory").queryName("qm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        DocEv(1L, good, ts("2024-01-01 10:01:00")),
        DocEv(2L, bad, ts("2024-01-01 10:04:00")),
        DocEv(3L, good, ts("2024-01-01 10:12:00")))
      q.processAllAvailable()
      // advance event time far past 10:00–10:10 + watermark → that
      // window finalizes; then a doc arrives INSIDE it, too late
      in.addData(DocEv(4L, good, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData(DocEv(5L, good, ts("2024-01-01 10:05:00"))) // late: dropped
      in.addData(DocEv(6L, good, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val got = spark.table("qm")
        .select($"window_start", $"n_docs", $"n_ws_tokens",
          $"n_subword_tokens", $"mean_quality")
        .as[(Timestamp, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      // the finalized 10:00 window holds docs 1+2 ONLY (doc 5 was late)
      import graft.functions.TextJvm
      val (ws1, sub1) = TextJvm.wsAndSubwordCounts(good)
      val (ws2, sub2) = TextJvm.wsAndSubwordCounts(bad)
      val meanQ = BigDecimal(
        (TextJvm.qualityRaw(good) + TextJvm.qualityRaw(bad)) / 2.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(ts("2024-01-01 10:00:00")) ==
        ((2L, ws1 + ws2, sub1 + sub2, meanQ)))
      // the 10:10 window (doc 3) also finalized once 11:30 arrived
      assert(got(ts("2024-01-01 10:10:00"))._1 == 1L)
    } finally q.stop()
  }

  test("cmsMonitor: sharded streaming grid sums to the batch q116 grid " +
    "EXACTLY under shuffled arrival and micro-batch splits") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val toks = graft.queries.SamplingQueries.docTokens(spark, sf)
    val batchGrid = graft.queries.SamplingQueries.cmsGrid(toks)
    val words = toks.as[String].collect()
    // adversarial arrival: deterministic shuffle, three uneven batches
    val shuffled = new scala.util.Random(11).shuffle(words.toVector)
    val parts = Seq(shuffled.take(500), shuffled.slice(500, 501),
      shuffled.drop(501))
    val in = MemoryStream[String]
    val q = StreamingSketch.cmsMonitor(in.toDS(), shards = 5)
      .writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val emissions = spark.table("cms")
        .as[StreamingSketch.CmsShardRow].collect().toSeq
      // each shard's LAST emission is its cumulative grid; summing
      // across shards reconstructs the full corpus grid exactly —
      // addition over disjoint token shards commutes (order-free state)
      assert(StreamingSketch.mergeShardGrids(emissions) == batchGrid)
      assert(emissions.map(_.shard).distinct.size > 1) // sharding exercised
    } finally q.stop()
  }

  test("cmsMonitor grids survive a checkpointed restart: counts folded " +
    "before the stop persist, and the merged grid still equals batch") {
    import graft.streaming.StreamingSketch
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val toks = graft.queries.SamplingQueries.docTokens(spark, sf)
    val batchGrid = graft.queries.SamplingQueries.cmsGrid(toks)
    val words = toks.as[String].collect()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmsck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cmsout").toString
    val in = MemoryStream[String]
    def start() = StreamingSketch.cmsMonitor(in.toDS(), shards = 3)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val (h1, h2) = words.splitAt(words.length / 2)
    val q1 = start()
    try { in.addData(h1: _*); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: the recovered per-shard grids must
    // carry every first-half increment
    val q2 = start()
    try { in.addData(h2: _*); q2.processAllAvailable() } finally q2.stop()
    val emissions = spark.read.parquet(outDir)
      .as[StreamingSketch.CmsShardRow].collect().toSeq
    // take each shard's LARGEST emission (grids only ever grow;
    // parquet read order is not arrival order)
    val latest = emissions.groupBy(_.shard).values.map(
      _.maxBy(_.grid.sum)).toSeq
    assert(StreamingSketch.mergeShardGrids(latest) == batchGrid)
  }

  test("abMonitor: the live experiment readout equals batch q126 EXACTLY " +
    "under shuffled arrival and micro-batch splits") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q126(spark, sf)
      .select($"event_type", $"n_a", $"n_b", $"mean_a_cents",
        $"mean_b_cents", $"t2_1e6", $"significant")
      .as[(String, Long, Long, Long, Long, Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"user_id".isNotNull && $"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
    val shuffled = new scala.util.Random(23).shuffle(evs.toVector)
    val parts = Seq(shuffled.take(333), shuffled.slice(333, 334),
      shuffled.drop(334))
    val in = MemoryStream[Ev]
    val q = EventStreams.abMonitor(in.toDS())
      .writeStream.format("memory").queryName("abm")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      // the LAST emission per type is the full-prefix readout — equal
      // to batch because the state is order-free integer totals and
      // the algebra is an exact BigInt replay of the decimal plan
      val streamed = spark.table("abm")
        .as[(String, Long, Long, Long, Long, Option[Long], Boolean)]
        .collect()
      val last = streamed.foldLeft(
        Map.empty[String, (String, Long, Long, Long, Long, Option[Long], Boolean)]) {
        (m, r) => m + (r._1 -> r)
      }
      // batch q126 filters only null user/value; the stream subset also
      // drops null ts — on this dataset that drops no coverage
      // (asserted by the equality itself)
      assert(last == batch && last.size == batch.size && last.nonEmpty)
    } finally q.stop()
  }

  test("transitionEvents: streamed transitions aggregate to the batch q137 " +
    "matrix EXACTLY across micro-batch splits; cross-batch late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q137(spark, sf)
      .select($"from_type", $"to_type", $"n_trans")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"user_id".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    // event-time-ordered delivery over three uneven batches (the
    // contract under which the stream equals the batch extraction)
    val parts = Seq(evs.take(400), evs.slice(400, 401), evs.drop(401))
    val in = MemoryStream[Ev]
    val q = EventStreams.transitionEvents(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("trans")
        .as[(Long, String, String, Timestamp)].collect()
      val counts = streamed.groupBy(r => (r._2, r._3))
        .map { case (k, rs) => k -> rs.length.toLong }
      assert(counts == batch && counts.nonEmpty)
      // replay a multi-event user's FIRST event as a late arrival: its
      // micros sit strictly below that user's marker, so the stream
      // emits NOTHING for it (append never revises — the scaladoc's
      // batch-is-source-of-truth caveat, asserted)
      val n0 = spark.table("trans").count()
      val multi = evs.groupBy(_.user_id).values
        .find(g => g.map(e => (e.ts.getTime, e.ts.getNanos)).distinct.size >= 2)
        .get.minBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      in.addData(multi.copy(event_id = 99999999L))
      q.processAllAvailable()
      assert(spark.table("trans").count() == n0)
    } finally q.stop()
  }

  test("forwardFill: online imputation equals batch q144 row-for-row " +
    "across micro-batch splits (NaN carries the stream's null)") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // the lake ships no null values — inject gaps (every 7th event)
    // so the fill path actually fires, and run the SAME null-injected
    // frame through the batch expression and the stream
    val gapped = graft.Tables.load(spark, sf, "events")
      .filter($"user_id".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.when($"event_id" % 7 === 0, null)
          .otherwise($"value").as("value"))
    val batch = graft.queries.TimeseriesQueries.fillOf(gapped)
      .as[(Long, Long, Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // Ev.value is a primitive double — null rides as NaN on the wire
    val evs = gapped
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(Double.NaN)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    assert(evs.exists(_.value.isNaN))
    val parts = Seq(evs.take(300), evs.slice(300, 301), evs.drop(301))
    val in = MemoryStream[Ev]
    val q = EventStreams.forwardFill(in.toDS())
      .writeStream.format("memory").queryName("ffill")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("ffill")
        .as[(Long, Long, Option[Double], Option[Double], Boolean)]
        .collect().map(r => r._1 -> r).toMap
      assert(streamed == batch && streamed.nonEmpty)
      assert(streamed.values.exists(_._5), "no row was actually filled")
    } finally q.stop()
  }

  test("langMixMonitor: the live contingency table assembles to batch " +
    "q136's chi-squared EXACTLY under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batchRow = graft.queries.CorpusQueries.q136(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source", $"lang")
      .as[(Long, String, String)].collect()
    val shuffled = new scala.util.Random(31).shuffle(docs.toVector)
    val parts = Seq(shuffled.take(170), shuffled.slice(170, 171),
      shuffled.drop(171))
    val in = MemoryStream[(Long, String, String)]
    val q = EventStreams.langMixMonitor(in.toDS())
      .writeStream.format("memory").queryName("mix")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      // latest cell per (source, lang) = its max (counts only grow)
      val cells = spark.table("mix")
        .as[(String, String, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> rs.map(_._3).max }
      // assemble chi-squared over the FULL grid with the q136 integer
      // algebra (BigInt floor division per cell, order-free sum)
      val sources = cells.keys.map(_._1).toSeq.distinct
      val langs = cells.keys.map(_._2).toSeq.distinct
      val rTot = sources.map(s => s ->
        BigInt(cells.collect { case ((`s`, _), n) => n }.sum)).toMap
      val cTot = langs.map(l => l ->
        BigInt(cells.collect { case ((_, `l`), n) => n }.sum)).toMap
      val n = rTot.values.sum
      val chi2 = (for { s <- sources; l <- langs } yield {
        val o = BigInt(cells.getOrElse((s, l), 0L))
        val d = o * n - rTot(s) * cTot(l)
        (d * d * 1000000) / (n * rTot(s) * cTot(l))
      }).sum
      assert((n.toLong, sources.size.toLong, langs.size.toLong,
        (sources.size - 1L) * (langs.size - 1L), chi2.toLong) == batchRow)
    } finally q.stop()
  }

  test("srmMonitor: the final live card equals batch q189 per " +
    "experiment population, in any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q189(spark, sf)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // same eligibility filter as q189; deliver in REVERSE order —
    // set union commutes, so this twin owes no ordering contract
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull &&
        $"user_id".isNotNull && $"value".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
      .sortBy(e => (-e.ts.getTime, e.event_id))
    val parts = Seq(evs.take(321), evs.drop(321))
    val in = MemoryStream[Ev]
    val q = EventStreams.srmMonitor(in.toDS())
      .writeStream.format("memory").queryName("srm")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      // populations only grow: the card with the largest population
      // per type IS the latest one (robust to sink row order)
      val streamed = spark.table("srm")
        .as[(String, Long, Long, Long, Boolean)].collect()
        .groupBy(_._1).map { case (t, rs) =>
          val last = rs.maxBy(r => r._2 + r._3)
          t -> ((last._2, last._3, last._4, last._5))
        }
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("quantileMonitor: the final live median/p90 card equals batch " +
    "q185 per type, in any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.SamplingQueries.q185(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
      .sortBy(e => (-e.ts.getTime, e.event_id)) // histogram merge commutes
    val parts = Seq(evs.take(123), evs.drop(123))
    val in = MemoryStream[Ev]
    val q = EventStreams.quantileMonitor(in.toDS())
      .writeStream.format("memory").queryName("quant")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("quant")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (t, rs) =>
          val last = rs.maxBy(_._2) // n only grows
          t -> ((last._2, last._3, last._4))
        }
      assert(streamed == batch && streamed.nonEmpty)
      // the API form of the same fold: latestPerKey over the
      // accumulated append-mode sink recovers the batch card exactly
      val viaApi = EventStreams
        .latestPerKey(spark.table("quant"), Seq("event_type"), $"n")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(viaApi == batch)
    } finally q.stop()
  }

  test("twapMonitor: the 128-bit integral branch is exact — a single " +
    "year-scale high-value interval overflows a long and the emitted " +
    "TWAP still equals the BigInt ground truth") {
    implicit val sqlCtx = spark.sqlContext
    // cents = 1e7, dur ≈ 2 years in µs ≈ 6.3e13 → cents·dur ≈ 6.3e20,
    // 68× past Long.MaxValue: the plain-long fold this replaced would
    // have wrapped silently. Three closed intervals stress the carry.
    val t0 = 1700000000000L // epoch millis
    val yearsUs = 2L * 365 * 24 * 3600 * 1000000L
    val evs = Seq(
      (1L, 100000.0, 0L),                 // cents 1e7, held 2y
      (2L, 200000.0, yearsUs),            // cents 2e7, held 2y
      (3L, 50000.0, 2 * yearsUs),         // cents 5e6, held 1y
      (4L, 0.0, 2 * yearsUs + yearsUs / 2)// closes the third interval
    ).map { case (id, v, offUs) =>
      Ev(id, 7L, "t", new Timestamp(t0 + offUs / 1000L), v)
    }
    val expected = {
      val cents = Seq(10000000L, 20000000L, 5000000L)
      val durs = Seq(yearsUs, yearsUs, yearsUs / 2)
      val num = cents.zip(durs).map { case (c, d) => BigInt(c) * d }.sum
      val den = durs.sum
      assert(num > BigInt(Long.MaxValue), "test must exercise overflow")
      (3L, den, (num / den).toLong)
    }
    val in = MemoryStream[Ev]
    val q = EventStreams.twapMonitor(in.toDS())
      .writeStream.format("memory").queryName("twap128")
      .outputMode(OutputMode.Append()).start()
    try {
      // split mid-stream so the 128-bit accumulator round-trips state
      in.addData(evs.take(2): _*); q.processAllAvailable()
      in.addData(evs.drop(2): _*); q.processAllAvailable()
      val last = spark.table("twap128")
        .as[(Long, Long, Long, Long)].collect().maxBy(_._2)
      assert((last._2, last._3, last._4) == expected)
    } finally q.stop()
  }

  test("twapMonitor state survives a checkpointed restart: the held " +
    "marker AND the 128-bit integral recover (current TwapState " +
    "encoding; pre-r10 checkpoints need a fresh dir — see scaladoc)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_tout").toString
    def t(sec: Int) = ts(f"2024-01-01 10:00:$sec%02d")
    val in = MemoryStream[Ev]
    def start() = EventStreams.twapMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // batch 1: one closed interval (100 cents held 10 s) + a held
    // marker at t(10) — then the query STOPS
    val q1 = start()
    try {
      in.addData(Ev(1L, 7L, "t", t(0), 1.0), Ev(2L, 7L, "t", t(10), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: closing the held observation must fold 200 cents × 20 s
    // onto the RECOVERED integral — card n=2 proves numHi/numLo/den and
    // the (tus, event_id) marker all decoded from the checkpoint
    val q2 = start()
    try {
      in.addData(Ev(3L, 7L, "t", t(30), 0.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == Seq(1L, 2L))
    // twap = (100·10e6 + 200·20e6) div 30e6 = 166 (floor division)
    assert(rows.last == ((7L, 2L, 30000000L, 166L)))
  }

  test("twapMonitor: the final per-user card equals batch q187 " +
    "row-for-row (closed intervals only; the held observation never " +
    "counts); late arrivals drop") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q187(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"ts".isNotNull && $"user_id".isNotNull && $"value".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val parts = Seq(evs.take(400), evs.slice(400, 401), evs.drop(401))
    val in = MemoryStream[Ev]
    val q = EventStreams.twapMonitor(in.toDS())
      .writeStream.format("memory").queryName("twap")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("twap")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          val last = rs.maxBy(_._2) // n_intervals only grows
          u -> ((last._2, last._3, last._4))
        }
      assert(streamed == batch && streamed.nonEmpty)
      // a replayed early event would split an already-integrated
      // interval: dropped, nothing re-emitted with changed integrals
      val n0 = spark.table("twap")
        .as[(Long, Long, Long, Long)].collect().toSet
      in.addData(evs.head.copy(event_id = 99999999L))
      q.processAllAvailable()
      val n1 = spark.table("twap")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(n1 == n0)
    } finally q.stop()
  }

  test("burstMonitor: streamed alarms equal batch q181 exactly once a " +
    "sentinel closes every real hour; late arrivals drop") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val base = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    // one far-future sentinel per type: closes every real hour in the
    // stream; in batch its trailing-24 window is empty (>24h gap), so
    // it can never alarm — streamed and batch sets coincide exactly
    val maxMs = base.map(_.ts.getTime).max
    val sentinels = base.map(_.event_type).distinct.zipWithIndex.map {
      case (t, i) =>
        Ev(900000L + i, 0L, t, new Timestamp(maxMs + 48L * 3600000L), 0.0)
    }
    val evs = base ++ sentinels
    val batch = graft.queries.TimeseriesQueries.burstsOf(
      spark.createDataset(evs.toSeq).toDF())
      .as[(String, Timestamp, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.getTime) -> ((r._3, r._4, r._5))).toMap
    val parts = Seq(evs.take(500), evs.drop(500))
    val in = MemoryStream[Ev]
    val q = EventStreams.burstMonitor(in.toDS())
      .writeStream.format("memory").queryName("burst")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("burst")
        .as[(String, Timestamp, Long, Long, Long)].collect()
        .map(r => (r._1, r._2.getTime) -> ((r._3, r._4, r._5))).toMap
      assert(streamed == batch && streamed.nonEmpty)
      // replaying the earliest event (closed hour) must emit nothing
      val n0 = spark.table("burst").count()
      in.addData(base.head.copy(event_id = 99999999L))
      q.processAllAvailable()
      assert(spark.table("burst").count() == n0)
    } finally q.stop()
  }

  test("concurrencyMonitor: the live high-water mark lands exactly on " +
    "batch q158 across micro-batch splits; late arrivals drop") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q158(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val parts = Seq(evs.take(350), evs.slice(350, 351), evs.drop(351))
    val in = MemoryStream[Ev]
    val q = EventStreams.concurrencyMonitor(in.toDS())
      .writeStream.format("memory").queryName("conc")
      .outputMode(OutputMode.Append()).start()
    try {
      parts.foreach { p =>
        if (p.nonEmpty) { in.addData(p: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("conc")
        .as[(String, Timestamp, Long, Long)].collect()
      val got = streamed.groupBy(_._1).map { case (t, rs) =>
        t -> ((rs.length.toLong, rs.map(_._4).max)) }
      assert(got == batch && got.nonEmpty)
      // the live column never exceeds the mark, and hits it
      streamed.groupBy(_._1).foreach { case (t, rs) =>
        assert(rs.forall(r => r._3 >= 1 && r._3 <= batch(t)._2))
        assert(rs.map(_._3).max == batch(t)._2)
      }
      // a replayed first event sits below its type's marker: dropped
      val n0 = spark.table("conc").count()
      in.addData(evs.head.copy(event_id = 99999999L))
      q.processAllAvailable()
      assert(spark.table("conc").count() == n0)
    } finally q.stop()
  }

  test("burstMonitor state survives a checkpointed restart: the open " +
    "hour, its count, and the trailing-24 baseline map recover so " +
    "post-restart alarms equal batch q181 exactly") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val base = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val maxMs = base.map(_.ts.getTime).max
    val sentinels = base.map(_.event_type).distinct.zipWithIndex.map {
      case (t, i) =>
        Ev(900000L + i, 0L, t, new Timestamp(maxMs + 48L * 3600000L), 0.0)
    }
    val evs = base ++ sentinels
    val batch = graft.queries.TimeseriesQueries.burstsOf(
      spark.createDataset(evs.toSeq).toDF())
      .as[(String, Timestamp, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.getTime) -> ((r._3, r._4, r._5))).toMap
    // split MID-hour (event-time order), so the recovered state carries
    // an open hour's partial count plus a populated baseline map — a
    // zeroed recovery would mis-count that hour and shift its alarm
    val (h1, h2) = evs.splitAt(evs.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_burstck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_burstout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.burstMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(h1.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { in.addData(h2.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .as[(String, Timestamp, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.getTime) -> ((r._3, r._4, r._5))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("concurrencyMonitor state survives a checkpointed restart: the " +
    "running sweep count and high-water mark recover so the final mark " +
    "per type equals batch q158") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q158(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts",
        org.apache.spark.sql.functions.coalesce($"value",
          org.apache.spark.sql.functions.lit(0.0)).as("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (h1, h2) = evs.splitAt(evs.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_concck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_concout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.concurrencyMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(h1.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // a lost sweep count would restart the live column at zero and the
    // recovered mark could never reach the batch high-water value
    val q2 = start()
    try { in.addData(h2.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .as[(String, Timestamp, Long, Long)].collect()
    val got = streamed.groupBy(_._1).map { case (t, rs) =>
      t -> ((rs.length.toLong, rs.map(_._4).max)) }
    assert(got == batch && got.nonEmpty)
  }

  test("sessionize state AND its event-time timeout survive a " +
    "checkpointed restart: an open session extends across the restart " +
    "and a session left open closes from the RECOVERED timeout alone") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sessck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sessout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // run 1: user 10 has an OPEN 2-event session; user 20 an OPEN
    // 1-event session — both unclosed at shutdown
    val q1 = start()
    try {
      in.addData(
        Ev(1, 10, "click", ts("2024-01-01 10:00:00"), 1.0),
        Ev(2, 10, "click", ts("2024-01-01 10:10:00"), 2.0),
        Ev(3, 20, "click", ts("2024-01-01 10:05:00"), 8.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2 from the same checkpoint: user 10's next event is INSIDE
    // the gap — it must EXTEND the recovered session (a lost state
    // would start a fresh one at 10:20 with n=1); user 20 receives
    // nothing — their close must fire purely from the recovered state
    // + recovered timeout when the watermark advances past 10:05+30min
    val q2 = start()
    try {
      in.addData(Ev(4, 10, "click", ts("2024-01-01 10:20:00"), 4.0))
      q2.processAllAvailable()
      in.addData(Ev(9, 99, "click", ts("2024-01-01 23:00:00"), 0.0))
      q2.processAllAvailable()
      in.addData(Ev(10, 99, "click", ts("2024-01-02 23:00:00"), 0.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val sessions = spark.read.parquet(outDir)
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(sessions.contains(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 3L, 7.0)),
      s"user 10's session did not extend across the restart: $sessions")
    assert(sessions.contains(
      (20L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L, 8.0)),
      s"user 20's recovered timeout did not close the session: $sessions")
  }

  test("srmMonitor state survives a checkpointed restart: the exact " +
    "distinct-user sets recover so the final card equals batch q189") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.TimeseriesQueries.q189(spark, sf)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val evs = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull &&
        $"user_id".isNotNull && $"value".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
    val (h1, h2) = evs.splitAt(evs.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_srmck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_srmout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.srmMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(h1.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // a lost arm-set would double-count returning users after the
    // restart (distinctness is the whole guardrail) or halve n_a/n_b
    val q2 = start()
    try { in.addData(h2.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        val last = rs.maxBy(r => r._2 + r._3)
        t -> ((last._2, last._3, last._4, last._5))
      }
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("latestPerKey: hostile card column names (a literal __seq, a " +
    "dotted name) resolve correctly (r10 ADVICE)") {
    // the internal seq field auto-renames past collisions and fields
    // are recovered via getField, so neither name can shadow/misresolve
    val cards = Seq(
      ("a", 1L, 10L, "v1"), ("a", 3L, 30L, "v3"), ("a", 2L, 20L, "v2"),
      ("b", 5L, 50L, "w5")
    ).toDF("k", "n", "__seq", "payload.dotted")
    val out = EventStreams.latestPerKey(cards, Seq("k"), col("n"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(out == Seq(("a", 3L, 30L, "v3"), ("b", 5L, 50L, "w5")))
  }

  test("state versioning: every stateful monitor site goes through the " +
    "versioned wrapper (no bare flatMapGroupsWithState in src/main)") {
    import scala.jdk.CollectionConverters._
    val bare = java.nio.file.Files.walk(
        java.nio.file.Paths.get("src/main/scala/graft"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("StateVersion.scala")) // the seam itself
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if line.contains(".flatMapGroupsWithState[") =>
            s"$p:${i + 1}"
        }
      }.toList
    assert(bare.isEmpty,
      s"bare flatMapGroupsWithState call sites (use " +
        s"flatMapGroupsWithVersionedState): ${bare.mkString(", ")}")
  }

  test("state versioning: a mismatched stamp fails the read with the " +
    "named MismatchException (unit, via TestGroupState)") {
    import graft.streaming.StateVersion
    val old = StateVersion.VState(StateVersion.Current + 7, 42L)
    val gs = org.apache.spark.sql.streaming.TestGroupState.create[
      StateVersion.VState[Long]](
      org.apache.spark.api.java.Optional.of(old),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long](), false)
    val f = (k: Long, it: Iterator[Long],
             state: org.apache.spark.sql.streaming.GroupState[Long]) =>
      Iterator.single(state.get)
    val e = intercept[StateVersion.MismatchException] {
      StateVersion.guard(f)(1L, Iterator.empty, gs).toList
    }
    assert(e.found == StateVersion.Current + 7 &&
      e.expected == StateVersion.Current)
    // a CURRENT stamp passes through the same path
    val ok = org.apache.spark.sql.streaming.TestGroupState.create[
      StateVersion.VState[Long]](
      org.apache.spark.api.java.Optional.of(
        StateVersion.VState(StateVersion.Current, 42L)),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      1000L, org.apache.spark.api.java.Optional.empty[Long](), false)
    assert(StateVersion.guard(f)(1L, Iterator.empty, ok).toList == List(42L))
  }

  test("state versioning: resuming a checkpoint across a version bump " +
    "fails loudly with the named error instead of misdecoding (r11 " +
    "verdict item 5)") {
    import graft.streaming.StateVersion
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_vout").toString
    def t(sec: Int) = ts(f"2024-01-01 10:00:$sec%02d")
    val in = MemoryStream[Ev]
    def start() = EventStreams.twapMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // phase 1: leave a held observation in state under the CURRENT epoch
    val q1 = start()
    try {
      in.addData(Ev(1L, 7L, "t", t(0), 1.0), Ev(2L, 7L, "t", t(10), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // phase 2: the binary's semantics epoch moves on; resuming the same
    // checkpoint must fail the first state read with the NAMED error —
    // the silent alternative is folding a misdecoded integral
    StateVersion.overrideCurrent = Some(StateVersion.Current + 1)
    try {
      val q2 = start()
      val e = intercept[Throwable] {
        try {
          in.addData(Ev(3L, 7L, "t", t(30), 0.0))
          q2.processAllAvailable()
        } finally q2.stop()
      }
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .take(20).toList
      assert(chain.exists { t =>
        t.isInstanceOf[StateVersion.MismatchException] ||
          Option(t.getMessage).exists(_.contains("state version mismatch"))
      }, s"expected a MismatchException in the cause chain, got: " +
        chain.map(_.getClass.getSimpleName).mkString(" <- "))
    } finally StateVersion.overrideCurrent = None
    // phase 3: back on the matching epoch the same checkpoint resumes
    // cleanly — the guard only rejects mismatches, it is not a tripwire
    val q3 = start()
    try {
      in.addData(Ev(4L, 7L, "t", t(40), 0.0))
      q3.processAllAvailable()
    } finally q3.stop()
    val users = spark.read.parquet(outDir).select("user_id")
      .as[Long].collect().toSet
    assert(users == Set(7L))
  }

  test("kmvUsersMonitor state survives a checkpointed restart: the k-min " +
    "set recovered from the checkpoint finishes at exactly the batch q115 " +
    "sketch") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.queries.SamplingQueries
      .q115(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"kmv_users").as[(String, Long)]
      .collect().toMap
    val evs = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"user_id".isNotNull && $"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .as[Ev].collect()
    val shuffled = new scala.util.Random(11).shuffle(evs.toVector)
    val (h1, h2) = shuffled.splitAt(shuffled.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kmvck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_kmvout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.kmvUsersMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(h1: _*); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: the recovered ≤k-min lists must carry
    // every first-half user hash, or the final estimate lands short
    val q2 = start()
    try { in.addData(h2: _*); q2.processAllAvailable() } finally q2.stop()
    val emissions = spark.read.parquet(outDir)
      .as[(String, Long)].collect().toSeq
    // the sketch estimate is nondecreasing as the set grows (more users
    // can only lower the k-th min), so each type's MAX emission is its
    // full-set value — parquet read order is not arrival order
    val fin = emissions.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(fin == batch && fin.nonEmpty)
  }

  test("anomalyMonitor state survives a checkpointed restart: the running " +
    "(n, Σv, Σv²) recovered from the checkpoint scores the second half " +
    "exactly as batch q102 does") {
    import graft.streaming.{EventStreams, Ev}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_anomck_in").toString
    val subset = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter($"ts".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull && $"user_id" < 8)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    subset.coalesce(1).write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.TimeseriesQueries.q102(spark, dir)
      .select($"event_id", $"mean_centi", $"z_centi", $"is_anomaly")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      .toSet
    // split in global event-time order so per user the restart carries
    // genuinely mid-series statistics, not a fresh state
    val evs = subset.as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anomck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_anomout").toString
    val in = MemoryStream[Ev]
    def start() = EventStreams.anomalyMonitor(in.toDS())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try { in.addData(first.toIndexedSeq: _*); q1.processAllAvailable() }
    finally q1.stop()
    // restart: a lost or zeroed (n, Σv, Σv²) would shift every
    // second-half mean and z-score off the batch values
    val q2 = start()
    try { in.addData(second.toIndexedSeq: _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .select($"event_id", $"mean_centi", $"z_centi", $"is_anomaly")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._3.isDefined))
  }
}
