package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StateVersion.Ops

/** Event row for the typed streaming surface (mirrors the lake's
  * `events` table minus `props`).
  */
case class Ev(event_id: Long, user_id: Long, event_type: String,
              ts: Timestamp, value: Double)

/** Open-session accumulator kept in stream state (epoch millis). */
case class SessionAcc(start: Long, last: Long, n: Long, total: Double)

/** Emitted closed session. */
case class UserSession(user_id: Long, session_start: Timestamp,
                       session_end: Timestamp, n_events: Long, total_value: Double)

/** Structured Streaming surface over the event stream.
  *
  * The reference is pure batch (Airflow cron), but its semantics are
  * streaming-shaped (SURVEY.md §2.9): the 6-hour "ride surely over"
  * completion cutoff (T2, `siri/add_ride_durations.py:74`) is exactly an
  * event-time watermark, and the hourly reprocessing window (T1) is a
  * windowed aggregation. These jobs express that natively:
  * `readStream → withWatermark → window/agg → writeStream`, so the same
  * library serves both the batch lake and a live feed.
  *
  * Scale notes: both operators keep bounded state — the windowed agg
  * drops state for windows older than the watermark; sessionization
  * stores ONE small accumulator per open (user, session) and removes it
  * on event-time timeout. No unbounded buffering, no driver state.
  */
object EventStreams {

  /** File-source entry over an events parquet directory: the
    * `readStream → transform → writeStream` front door. New files landing
    * under `path` become micro-batches; with `Trigger.AvailableNow` the
    * same code runs as an incremental batch catch-up (the reference's
    * hourly-cron semantics, minus the cron).
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
      .parquet(path)

  /** Per-hour per-type stats with a 6-hour watermark (T2's cutoff as a
    * real watermark): late rows beyond 6h are dropped, finalized windows
    * are emitted exactly once in append mode.
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "6 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-ish ingest dedup: drop replayed `event_id`s while
    * keeping only `horizon` of id-state (watermark-bounded — without the
    * bound, dedup state grows with the stream forever). The streaming
    * twin of q28's exact hash dedup.
    */
  def dedupWithinWatermark(events: DataFrame, horizon: String): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–stream interval join: pair each left event with the right
    * events of the same user whose timestamp falls within
    * [left.ts, left.ts + withinMinutes] — the streaming form of the
    * batch band join (J7/q12): correlate a click stream with the
    * conversions that follow it, a vehicle ping with the stop events
    * around it.
    *
    * Both sides carry a watermark and the join condition bounds the
    * event-time distance, so Spark derives exactly how long each side's
    * rows must be buffered and drops join state behind the watermark —
    * the textbook bounded-state stream-stream join. Without the time
    * bound the state would grow with the stream forever (and Spark
    * would reject the append-mode query).
    */
  def intervalJoin(left: Dataset[Ev], right: Dataset[Ev],
                   withinMinutes: Int): DataFrame = {
    val l = left.withWatermark("ts", s"$withinMinutes minutes")
      .select(col("event_id").as("l_event_id"), col("user_id").as("l_user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", s"$withinMinutes minutes")
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user_id"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("l_user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("l_user_id").as("user_id"), col("l_event_id"),
        col("r_event_id"), col("l_ts"), col("r_ts"),
        round(col("r_value") - col("l_value"), 2).as("value_delta"))
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when `gapMinutes` pass with no event (event-time timeout —
    * the watermark drives emission, not wall clock). Batch q42 computes
    * the same sessions with window functions; this is the incremental
    * form with O(open sessions) state.
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(userId: Long, a: SessionAcc): UserSession =
      UserSession(userId, new Timestamp(a.start), new Timestamp(a.last), a.n, a.total)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[SessionAcc, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val closed = close(userId, state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // Within one micro-batch events arrive unordered; sort before
            // folding (bounded by the batch, not the stream).
            val evs = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Vector.newBuilder[UserSession]
            var acc = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              acc = acc match {
                case Some(a) if t - a.last <= gapMs =>
                  Some(SessionAcc(a.start, math.max(a.last, t), a.n + 1, a.total + e.value))
                case Some(a) =>
                  out += close(userId, a)
                  Some(SessionAcc(t, t, 1, e.value))
                case None =>
                  Some(SessionAcc(t, t, 1, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.last + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Sliding-window state for [[rollingFeatures]]: the user's events
    * inside the LONGEST horizon, as (event-time micros, integer cents)
    * pairs kept SORTED ASCENDING by micros. Bounded by construction —
    * eviction drops everything older than `maxSeen − maxHorizon` after
    * every micro-batch, so state size is the user's 24h event count,
    * not their history.
    */
  case class RollState(recent: List[(Long, Long)])

  /** Emitted per-event feature row — the q105 row shape. */
  case class RollFeatures(event_id: Long, user_id: Long, ts: Timestamp,
                          n_1h: Long, sum_centi_1h: Long,
                          n_24h: Long, sum_centi_24h: Long)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q105]]: per-event trailing
    * 1h/24h activity features computed AT ARRIVAL from per-user
    * sliding-window state — the online feature-store path of the same
    * feature definition the batch query backfills (train/serve
    * consistency is exactly this pairing: one contract, two runtimes;
    * StreamingSpec pins row equality including across a micro-batch
    * split).
    *
    * Arithmetic replicates the batch plan term-for-term: integer
    * cents, inclusive `[t−H, t]` horizons — BOTH ends enforced, so a
    * late event (micros below the user's max already in state) still
    * scores over its own frame and never counts future-timestamped
    * entries — and count/sum over the retained pairs, all order-free.
    * RANGE-frame tie semantics (peers at the same `tus` all in-frame)
    * fall out of the inclusive upper bound over the merged batch.
    *
    * Consistency caveat: any cross-batch out-of-order arrival — a tie
    * group split across micro-batches, or a late event whose in-frame
    * peers were already evicted — is inherently unknowable to an
    * online scorer; rows already emitted are never revised. The batch
    * backfill is the source of truth wherever arrival order diverges
    * from event order.
    *
    * Cost: the per-batch work is one merge of the sorted state with
    * the sorted batch plus one prefix-sum pass — O(W + B) total, i.e.
    * amortized O(1) per event (and O(W) state decode per batch is the
    * GroupState codec floor anyway), the streaming analogue of the
    * batch plan's two-pointer RANGE frames. NoTimeout like
    * [[anomalyMonitor]] — but unlike its ever-growing (n, Σ, Σ²)
    * state, eviction here keeps state PROPORTIONAL TO THE WINDOW, the
    * property that lets a 1000-executor deployment hold every user's
    * state in memory indefinitely.
    */
  def rollingFeatures(events: Dataset[Ev]): Dataset[RollFeatures] = {
    import events.sparkSession.implicits._
    val h1 = graft.queries.TimeseriesQueries.FeatureHorizon1
    val h2 = graft.queries.TimeseriesQueries.FeatureHorizon2
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[RollState, RollFeatures](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[RollState]) =>
          val evs = it.toVector
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val prior: Array[(Long, Long)] =
            state.getOption.map(_.recent.toArray).getOrElse(Array.empty)
          // merge sorted state with the sorted batch: every batch row is
          // in `merged` BEFORE any feature is read, so in-batch ties and
          // in-batch late arrivals see their full frame
          val batch = new Array[(Long, Long)](evs.length)
          var b = 0
          while (b < evs.length) {
            val e = evs(b)
            val vc = BigDecimal.valueOf(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            batch(b) = (tusOf(e), vc)
            b += 1
          }
          val pn = prior.length + batch.length
          val merged = new Array[(Long, Long)](pn)
          var pi = 0; var bi = 0; var mi = 0
          while (mi < pn) {
            val takePrior = bi >= batch.length ||
              (pi < prior.length && prior(pi)._1 <= batch(bi)._1)
            if (takePrior) { merged(mi) = prior(pi); pi += 1 }
            else { merged(mi) = batch(bi); bi += 1 }
            mi += 1
          }
          val psum = new Array[Long](pn + 1)
          var k = 0
          while (k < pn) { psum(k + 1) = psum(k) + merged(k)._2; k += 1 }
          // batch rows are scored in ascending micros order, so the
          // frame-boundary pointers only ever move forward: `hi` is the
          // first index with micros > tus (inclusive upper bound —
          // ties in-frame, future out), lo1/lo2 the first index inside
          // each horizon's inclusive lower bound
          var hi = 0; var lo1 = 0; var lo2 = 0
          val out = Vector.newBuilder[RollFeatures]
          evs.foreach { e =>
            val tus = tusOf(e)
            while (hi < pn && merged(hi)._1 <= tus) hi += 1
            while (lo2 < hi && merged(lo2)._1 < tus - h2) lo2 += 1
            while (lo1 < hi && merged(lo1)._1 < tus - h1) lo1 += 1
            out += RollFeatures(e.event_id, userId, e.ts,
              (hi - lo1).toLong, psum(hi) - psum(lo1),
              (hi - lo2).toLong, psum(hi) - psum(lo2))
          }
          // evict relative to the max micros EVER seen (state is sorted,
          // so its tail is that max even when this batch is all-late)
          if (pn > 0) {
            val cutoff = merged(pn - 1)._1 - h2
            state.update(RollState(merged.dropWhile(_._1 < cutoff).toList))
          }
          out.result().iterator
      }
  }

  /** Per-user running-stats accumulator: exact integer cents (the q102
    * numeric discipline — order-free sums, no float drift in state).
    */
  case class AnomState(n: Long, s1c: Long, s2c: Long)

  /** Emitted per-event anomaly score — the q102 row shape. */
  case class AnomScore(event_id: Long, user_id: Long, ts: Timestamp,
                       mean_centi: Long, z_centi: Option[Long],
                       is_anomaly: Boolean)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q102]]: score each event
    * against its user's running mean/variance AT ARRIVAL, carrying
    * (n, Σcents, Σcents²) per user through `flatMapGroupsWithState` —
    * three longs of state per user, ever. Arithmetic is replicated
    * term-for-term from the batch query (integer cents in,
    * `Math.floorDiv` for the floor-centi mean, `floor(z·100)` for the
    * centi-z — the exact expressions the batch plan runs; no decimal
    * rounding anywhere, the round-7 q102 discipline), so stream and
    * batch scores are IDENTICAL row-for-row (StreamingSpec pins it,
    * including across a micro-batch split — the state carries, the
    * scores don't change).
    * NoTimeout: running statistics never expire by design; a deployment
    * that wants sliding baselines swaps the state for a decayed pair.
    */
  def anomalyMonitor(events: Dataset[Ev]): Dataset[AnomScore] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[AnomState, AnomScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[AnomState]) =>
          // within one micro-batch events arrive unordered; fold in
          // full event-time order (micros via getNanos — getTime alone
          // truncates to millis and could flip batch/stream tie order)
          val evs = it.toVector
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var st = state.getOption.getOrElse(AnomState(0L, 0L, 0L))
          val out = Vector.newBuilder[AnomScore]
          evs.foreach { e =>
            val vc = BigDecimal.valueOf(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            st = AnomState(st.n + 1, st.s1c + vc, st.s2c + vc * vc)
            val mu = st.s1c.toDouble / st.n
            val vr = st.s2c.toDouble / st.n - mu * mu
            val zRaw =
              if (st.n >= graft.queries.TimeseriesQueries.AnomalyMinN &&
                vr > graft.queries.TimeseriesQueries.AnomalyVarEpsC)
                Some((vc.toDouble - mu) / math.sqrt(vr))
              else None
            out += AnomScore(e.event_id, userId, e.ts,
              Math.floorDiv(st.s1c, st.n),
              zRaw.map(z => math.floor(z * 100.0).toLong),
              zRaw.exists(z => math.abs(z) > 3.0))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Per-event-type KMV state: the ≤ k smallest distinct user-id
    * hashes, sorted ascending — identical to the batch aggregator's
    * buffer.
    */
  case class KmvState(mins: List[Long])

  /** Emitted per micro-batch per event type that received data. */
  case class KmvRow(event_type: String, kmv_users: Long)

  /** The STREAMING twin of
    * [[graft.queries.SamplingQueries.q115]]: running distinct-user
    * estimates per event type, carrying the SAME
    * [[graft.operators.KmvSketch]] state the batch aggregator builds.
    * Because the KMV sketch is a pure function of the input SET —
    * order-free, duplicate-free, mergeable — the stream equals the
    * batch query EXACTLY under any arrival order and any micro-batch
    * split, with none of the cross-batch caveats the funnel/rolling
    * twins must document. This is the sketch-based online-metrics
    * pattern: per-key state is ≤ k longs forever, emission is one row
    * per active key per batch.
    */
  def kmvUsersMonitor(events: Dataset[Ev]): Dataset[KmvRow] = {
    import events.sparkSession.implicits._
    val k = graft.queries.SamplingQueries.KmvUserK
    val space = graft.queries.SamplingQueries.KmvSpace
    val agg = graft.operators.KmvSketch.aggregator(k,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]](),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[KmvState, KmvRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[KmvState]) =>
          val init = state.getOption.map(_.mins).getOrElse(Nil)
          val mins = it.foldLeft(init) { (b, e) =>
            agg.reduce(b,
              graft.functions.DedupFunctions.md5Hash32Jvm(e.user_id.toString))
          }
          state.update(KmvState(mins))
          Iterator.single(KmvRow(tpe,
            graft.operators.KmvSketch.estimate(mins, k, space)))
      }
  }

  /** Per-user funnel progress: the micros of each completed step, in
    * order (length = steps completed). Monotone — a funnel only ever
    * advances — so state is at most `FunnelSteps.length` longs.
    */
  case class FunnelState(times: List[Long])

  /** Emitted whenever a user ADVANCES at least one step in a
    * micro-batch — the [[graft.queries.TimeseriesQueries.q110]] row
    * shape, so the latest emission per user IS their current funnel
    * row.
    */
  case class FunnelRow(user_id: Long, steps_completed: Long,
                       t_view: Option[Long], t_click: Option[Long],
                       t_purchase: Option[Long])

  /** The STREAMING twin of q110: greedy earliest-first funnel
    * progression tracked online per user. Same strict-after contract
    * (`tus > previous step`, same-micros never advances) applied in
    * (tus, event_id) order within each micro-batch; state is the
    * completed-step times — bounded by the funnel length, the
    * smallest state in this module. Emits only on advancement
    * (funnel dashboards want transitions, not per-event echoes).
    *
    * Consistency caveat (the [[rollingFeatures]] family rule): the
    * greedy walk is order-sensitive across batches — a LATE-arriving
    * earlier step the batch backfill would have used (earlier view,
    * earlier qualifying click) cannot retract an online advancement,
    * so cross-batch out-of-order arrival can leave later step TIMES
    * (never step ORDER) above the batch q110 backfill's minima; depth
    * can only be recovered lower, not wrong. Batch is the source of
    * truth wherever arrival order diverges from event order.
    */
  /** State lifecycle: with `idleTimeoutHours = Some(h)` the stream is
    * watermarked and a user whose funnel has seen no event for `h`
    * hours of EVENT TIME has their state dropped — the per-user state
    * population stays proportional to the ACTIVE user set instead of
    * every user ever seen, which is what lets a year-running deployment
    * hold state in memory. A returning user after expiry starts a
    * fresh funnel (their next row carries new step times — pinned by
    * StreamingSpec); `None` (default) keeps the NoTimeout behavior
    * bit-for-bit.
    */
  def funnelMonitor(events: Dataset[Ev],
                    idleTimeoutHours: Option[Int] = None): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val steps = graft.queries.TimeseriesQueries.FunnelSteps.toArray
    val filtered = events
      .filter(e => e.ts != null && steps.contains(e.event_type))
    val keyed = idleTimeoutHours
      .fold(filtered)(h => filtered.withWatermark("ts", s"$h hours"))
      .groupByKey(_.user_id)
    val timeoutConf = idleTimeoutHours
      .fold(GroupStateTimeout.NoTimeout)(_ => GroupStateTimeout.EventTimeTimeout)
    keyed
      .flatMapGroupsWithVersionedState[FunnelState, FunnelRow](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the TTL: forget the funnel
            Iterator.empty
          } else {
            val evs = it.toVector
              .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            val init = state.getOption.map(_.times).getOrElse(Nil)
            // the SAME walk as batch q110, resumed from state — split-
            // consistency (walk(a++b) == walk(b, init=walk(a)), pinned
            // by PropertySpec) is what makes this resumption exact
            val times = graft.operators.FunnelWalk.walk(
              evs.map(e => (e.event_type,
                e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L)),
              graft.queries.TimeseriesQueries.FunnelSteps.toIndexedSeq, init)
            val advanced = times.length > init.length
            idleTimeoutHours match {
              case Some(h) =>
                // the timeout clock needs defined state, so under TTL
                // mode the state is (re)written on every active batch;
                // expiry is h event-time hours after the user's LATEST
                // event
                state.update(FunnelState(times))
                val maxMs = evs.iterator.map(_.ts.getTime)
                  .foldLeft(0L)(math.max)
                if (maxMs > 0) state.setTimeoutTimestamp(maxMs + h * 3600000L)
              case None =>
                if (advanced) state.update(FunnelState(times))
            }
            if (advanced) {
              def at(j: Int) = if (j < times.length) Some(times(j)) else None
              Iterator.single(FunnelRow(userId, times.length.toLong,
                at(0), at(1), at(2)))
            } else Iterator.empty
          }
      }
  }

  /** Per-event-type experiment state: every observed user's running
    * integer-cents total plus their (fixed, hash-derived) arm. State
    * is bounded by the USER BASE per event type — the inherent floor
    * for an experiment readout, whose variance term needs per-unit
    * totals (x² is not additive across a unit's increments); compare
    * the funnel/rolling monitors, whose state is O(steps)/O(window)
    * per user.
    */
  case class AbState(users: Map[Long, (Int, Long)])

  /** Emitted per micro-batch per event type that received data — the
    * q126 row shape, so the latest emission per type IS the current
    * experiment readout.
    */
  case class AbRow(event_type: String, n_a: Long, n_b: Long,
                   mean_a_cents: Long, mean_b_cents: Long,
                   t2_1e6: Option[Long], significant: Boolean)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q126]]: a live experiment
    * readout per event type. Arms are a pure function of user_id
    * (same md5 split as batch), per-user totals are exact integer
    * cents, and the Welch algebra replays batch's DECIMAL(38,0)
    * truncating divisions in BigInt — so after any prefix of events,
    * in any arrival order and any micro-batch split, the emitted row
    * EQUALS the batch query over the same events (order-free integer
    * state, the KMV/CMS argument — StreamingSpec pins it).
    */
  /** Per-user "last event" marker kept in stream state for the
    * transition feed (event-time micros + id tiebreak + type) — one
    * tiny tuple per user, O(users) total, never history-sized.
    */
  case class TransState(tus: Long, eventId: Long, tpe: String)

  /** One observed `from → to` transition, emitted at arrival. */
  case class TransRow(user_id: Long, from_type: String, to_type: String,
                      ts: Timestamp)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q137]]'s transition extraction:
    * per user, each arriving event paired with that user's previous
    * event in (micros, event_id) order emits one `from → to`
    * transition — the online feed whose (from, to) counts are exactly
    * q137's `n_trans` matrix (StreamingSpec pins the aggregate
    * equality, including across micro-batch splits; the matrix
    * roll-up itself is the consumer's one-line groupBy, batch or
    * windowed).
    *
    * Ordering contract: within a batch, events sort by
    * (micros, event_id) — in-batch disorder is invisible; a
    * CROSS-batch late event (at or below the user's stored marker)
    * is DROPPED, because the transition it would claim was already
    * emitted against a different predecessor and an append stream
    * never revises (the [[rollingFeatures]] caveat: the batch
    * backfill is the source of truth wherever arrival order diverges
    * from event order).
    */
  def transitionEvents(events: Dataset[Ev]): Dataset[TransRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[TransState, TransRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[TransState]) =>
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val evs = it.toVector.sortBy(e => (tusOf(e), e.event_id))
          val out = Vector.newBuilder[TransRow]
          var last = state.getOption
          evs.foreach { e =>
            val tus = tusOf(e)
            val inOrder = last.forall(p =>
              tus > p.tus || (tus == p.tus && e.event_id > p.eventId))
            if (inOrder) {
              last.foreach(p =>
                out += TransRow(userId, p.tpe, e.event_type, e.ts))
              last = Some(TransState(tus, e.event_id, e.event_type))
            } // else: cross-batch late arrival — dropped, see scaladoc
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** One (source, lang) contingency cell emitted by the drift
    * monitor — the monitor's output IS the live contingency table.
    */
  case class CellRow(source: String, lang: String, n: Long)

  /** The STREAMING twin of
    * [[graft.queries.CorpusQueries.q136]]'s contingency table: per
    * source, a running language histogram in
    * `flatMapGroupsWithState`; every micro-batch re-emits the
    * source's full current histogram (bounded by the language space —
    * rows, not corpus). The χ² assembly stays a consumer-side fold
    * over the LATEST cells (counts only grow, so "latest" is max) —
    * the [[transitionEvents]] pattern of emitting the scalable feed
    * and leaving the matrix-sized reduction to the reader;
    * StreamingSpec pins the assembled statistic EXACTLY equal to
    * batch q136 under shuffled arrival and micro-batch splits
    * (order-free integer state — arrival order cannot matter).
    * Canonical sink fold: `latestPerKey(sink, Seq("source","lang"),
    * col("n"))` — see [[latestPerKey]] for the append-mode contract.
    *
    * Scale shape: state is one lang→count map per source (category-
    * space bounded); sources shard across tasks, so no global
    * single-key bottleneck. The online drift alarm a corpus-intake
    * deployment runs continuously where the batch q136 audits
    * snapshots.
    */
  def langMixMonitor(docs: Dataset[(Long, String, String)]): Dataset[CellRow] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._2)
      .flatMapGroupsWithVersionedState[Map[String, Long], CellRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(Long, String, String)],
         state: GroupState[Map[String, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach { d => m += d._3 -> (m.getOrElse(d._3, 0L) + 1L) }
          state.update(m)
          m.iterator.map { case (l, n) => CellRow(src, l, n) }
      }
  }

  /** Per-user last-known-value marker for the online forward fill. */
  case class FillState(tus: Long, eventId: Long, value: Double)

  /** One imputed event — the q144 row shape. */
  case class FilledEv(event_id: Long, user_id: Long,
                      value: Option[Double], filled_value: Option[Double],
                      was_filled: Boolean)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q144]]'s forward fill: each
    * arriving event is emitted with its null `value` repaired from
    * the user's most recent non-null reading — online feature
    * imputation from O(1) state per user (one (micros, id, value)
    * marker — the serving-path complement of the batch backfill,
    * train/serve consistency pinned by StreamingSpec under ordered
    * delivery across micro-batch splits).
    *
    * Ordering contract (the [[transitionEvents]] discipline): within
    * a batch events sort by (micros, event_id); a CROSS-batch late
    * event is filled from the CURRENT marker — the only value an
    * online imputer has — which may postdate the late row; the batch
    * backfill is the source of truth wherever arrival order diverges
    * from event order.
    */
  def forwardFill(events: Dataset[Ev]): Dataset[FilledEv] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[FillState, FilledEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[FillState]) =>
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val evs = it.toVector.sortBy(e => (tusOf(e), e.event_id))
          var last = state.getOption
          val out = evs.map { e =>
            val v = Option(e.value).filterNot(_.isNaN)
            val filled = v.orElse(last.map(_.value))
            val tus = tusOf(e)
            if (v.isDefined && last.forall(p =>
                tus > p.tus || (tus == p.tus && e.event_id > p.eventId)))
              last = Some(FillState(tus, e.event_id, e.value))
            FilledEv(e.event_id, userId, v, filled,
              v.isEmpty && filled.isDefined)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  def abMonitor(events: Dataset[Ev]): Dataset[AbRow] = {
    import events.sparkSession.implicits._
    val bar = graft.queries.TimeseriesQueries.AbT2Bar1e6
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[AbState, AbRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[AbState]) =>
          var users = state.getOption.map(_.users).getOrElse(Map.empty)
          it.foreach { e =>
            val cents = BigDecimal.valueOf(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val arm = (graft.functions.DedupFunctions
              .md5Hash32Jvm("ab-" + e.user_id) % 2).toInt
            val cur = users.getOrElse(e.user_id, (arm, 0L))
            users += e.user_id -> ((arm, cur._2 + cents))
          }
          state.update(AbState(users))
          // exact BigInt replay of q126's DECIMAL(38,0) algebra —
          // truncating division per step, identical results
          def stats(arm: Int): (BigInt, BigInt, BigInt) = {
            val xs = users.valuesIterator.filter(_._1 == arm).map(_._2)
            var n = BigInt(0); var s = BigInt(0); var q = BigInt(0)
            xs.foreach { x => n += 1; s += x; q += BigInt(x) * x }
            (n, s, q)
          }
          val (na, sa, qa) = stats(0)
          val (nb, sb, qb) = stats(1)
          if (na == 0 || nb == 0) Iterator.empty // readout undefined
          else {
            val ma = sa / na
            val mb = sb / nb
            val t2: Option[Long] =
              if (na < 2 || nb < 2) None
              else {
                val se2 = ((na * qa - sa * sa) / (na * (na - 1))) / na +
                  ((nb * qb - sb * sb) / (nb * (nb - 1))) / nb
                if (se2 == 0) None
                else Some((((ma - mb) * (ma - mb) * 1000000) / se2).toLong)
              }
            Iterator.single(AbRow(tpe, na.toLong, nb.toLong,
              ma.toLong, mb.toLong, t2, t2.exists(_ >= bar)))
          }
      }
  }

  /** A fired burst alarm — the streaming twin of one q181 output row. */
  case class BurstRow(event_type: String, hour_ts: Timestamp,
                      n: Long, trailing24: Long, ratio_1e2: Long)

  /** [[burstMonitor]]'s state: the in-order marker, the hour being
    * accumulated, and the trailing ≤ 25 hourly counts (pruned on
    * advance) — O(baseline window) per type, independent of history.
    */
  case class BurstState(tus: Long, eventId: Long, curH: Long,
                        hours: Map[Long, Long])

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q181]]'s burst detector: hourly
    * counts accumulate in state, and the moment an arrival ADVANCES
    * the hour, the completed hour's alarm decision is final and emits
    * (silent skipped hours can never alarm — n = 0 — so only present
    * hours evaluate, exactly the batch hourly-table semantics; the
    * trailing-24 baseline sums the state's pruned hour map, which is
    * the RANGE frame's contents). The still-open hour never emits —
    * its count isn't final until a later-hour event closes it
    * (StreamingSpec closes every real hour with a far-future sentinel
    * and pins streamed == batch EXACTLY).
    *
    * Ordering contract: the [[transitionEvents]] discipline — in-batch
    * rows sort by (micros, event_id); a cross-batch late arrival at or
    * below the marker drops (revising a CLOSED hour's count would
    * retract an emitted alarm; an append stream never revises).
    */
  def burstMonitor(events: Dataset[Ev]): Dataset[BurstRow] = {
    import events.sparkSession.implicits._
    val factor = graft.queries.TimeseriesQueries.BurstFactor1e2
    val baseH = graft.queries.TimeseriesQueries.BurstBaselineHours
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[BurstState, BurstRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[BurstState]) =>
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val evs = it.toVector.sortBy(e => (tusOf(e), e.event_id))
          val out = Vector.newBuilder[BurstRow]
          var st = state.getOption.getOrElse(
            BurstState(Long.MinValue, Long.MinValue, Long.MinValue, Map.empty))
          def closeCurrent(): Unit = if (st.curH != Long.MinValue) {
            val n = st.hours.getOrElse(st.curH, 0L)
            val trailing = st.hours.iterator.collect {
              case (h, c) if h >= st.curH - baseH && h < st.curH => c
            }.sum
            if (trailing > 0 && n * baseH * 100 >= trailing * factor)
              out += BurstRow(tpe, new Timestamp(st.curH * 3600000L),
                n, trailing, n * baseH * 100 / trailing)
          }
          evs.foreach { e =>
            val tus = tusOf(e)
            val inOrder = tus > st.tus ||
              (tus == st.tus && e.event_id > st.eventId)
            if (inOrder) {
              val h = tus / 3600000000L
              if (h > st.curH) {
                closeCurrent()
                st = st.copy(curH = h,
                  hours = st.hours.filter { case (k, _) => k >= h - baseH })
              }
              st = st.copy(tus = tus, eventId = e.event_id,
                hours = st.hours.updated(h, st.hours.getOrElse(h, 0L) + 1L))
            } // else: cross-batch late arrival — dropped, see scaladoc
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The live SRM card — one emission per experiment population per
    * micro-batch (the latest is the current truth).
    */
  case class SrmRow(event_type: String, n_a: Long, n_b: Long,
                    chi2_1e6: Long, srm_alarm: Boolean)

  /** [[srmMonitor]]'s state: the distinct user sets per arm — exact
    * (the guardrail must not false-alarm on sketch error), state ∝
    * the experiment's active population (the [[rollingFeatures]]
    * state-size contract; a KMV sketch is the documented fallback
    * when a population outgrows executor memory).
    */
  case class SrmState(seenA: Set[Long], seenB: Set[Long])

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q189]]'s sample-ratio-mismatch
    * guardrail: arms assign by the same `md5('ab-'++user)` coin
    * (JVM-evaluated, identical constant), distinct users accumulate
    * per arm, and each micro-batch emits the current χ² card — so a
    * bucketing bug alarms DURING the experiment, not at readout.
    * The final card equals batch q189 exactly (StreamingSpec pins
    * it); arrival order is irrelevant here — set union commutes — so
    * this twin needs no ordering contract at all. Canonical sink
    * fold: `latestPerKey(sink, Seq("event_type"),
    * col("n_a") + col("n_b"))` — see [[latestPerKey]].
    */
  def srmMonitor(events: Dataset[Ev]): Dataset[SrmRow] = {
    import events.sparkSession.implicits._
    val bar = graft.queries.TimeseriesQueries.SrmChi2Bar1e6
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[SrmState, SrmRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[SrmState]) =>
          var st = state.getOption.getOrElse(SrmState(Set.empty, Set.empty))
          it.foreach { e =>
            val arm = graft.functions.DedupFunctions
              .md5Hash32Jvm(s"ab-${e.user_id}") % 2
            st = if (arm == 0L) st.copy(seenA = st.seenA + e.user_id)
                 else st.copy(seenB = st.seenB + e.user_id)
          }
          state.update(st)
          val (na, nb) = (st.seenA.size.toLong, st.seenB.size.toLong)
          val chi2 = if (na + nb == 0) 0L
            else (na - nb) * (na - nb) * 1000000L / (na + nb)
          Iterator.single(SrmRow(tpe, na, nb, chi2, chi2 > bar))
      }
  }

  /** The live per-type quantile card (exact, from the value
    * histogram).
    */
  case class QuantRow(event_type: String, n: Long,
                      median_cents: Long, p90_cents: Long)

  /** [[quantileMonitor]]'s state: the exact (cents → count) value
    * histogram per type — O(value domain), the SAME bound the batch
    * q185 argues for its shuffle, and the reason this monitor can be
    * exact where a row-buffer would grow without limit.
    */
  case class QuantState(hist: Map[Long, Long])

  /** The STREAMING twin of
    * [[graft.queries.SamplingQueries.q185]]'s histogram quantiles:
    * the per-type value histogram accumulates in state and each
    * micro-batch emits the current EXACT median/p90 (type-1 order
    * statistics at ⌈p·n⌉, scanned from the sorted histogram). Like
    * [[srmMonitor]], histogram merge commutes — no ordering contract;
    * the final card equals batch q185 exactly (StreamingSpec pins it
    * under reversed delivery). Canonical sink fold:
    * `latestPerKey(sink, Seq("event_type"), col("n"))` — see
    * [[latestPerKey]].
    */
  def quantileMonitor(events: Dataset[Ev]): Dataset[QuantRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[QuantState, QuantRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[QuantState]) =>
          var h = state.getOption.map(_.hist).getOrElse(Map.empty[Long, Long])
          it.foreach { e =>
            val v = math.round(e.value * 100)
            h = h.updated(v, h.getOrElse(v, 0L) + 1L)
          }
          state.update(QuantState(h))
          val n = h.valuesIterator.sum
          def at(rank: Long): Long = {
            var cum = 0L
            val sorted = h.toArray.sortBy(_._1)
            var i = 0
            while (i < sorted.length && cum + sorted(i)._2 < rank) {
              cum += sorted(i)._2; i += 1
            }
            sorted(math.min(i, sorted.length - 1))._1
          }
          Iterator.single(QuantRow(tpe, n,
            at((n + 1) / 2), at((9 * n + 9) / 10)))
      }
  }

  /** The live per-user TWAP card (closed intervals only). */
  case class TwapRow(user_id: Long, n_intervals: Long,
                     span_us: Long, twap_cents: Long)

  /** [[twapMonitor]]'s state: the in-order marker with the held
    * observation, plus the running integral — O(1) per user. The
    * cents·µs integral is held as a FULL 128-bit value in two longs
    * (`numHi`:`numLo`, two's-complement): a single year-scale
    * interval at 10⁶ cents is ~3·10¹⁹ — already past Long.MaxValue —
    * so the product is taken with `Math.multiplyHigh` and folded with
    * a carry-aware add; nothing saturates, matching batch q187's
    * DECIMAL(38,0) exactly at any span.
    *
    * STATE-SCHEMA BREAK (r10): widening `num: Long` to `numHi`/`numLo`
    * changed the flatMapGroupsWithState state encoding — a
    * [[twapMonitor]] query resumed from a checkpoint written before
    * the widening will fail (or misdecode state) on restart. Restart
    * such a stream with a NEW checkpoint directory and replay the
    * source; the monitors are deterministic over their input log, so
    * replay reconverges to the same cards. Since r12 this class of
    * break is ENFORCED, not just documented: every monitor's state
    * rides in a version-stamped [[StateVersion.VState]] envelope, and
    * a semantic re-versioning (same fields, new meaning) fails the
    * resumed read with the named
    * [[StateVersion.MismatchException]] instead of misdecoding.
    */
  case class TwapState(tus: Long, eventId: Long, cents: Long,
                       numHi: Long, numLo: Long, den: Long, n: Long)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q187]]'s time-weighted average:
    * each arrival CLOSES the previously held observation's interval
    * (weight = how long it held) and folds it into the running
    * integral; the still-held observation is never counted — exactly
    * the batch query's lead-window semantics, so the final card
    * equals q187 row-for-row (StreamingSpec pins it). Emissions are
    * per-user per-batch; users with no closed interval stay silent.
    *
    * Ordering contract: the [[transitionEvents]] discipline — late
    * arrivals below the (micros, event_id) marker drop, because the
    * interval they would split has already been integrated.
    * Canonical sink fold: `latestPerKey(sink, Seq("user_id"),
    * col("n_intervals"))` — see [[latestPerKey]].
    */
  def twapMonitor(events: Dataset[Ev]): Dataset[TwapRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithVersionedState[TwapState, TwapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[TwapState]) =>
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val evs = it.toVector.sortBy(e => (tusOf(e), e.event_id))
          var st = state.getOption.getOrElse(
            TwapState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, 0L))
          evs.foreach { e =>
            val tus = tusOf(e)
            val inOrder = tus > st.tus ||
              (tus == st.tus && e.event_id > st.eventId)
            if (inOrder) {
              if (st.tus != Long.MinValue) {
                val dur = tus - st.tus
                // full 128-bit cents·dur product folded with carry:
                // a lone year-scale interval already overflows a long
                val pHi = Math.multiplyHigh(st.cents, dur)
                val pLo = st.cents * dur
                val lo = st.numLo + pLo
                val carry =
                  if (java.lang.Long.compareUnsigned(lo, pLo) < 0) 1L else 0L
                st = st.copy(numHi = st.numHi + pHi + carry, numLo = lo,
                  den = st.den + dur, n = st.n + 1)
              }
              st = st.copy(tus = tus, eventId = e.event_id,
                cents = math.round(e.value * 100))
            } // else: late arrival — its interval is already integrated
          }
          state.update(st)
          if (st.den > 0) {
            // fast path while the integral fits a long (hi is the sign
            // extension of lo); BigInt only transiently at emit otherwise
            val twap =
              if (st.numHi == (st.numLo >> 63))
                st.numLo / st.den
              else (((BigInt(st.numHi) << 64) |
                BigInt(java.lang.Long.toUnsignedString(st.numLo))) /
                st.den).toLong
            Iterator.single(TwapRow(uid, st.n, st.den, twap))
          } else Iterator.empty
      }
  }

  /** Per-type concurrency at an arrival: the open-interval count the
    * moment this event starts, plus the running high-water mark.
    */
  case class ConcRow(event_type: String, ts: Timestamp,
                     concurrent: Long, max_concurrent: Long)

  /** [[concurrencyMonitor]]'s state: the in-order marker, the open
    * intervals' end-times, and the high-water mark. `ends` holds only
    * intervals still open at the last arrival — state is proportional
    * to INSTANTANEOUS concurrency (rate × hold window), never to
    * history.
    */
  case class ConcState(tus: Long, eventId: Long,
                       ends: List[Long], maxC: Long)

  /** The STREAMING twin of
    * [[graft.queries.TimeseriesQueries.q158]]'s sweep-line peak
    * concurrency: each arriving event opens a
    * [t, t+[[graft.queries.TimeseriesQueries.ConcurrencyHoldUs]])
    * interval; the monitor counts the still-open intervals at each
    * start (exclusive end — an interval ending exactly AT the new
    * start is closed first, the batch sweep's ends-before-starts tie
    * key) and carries the high-water mark. The final per-type
    * `max_concurrent` equals batch q158 exactly (StreamingSpec pins
    * it across micro-batch splits); the per-arrival `concurrent`
    * column is the live capacity signal the batch sweep can only
    * reconstruct after the fact.
    *
    * Ordering contract: the [[transitionEvents]] discipline — in-batch
    * rows sort by (micros, event_id); a cross-batch late arrival at or
    * below the marker is dropped (its sweep position is already
    * history, and an append stream never revises).
    */
  def concurrencyMonitor(events: Dataset[Ev]): Dataset[ConcRow] = {
    import events.sparkSession.implicits._
    val holdUs = graft.queries.TimeseriesQueries.ConcurrencyHoldUs
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithVersionedState[ConcState, ConcRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Ev], state: GroupState[ConcState]) =>
          def tusOf(e: Ev): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val evs = it.toVector.sortBy(e => (tusOf(e), e.event_id))
          val out = Vector.newBuilder[ConcRow]
          var st = state.getOption
            .getOrElse(ConcState(Long.MinValue, Long.MinValue, Nil, 0L))
          evs.foreach { e =>
            val tus = tusOf(e)
            val inOrder = tus > st.tus ||
              (tus == st.tus && e.event_id > st.eventId)
            if (inOrder) {
              val open = st.ends.filter(_ > tus) // exclusive-end evict
              val conc = open.length + 1L
              val maxC = math.max(st.maxC, conc)
              st = ConcState(tus, e.event_id, (tus + holdUs) :: open, maxC)
              out += ConcRow(tpe, e.ts, conc, maxC)
            } // else: cross-batch late arrival — dropped, see scaladoc
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** THE CONSUMER CONTRACT for the cumulative-card monitors
    * ([[langMixMonitor]], [[srmMonitor]], [[quantileMonitor]],
    * [[twapMonitor]]): they emit under `OutputMode.Append`, so an
    * append-only sink (files, a log topic) accumulates every
    * superseded card, and the current truth is the LATEST row per
    * key. This fold recovers it from the accumulated sink: the row
    * whose `seq` value is maximal per key, where `seq` is any
    * monotonically-nondecreasing expression of the card — each
    * monitor's scaladoc names its monotone column ([[CellRow]]`.n`,
    * [[SrmRow]]`.n_a + .n_b`, [[QuantRow]]`.n`,
    * [[TwapRow]]`.n_intervals`). Ties on `seq` are bit-identical
    * cards by the monitors' state-only-grows construction, so the
    * struct-max tiebreak is immaterial.
    *
    * Scale shape: one partial-aggregated groupBy over the sink —
    * card-space-sized, never event-sized.
    *
    * Column contract (r10 ADVICE): every non-key column must be
    * ORDERABLE (struct max compares them field-by-field after `seq` —
    * maps/udts would fail analysis); all monitor cards are flat
    * long/string/timestamp rows, which qualify. Card column NAMES are
    * arbitrary: the internal seq field is underscore-extended until it
    * collides with no card column, and fields are recovered with
    * `getField` (never string-path `col("latest." + c)`), so a card
    * column named `__seq` or containing dots resolves correctly.
    */
  def latestPerKey(cards: DataFrame, keyCols: Seq[String],
                   seq: org.apache.spark.sql.Column): DataFrame = {
    // backtick-quote every name reference so a dot is a character, not
    // a nesting path (names containing a literal backtick remain out of
    // contract — no Spark-side quoting can express them)
    def ref(c: String) = col("`" + c + "`")
    val others = cards.columns.filterNot(keyCols.contains).toSeq
    val seqName =
      Iterator.iterate("__seq")("_" + _).dropWhile(others.contains).next()
    val latest = max(struct(seq.as(seqName) +: others.map(ref): _*))
    cards.groupBy(keyCols.map(ref): _*)
      .agg(latest.as("latest"))
      .select(keyCols.map(ref) ++
        others.map(c => col("latest").getField(c).as(c)): _*)
  }
}
