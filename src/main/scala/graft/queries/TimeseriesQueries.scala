package graft.queries

import graft.Materialize.Ops

import graft.Tables
import graft.functions.{GeoFunctions, TimeFunctions}
import graft.operators.BandJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / telemetry operators over `events` — the star-schema
  * analog of the reference's SIRI vehicle-location stream. Covers the
  * first/last-per-ride, duration-watermark, band-match, nearest-point
  * and packaging-format operators (SURVEY.md §2.3 J5-J7/J11, §2.4
  * A5-A7/A11, §2.8 F2/F4-F8/F11, §2.9 T2/T3).
  */
object TimeseriesQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Fixed "now" so the watermark queries are deterministic across runs
    * (data epoch is Jan 2024, see TESTDATA.md).
    */
  val NowLit = "2024-01-31 00:00:00"

  /** q10 — first/last row per group in ONE aggregation (§2.4 A5, §2.6 O1,
    * §2.3 J5). Ref: two point-queries per ride
    * (`siri/add_ride_durations.py:28-48`), a 1+2N pattern. Here:
    * `min/max(struct(ts, id))` with map-side partial aggregation — one
    * shuffle on user_id, no window sort. Null timestamps are dropped
    * first (`NULLS LAST` take-first semantics: a null can never win).
    */
  def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("ts").isNotNull)
      .groupBy("user_id")
      .agg(
        min(struct(col("ts"), col("event_id"))).as("f"),
        max(struct(col("ts"), col("event_id"))).as("l"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("f.event_id").as("first_event_id"), col("f.ts").as("first_ts"),
        col("l.event_id").as("last_event_id"), col("l.ts").as("last_ts"),
        col("n_events"))

  /** q11 — duration with completion watermark + late-data give-up
    * (§2.4 A6, §2.9 T2/T3). Ref: `siri/add_ride_durations.py:68-84`:
    * duration only when the last point is >6h old (ride surely over);
    * rows stale >2 days get duration 0; otherwise still pending (null).
    * Time math in exact integer micros.
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val now = lit(NowLit).cast("timestamp")
    q10(s, dir).select(
      col("user_id"),
      when(col("last_ts") < now - expr("INTERVAL 6 HOURS"),
        round((unix_micros(col("last_ts")) - unix_micros(col("first_ts"))) / 6e7)
          .cast("long"))
        .when(col("first_ts") < now - expr("INTERVAL 2 DAYS"), 0L)
        .otherwise(lit(null).cast("long"))
        .as("duration_min"))
  }

  /** q12 — band join with deterministic nearest arbitration (§2.3 J7,
    * §7.4). Ref: ±1/±3/±5-min cascade with arbitrary pick
    * (`siri/update_rides_gtfs.py:80-97`); ours: one join, global nearest
    * within the widest band, total tiebreak. Each signup is matched to
    * the nearest purchase of the same user within ±12h.
    */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    BandJoin.nearestWithin(signups, purchases,
      equiKeys = Seq("user_id"),
      leftTs = "ts", rightTs = "ts",
      toleranceSec = 12 * 3600,
      leftId = "signup_id", rightTieBreak = "purchase_id")
      .select(col("signup_id"), col("l.user_id").as("user_id"),
        col("purchase_id"), col("_diff_us").as("diff_us"))
  }

  /** q19 — per-hour count/min/max/sum (§2.4 A11, A3).
    * Ref: legacy hours-report fold `packagers/siri.py:460-482` — a
    * single-threaded Python dict fold; here one hash aggregation.
    */
  def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_rows"),
        min("ts").as("min_ts"), max("ts").as("max_ts"),
        round(sum("value"), 2).as("sum_value"))

  /** q22 — per-group argmin by a computed distance (§2.4 A7, §2.8 F2).
    * Ref: nearest vehicle location per ride stop, Python argmin over
    * geodesic distances (`siri/update_ride_stops_vehicle_locations.py:14-56`).
    * Coordinates are synthesized deterministically from event fields
    * (the lake has no geo columns); the haversine is pure column math,
    * the argmin one aggregation — no window sort, no UDF.
    */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("lat", col("value") % 90.0)
      .withColumn("lon", (col("event_id") % 360L).cast("double") - 180.0)
    val dist = GeoFunctions.haversineMeters(
      col("lat"), col("lon"), lit(32.0853), lit(34.7818)) // Tel Aviv
    e.withColumn("dist_m", round(dist).cast("long"))
      .groupBy("user_id")
      .agg(min(struct(col("dist_m"), col("event_id"))).as("m"),
        count(lit(1)).as("n_points"))
      .select(col("user_id"), col("m.dist_m").as("nearest_dist_m"),
        col("m.event_id").as("nearest_event_id"), col("n_points"))
  }

  /** q23 — bbox (geo window) filter (§2.2 P8). Ref: stops within
    * `min_lon,min_lat,max_lon,max_lat` (`urbanaccess/areas.yaml:1-17`,
    * `update_areas_fake_gtfs.py:14-16,43`). Coordinates synthesized as
    * in q22; both `between` predicates push down to the scan.
    */
  def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("lat", col("value") % 90.0)
      .withColumn("lon", (col("event_id") % 360L).cast("double") - 180.0)
      .filter(col("lat").between(10.0, 40.0) && col("lon").between(-30.0, 60.0))
      .select(col("event_id"), col("user_id"),
        round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"))

  /** q24 — interval arithmetic (§2.8 F4). Ref: `'{n} minutes'::interval`
    * `siri/update_rides_gtfs.py:22-23`.
    */
  def q24(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"))
      .filter(col("due_date") < lit("1996-01-01").cast("timestamp"))

  /** q25 — timezone conversion to Israel-local display strings
    * (§2.8 F6/F13, §2.2 P7). Ref: row normalizer `packagers/siri.py:70-80`.
    * Session TZ stays UTC; the conversion is an explicit expression.
    */
  def q25(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "signup")
      .select(col("event_id"),
        TimeFunctions.israelIso(col("ts")).as("local_time"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("utc_time"))

  /** q26 — path/partition formatting (§2.8 F7/F8/F15). Ref: snapshot_id
    * `YYYY/MM/DD/HH/MM` (`common.py:8-9`) and `%Y/%m/` partition paths
    * (`packagers/siri.py:166-167`). Grouped so the output is a partition
    * manifest, the packager's work list (§2.9 T6).
    */
  def q26(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy/MM/dd/HH").as("hour_path"))
      .agg(count(lit(1)).as("n_rows"),
        max(TimeFunctions.toSnapshotId(col("ts"))).as("max_snapshot_id"))

  /** q27 — JSON field extraction + per-type stats (§2.8 F11, §2.4 A12).
    * Ref: metadata_json `artifacts/common.py:41,104`. Extraction by
    * regexp so the DuckDB oracle needs no JSON extension; `get_json_
    * object` is the production path (see JsonSpec).
    */
  def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        max("k").as("max_k"))

  /** q39 — running aggregate window (§2.5; beyond-reference but core
    * Spark): per-user running sum of `value` ordered by time. The window
    * sort shares the shuffle with the partition key.
    */
  def q39(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(sum(col("value")).over(w), 2).as("running_value"))
  }

  /** q42 — gap-based sessionization, batch form (§2.9 beyond-reference;
    * the streaming twin is [[graft.streaming.EventStreams.sessionize]]).
    * Classic lag→gap-flag→running-sum→group: one shuffle on user_id,
    * both windows and the final groupBy share it (same partition key).
    */
  val SessionGapHours = 6

  def q42(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = SessionGapHours * 3600L * 1000000L
    t(s, dir, "events")
      .filter(col("ts").isNotNull)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_s").over(run))
      .groupBy("user_id", "session_seq")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
  }

  /** q47 — as-of join (§2.3 beyond-reference; the brief's named missing
    * operator): each signup picks up the most recent prior-or-equal
    * purchase value of the same user via [[graft.operators.AsOfJoin]]'s
    * union+window form — one shuffle, no join fanout. The oracle
    * emulates the identical semantics (latest ts, then latest id) with
    * a window, not DuckDB's ASOF keyword, so tie arbitration is pinned.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").filter(col("ts").isNotNull)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    graft.operators.AsOfJoin.latestAtOrBefore(
      signups, purchases, "user_id", "ts", "ts", "value", "event_id")
      .select(col("signup_id"), col("user_id"), col("asof_value"))
  }

  /** Minimum history and centi-variance floor before q102 emits a
    * z-score.
    */
  val AnomalyMinN = 10
  val AnomalyVarEpsC = 1e-4

  /** q102 — ONLINE anomaly scoring (§2.5 family): each event's z-score
    * against its user's RUNNING mean/variance at that moment — the
    * monitoring primitive a telemetry pipeline (or the reference's
    * siri-monitor dashboards) computes per device.
    *
    * Numeric discipline (this query earned a new rule, then a
    * STRICTER one after round 7): `value` is 2-decimal money-like
    * data, so all accumulation runs on EXACT integer cents — the
    * cumulative sums are order-free longs, every derived double
    * (mean, variance, z) is then bit-identical across engines by IEEE
    * determinism. NOTHING in the output is decimal-rounded: rounding
    * a double is engine-ambiguous both on .xx5 decimals (s1/n lands
    * exactly on one for every dyadic n — observed live at sf0.01 row
    * 13, 40.355 → 40.36 vs 40.35) AND across DuckDB versions whose
    * `round()` changed binary-vs-decimal strategy (the round-7 gate
    * flagged `round(z, 2)` against a driver DuckDB this engine never
    * saw). So the mean ships as FLOOR centi-units via an exact
    * pmod-based integer floor division — `(s1c − pmod(s1c, n)) div n`
    * — whose numerator is exactly divisible, making trunc-vs-floor
    * `div` semantics irrelevant on both engines and correct for
    * negative sums too (round-7 advisory: Spark `div` truncates,
    * DuckDB `//` floors; they diverged on negative money). The
    * z-score ships as `floor(z·100)` centi-z: one IEEE multiply and
    * one floor on a bit-identical double — exact on any engine, no
    * rounding mode involved. Variance via `s2c/n − (s1c/n)²`; z gated
    * on [[AnomalyMinN]] history rows and [[AnomalyVarEpsC]]
    * (cancellation guard), flag on raw |z| > 3.
    *
    * Scale shape: ONE shuffle on user_id; all three cumulative window
    * aggregates and the flag projection share it (running frames in
    * pinned (ts, event_id) order — the q39 family). Per-user state is
    * two longs and a count — the streaming twin would carry the same
    * state through mapGroupsWithState.
    */
  def q102(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mu = col("s1c").cast("double") / col("n")
    val vr = col("s2c").cast("double") / col("n") - mu * mu
    val zRaw = (col("vc").cast("double") - mu) / sqrt(vr)
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("vc"))
      // one select, one Window node: chained withColumns left Catalyst
      // with two Window operators over the same spec (shared exchange
      // either way, but the single node skips a second buffer pass)
      .select(col("event_id"), col("user_id"), col("ts"), col("vc"),
        count(lit(1)).over(w).as("n"),
        sum(col("vc")).over(w).as("s1c"),
        sum(col("vc") * col("vc")).over(w).as("s2c"))
      .withColumn("z",
        when(col("n") >= AnomalyMinN && vr > AnomalyVarEpsC, zRaw))
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("(s1c - pmod(s1c, n)) div n").as("mean_centi"),
        floor(col("z") * lit(100.0)).as("z_centi"),
        coalesce(abs(col("z")) > 3.0, lit(false)).as("is_anomaly"))
  }

  /** Trailing-feature horizons for [[q105]], in event-time micros. */
  val FeatureHorizon1 = 3600L * 1000000L        // 1 hour
  val FeatureHorizon2 = 24L * 3600L * 1000000L  // 24 hours

  /** q105 — multi-horizon ROLLING FEATURES (§2.5 family, the
    * feature-engineering shape): for every event, its user's activity
    * count and exact centi-sum over the trailing 1-hour and 24-hour
    * event-time windows — the classic online-ML feature vector
    * (velocity + short/long-horizon spend) a fraud or engagement model
    * trains on, and a different WINDOW FRAME TYPE from everything else
    * in the suite: RANGE frames over event-time micros
    * (`[t−H, t]` inclusive), not ROWS frames ([[q39]]/[[q102]]) and
    * not gap sessionization ([[q42]]).
    *
    * Determinism: RANGE frames are insensitive to intra-tie order —
    * peers at the same `tus` are all in-frame on every engine — and
    * both aggregates (long count, long centi-sum) are order-free, so
    * no tiebreak column is needed at all (contrast q39's (ts,
    * event_id) ROWS ordering). The q102 integer-cents discipline keeps
    * the sums exact.
    *
    * Scale shape: ONE shuffle on user_id; both horizons share the
    * exchange and sort (same partition + ordering, two frame specs —
    * Catalyst stacks two Window nodes over one sort, no second
    * exchange; PlanSpec pins it). Per-partition evaluation is the
    * sliding two-pointer pass over the sorted run — O(rows) state, no
    * per-row rescan, which is what makes a 100 TB backfill of these
    * features one linear pass per user-shard.
    */
  def q105(s: SparkSession, dir: String): DataFrame = {
    val w1 = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-FeatureHorizon1, 0)
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-FeatureHorizon2, 0)
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("vc"),
        unix_micros(col("ts")).as("tus"))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w1).as("n_1h"),
        sum(col("vc")).over(w1).as("sum_centi_1h"),
        count(lit(1)).over(w2).as("n_24h"),
        sum(col("vc")).over(w2).as("sum_centi_24h"))
  }

  /** Funnel step sequence for [[q110]] — interpolated into BOTH the
    * typed pass and the oracle SQL, the shared-constant discipline.
    */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** q110 — FUNNEL analysis (ordered event-sequence matching): for
    * every user, how far through view → click → purchase did they get,
    * where each step must occur STRICTLY AFTER the previous step's
    * time (`tus > prev` — a same-micros click does not "follow" its
    * view, which also makes the result tie-order-independent:
    * every step time is a min over a predicate on VALUES, never on
    * row positions). The step times reported are the earliest
    * consistent ones: t₁ = min view time, t₂ = min click time > t₁,
    * t₃ = min purchase time > t₂ — the greedy earliest-first walk,
    * which reaches the deepest step any assignment can reach (greedy
    * minimizes every prefix deadline, so any feasible chain is
    * feasible under it).
    *
    * Scale shape: ONE shuffle on user_id, then a single sorted typed
    * pass per user (`mapGroups` — per-group state is the sorted event
    * array, bounded by per-user activity, the q42/sessionize memory
    * argument). The oracle replays the same semantics as chained
    * min-aggregation JOINs (k aggregations + k joins) — correct but
    * k+1 shuffles; the engine plan does all steps in one pass, the
    * funnel-at-100-TB shape.
    */
  def q110(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isin(FunnelSteps: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        // the walk itself is the shared FunnelWalk definition — the
        // streaming monitor resumes the SAME function from state
        val evs = it.toArray.sortBy(_._3)
        val times = graft.operators.FunnelWalk.walk(
          evs.map(e => (e._2, e._3)), FunnelSteps.toIndexedSeq)
        def at(j: Int): Option[Long] =
          if (j < times.length) Some(times(j)) else None
        (uid, times.length.toLong, at(0), at(1), at(2))
      }
      .toDF("user_id", "steps_completed", "t_view", "t_click", "t_purchase")
  }

  /** Epoch-week micros for [[q111]]'s cohort grid. */
  val WeekUs: Long = 7L * 86400L * 1000000L

  /** q111 — COHORT RETENTION (the funnel's reporting companion): users
    * are grouped into signup-week cohorts (`min` signup time, floored
    * to epoch weeks — integer division both engines floor identically
    * on non-negative micros), and each cohort's retention curve counts
    * how many of its users were active (ANY event) in each subsequent
    * week offset. Pre-signup activity is deliberately excluded
    * (`wk ≥ cohort_wk`): a cohort table answers "of the users acquired
    * in week W, how many came back k weeks later".
    *
    * Scale shape: the per-user cohort is one groupBy(user); activity
    * is (user, week) DISTINCT — after which the per-cell count needs
    * NO countDistinct (the pairs are already unique, so `count(*)`
    * suffices: cheap partial-agg instead of a distinct-aggregate
    * buffer); join on user_id broadcast-or-merge as stats dictate.
    * Output is cohort-weeks × offsets — a report, never corpus-sized.
    */
  def q111(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div ${WeekUs}L").as("wk"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    ev.select(col("user_id"), col("wk")).distinct()
      .join(cohort, "user_id")
      .filter(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** z²/t² significance bar for [[q126]] in 10⁻⁶ fixed point:
    * 1.96² = 3.8416 (two-sided 95%, large-sample).
    */
  val AbT2Bar1e6 = 3841600L

  /** q126 — deterministic A/B comparison (Welch-style t² per event
    * type): hash-split users into two arms (`md5("ab-" + user_id) % 2`
    * — the q43/q60 reproducible-assignment discipline, so the SAME
    * users land in the SAME arms on any engine, any run, any cluster),
    * aggregate each user's total value to integer cents (unit of
    * analysis = unit of randomization), and compute the squared
    * t-statistic from the five per-arm sufficient statistics — the
    * experiment-readout aggregation an event pipeline runs at 100 TB.
    *
    * Exactness contract: sums accumulate in DECIMAL(38,0); means,
    * variances (`(n·Q − S²) div (n·(n−1))` cents²), standard-error²
    * and `t²·10⁶` are each ONE truncating integral division — the
    * same truncation on both engines (the q121 measurement), so the
    * readout hash-gates despite being a ratio of big rationals. The
    * stepwise truncation costs ≤ 1 unit per step — immaterial against
    * the 3.84 significance bar and identical cross-engine, which is
    * the property that matters. `significant` compares `t²·10⁶`
    * against [[AbT2Bar1e6]]; degenerate arms (n < 2 or zero variance)
    * yield NULL t² and false.
    *
    * Scale shape: one partial-agg exchange to per-(type, user) totals,
    * one conditional-aggregation exchange to per-type arm statistics
    * (no pivot, no self-join), then pure row algebra on the k-type
    * result.
    */
  def q126(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("event_type", "user_id")
      .agg(sum(col("cents")).cast("decimal(38,0)").as("x"))
      .withColumn("arm",
        graft.functions.DedupFunctions.md5Hash32(
          concat(lit("ab-"), col("user_id").cast("string"))) % 2)
    def armAgg(a: Int, e: org.apache.spark.sql.Column) =
      sum(when(col("arm") === a, e).otherwise(lit(0).cast("decimal(38,0)")))
    val stats = perUser.groupBy("event_type")
      .agg(
        armAgg(0, lit(1).cast("decimal(38,0)")).as("na"),
        armAgg(0, col("x")).as("sa"),
        armAgg(0, col("x") * col("x")).as("qa"),
        armAgg(1, lit(1).cast("decimal(38,0)")).as("nb"),
        armAgg(1, col("x")).as("sb"),
        armAgg(1, col("x") * col("x")).as("qb"))
    stats.select(col("event_type"),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      expr("CAST(sa div na AS BIGINT)").as("mean_a_cents"),
      expr("CAST(sb div nb AS BIGINT)").as("mean_b_cents"),
      expr(s"""CAST(CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE (
          CASE WHEN ((na * qa - sa * sa) div (na * (na - 1))) div na
                  + ((nb * qb - sb * sb) div (nb * (nb - 1))) div nb = 0
               THEN NULL
          ELSE ((sa div na - sb div nb) * (sa div na - sb div nb) * 1000000)
            div ( ((na * qa - sa * sa) div (na * (na - 1))) div na
                + ((nb * qb - sb * sb) div (nb * (nb - 1))) div nb )
          END) END AS BIGINT)""").as("t2_1e6"))
      .withColumn("significant",
        coalesce(col("t2_1e6") >= AbT2Bar1e6, lit(false)))
  }

  /** The shared q128 algebra, generated once for both engines (`d` is
    * the truncating integer-division operator: Spark `div`, DuckDB
    * `//` — measured identical on negatives, q121). Input columns:
    * per-arm joint moments `n{a,b}, sx*, sy*, sxx*, sxy*, syy*`.
    * Emits (expression, alias) pairs.
    *
    * The one-pass trick: the CUPED-adjusted metric per user is
    * `y″ = 10⁶·y − θ·x` with θ the TRUNCATED fixed-point slope — an
    * integer identity, so the adjusted arm moments expand EXACTLY
    * from the joint moments (`Σy″ = 10⁶·Sy − θ·Sx`,
    * `Σy″² = 10¹²·Syy − 2·10⁶·θ·Sxy + θ²·Sxx`) and no second pass
    * over users is needed.
    */
  private def cupedExprs(d: String): Seq[(String, String)] = {
    // Integral division that STAYS wide: Spark's `div` returns LONG
    // even on decimals, and this algebra's intermediate quotients
    // (arm variances of 10⁶-scaled metrics, ~10²⁰) overflow it —
    // caught live as a silent mod-2⁶⁴ wrap at sf0.01. Spark side uses
    // the exact remainder identity `(a − a % b) / b`: decimal `%`
    // truncates toward zero like DuckDB's `//`, `(a − r)` is exactly
    // divisible, and decimal division of an exact integer is lossless
    // at any result scale — so the value is the same truncating
    // division, in DECIMAL(38,0). DuckDB side keeps native HUGEINT
    // `//`.
    def idiv(a: String, b: String) =
      if (d == "div")
        s"CAST((($a) - (($a) % ($b))) / ($b) AS DECIMAL(38,0))"
      else s"CAST(($a) // ($b) AS HUGEINT)"
    val theta =
      s"""CASE WHEN ((na + nb) * (sxxa + sxxb) - (sxa + sxb) * (sxa + sxb)) = 0
         | THEN NULL
         | ELSE ${idiv(
        "((na + nb) * (sxya + sxyb) - (sxa + sxb) * (sya + syb)) * 1000000",
        "(na + nb) * (sxxa + sxxb) - (sxa + sxb) * (sxa + sxb)")}
         | END""".stripMargin
    // Welch t²·10⁶ from per-arm (n, S, Q) fragments
    def welch(sA: String, qA: String, sB: String, qB: String): String = {
      val varA = idiv(s"na * ($qA) - ($sA) * ($sA)", "na * (na - 1)")
      val varB = idiv(s"nb * ($qB) - ($sB) * ($sB)", "nb * (nb - 1)")
      val se2 = s"(${idiv(varA, "na")} + ${idiv(varB, "nb")})"
      val dm = s"(${idiv(sA, "na")} - ${idiv(sB, "nb")})"
      s"""CASE WHEN na < 2 OR nb < 2 THEN NULL
         | WHEN $se2 = 0 THEN NULL
         | ELSE ${idiv(s"$dm * $dm * 1000000", se2)} END""".stripMargin
    }
    val rawT2 = welch("1000000 * sya", "1000000000000 * syya",
      "1000000 * syb", "1000000000000 * syyb")
    def adjS(arm: String) = s"(1000000 * sy$arm - th * sx$arm)"
    def adjQ(arm: String) =
      s"(1000000000000 * syy$arm - 2000000 * th * sxy$arm + th * th * sxx$arm)"
    val cupedT2 =
      s"""CASE WHEN th IS NULL THEN NULL ELSE
         | ${welch(adjS("a"), adjQ("a"), adjS("b"), adjQ("b"))} END""".stripMargin
    Seq(theta -> "theta_1e6", rawT2 -> "t2_raw_1e6", cupedT2 -> "t2_cuped_1e6")
  }

  /** q128 — CUPED variance-reduced experiment readout: q126's Welch
    * comparison with each user's PRE-EXPOSURE activity regressed out
    * (Deng et al. 2013 — the standard industrial variance-reduction
    * device). Covariate x = the user's cents on even epoch-days,
    * metric y = cents on odd epoch-days (a deterministic pre/post
    * stand-in whose premise — per-user activity level drives both —
    * is exactly CUPED's); θ is the pooled regression slope in 10⁻⁶
    * fixed point, and the readout reports t²·10⁶ both raw and
    * adjusted. Every quantity derives from ONE conditional-agg pass
    * of 12 DECIMAL(38,0) joint moments per event type (see
    * [[cupedExprs]] for the exactness trick) with truncating division
    * only — the whole thing hash-gates cross-engine.
    *
    * Scale shape: one exchange to per-(type, user) x/y totals, one
    * conditional-aggregation exchange to the 12 moments, pure row
    * algebra after; adding CUPED to the q126 readout costs ZERO extra
    * passes over the data.
    */
  def q128(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (expr("unix_micros(ts) div 86400000000") % 2 === 0).as("pre"))
      .groupBy("event_type", "user_id")
      .agg(
        sum(when(col("pre"), col("cents")).otherwise(0L))
          .cast(dec).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L))
          .cast(dec).as("y"))
      .withColumn("arm",
        graft.functions.DedupFunctions.md5Hash32(
          concat(lit("ab-"), col("user_id").cast("string"))) % 2)
    cupedReadout(perUser)
  }

  /** The q128 readout over any (event_type, x DECIMAL(38,0),
    * y DECIMAL(38,0), arm) frame — factored so PropertySpec can replay
    * the generated algebra against an exact BigInt reference on
    * constructed units (negative thetas, degenerate arms, zero
    * variance included).
    */
  private[graft] def cupedReadout(perUser: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    def armAgg(a: Int, e: org.apache.spark.sql.Column) =
      sum(when(col("arm") === a, e).otherwise(lit(0).cast(dec)))
    def moments(a: Int, suffix: String) = Seq(
      armAgg(a, lit(1).cast(dec)).as(s"n$suffix"),
      armAgg(a, col("x")).as(s"sx$suffix"),
      armAgg(a, col("y")).as(s"sy$suffix"),
      armAgg(a, col("x") * col("x")).as(s"sxx$suffix"),
      armAgg(a, col("x") * col("y")).as(s"sxy$suffix"),
      armAgg(a, col("y") * col("y")).as(s"syy$suffix"))
    val ms = moments(0, "a") ++ moments(1, "b")
    val stats = perUser.groupBy("event_type").agg(ms.head, ms.tail: _*)
    val exprs = cupedExprs("div")
    stats
      .withColumn("th", expr(s"CAST((${exprs.head._1}) AS ${dec})"))
      .select(Seq(col("event_type"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("th").cast("long").as("theta_1e6")) ++
        exprs.tail.map { case (e, alias) =>
          expr(s"CAST(($e) AS BIGINT)").as(alias)
        }: _*)
  }

  /** Bits per dimension of the q134 Z-order key (2·[[ZBits]]-bit keys,
    * 1024×1024 grid) and the low-bit shift that coarsens keys into
    * layout cells (256 keys per cell) — shared with the oracle.
    */
  val ZBits = 10
  val ZCellShift = 8

  /** q134 — Z-ORDER LAYOUT KEYS + locality histogram: give every event
    * a Morton-interleaved key over (user bucket, day bucket) — the
    * SAME [[graft.sources.Lake.interleaveBits]] the z-clustered writer
    * sorts files by (day bits at odd positions, user bits at even) —
    * and roll the corpus up by coarse z-cell (key div
    * 2^[[ZCellShift]]), counting events and the distinct user/day
    * buckets each cell spans. This is the write-side data-layout
    * operator for a multi-dimensionally-queried lake, surfaced as a
    * query: `Lake.writeZOrdered` range-partitions files on this key so
    * file-level min/max stats prune BOTH per-user and per-day probes —
    * the space-filling-curve trade (each cell spans few user buckets
    * AND few day buckets, the histogram this query emits) that
    * single-key day-partitioning cannot make (LakeSpec measures the
    * per-file range tightness; the same technique lakehouse OPTIMIZE
    * ZORDER implements). 20 shifted-mask terms of pure integer column
    * math, exact on both engines.
    *
    * Scale shape: the key is a projection (no shuffle, whole-stage
    * codegen); the histogram is one partial-agg shuffle on z-cell.
    * At 100 TB the roll-up is diagnostics — the product is the key
    * column feeding the writer's range partitioner.
    */
  def q134(s: SparkSession, dir: String): DataFrame = {
    val grid = lit((1L << ZBits))
    val keyed = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(
        pmod(col("user_id"), grid).as("xb"),
        pmod(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long"), grid).as("yb"))
      .withColumn("zval",
        graft.sources.Lake.interleaveBits(col("yb"), col("xb"), ZBits))
    keyed
      .groupBy(expr(s"zval div ${1L << ZCellShift}").as("zcell"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("xb")).as("n_user_buckets"),
        countDistinct(col("yb")).as("n_day_buckets"),
        min(col("zval")).as("z_min"), max(col("zval")).as("z_max"))
  }

  /** q137 — EVENT-TYPE TRANSITION MATRIX (first-order Markov
    * estimate): per-user event streams in (ts, event_id) order, each
    * consecutive pair is one `from_type → to_type` transition; the
    * matrix holds transition counts, the from-state marginal, and the
    * row-normalized probability in 10⁻⁶ fixed point (floor division —
    * exact cross-engine; rows sum to ≤ 1.0 with the remainder being
    * quantization, never float noise). The behavioral-model primitive
    * under next-event prediction features, funnel hypothesis mining
    * (which q110 then tests as an ordered funnel), and anomaly
    * detection on broken flows (a transition whose probability
    * collapses between snapshots).
    *
    * Scale shape: ONE window pass partitioned by user (bounded
    * per-user state — the q42 sessionize shape, never an unpartitioned
    * window) feeding a types×types partial agg; the marginal join is
    * matrix-sized. (ts, event_id) ordering is collision-free at
    * microsecond grain in this lake — measured, all three SFs.
    */
  def q137(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromTot = trans.groupBy("from_type")
      .agg(sum(col("n_trans")).as("n_from"))
    trans.join(fromTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
        expr("(n_trans * 1000000) div n_from").as("p_1e6"))
  }

  /** q144 — FORWARD FILL (last observation carried forward): repair
    * null telemetry values with each user's most recent non-null
    * reading in (ts, event_id) order — the gap-repair transform every
    * sensor/telemetry ETL runs before feature extraction (the
    * reference's normalizer coalesces absent fields the same way,
    * row-at-a-time; `packagers/siri.py:70-80`). No arithmetic touches
    * the carried value — bytes pass through — so the frame hash-gates
    * trivially; rows before a user's first reading stay NULL (no
    * backfill — LOCF only, stated contract).
    *
    * Scale shape: ONE window pass partitioned by user (bounded
    * per-user state, the q137 anatomy); `last(value, ignoreNulls)`
    * over the running frame is O(1) per row.
    */
  /** The q144 core over any (event_id, user_id, ts, value) frame —
    * factored so StreamingSpec can pin the online imputer against the
    * batch expression on a null-injected corpus (the shipped lake has
    * no null values, so the fill path needs constructed gaps).
    */
  private[graft] def fillOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("filled_value", last(col("value"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        col("filled_value"),
        (col("value").isNull && col("filled_value").isNotNull).as("was_filled"))
  }

  def q144(s: SparkSession, dir: String): DataFrame =
    fillOf(t(s, dir, "events"))

  /** q145 — ROLLING 7-DAY ACTIVE USERS: per observed day, the distinct
    * users active that day (DAU), in the trailing 7-day window (WAU),
    * and the DAU/WAU stickiness ratio in 10⁻⁶ fixed point — the
    * engagement rollup every telemetry deployment maintains (and the
    * batch twin of q115's streaming KMV distinct-users monitor: exact
    * here, sketched there).
    *
    * Distinct-over-a-sliding-window does not compose as a window
    * function (COUNT(DISTINCT) OVER RANGE is unsupported everywhere
    * for good reason — the state is a set, not a scalar); the
    * scale-correct batch formulation is the ×W EXPANSION of the
    * per-day activity table: each (user, day) pair votes into the 7
    * windows that contain it (`explode(sequence(...))` — codegen'd),
    * then one distinct count per window day. The expansion is
    * W × |user-days| — activity-table-sized times a small constant,
    * never event-sized — and it shuffles once on the window day.
    * Trailing windows are emitted only for OBSERVED days (left-semi
    * against the day list), so the frame has no partial ghost days
    * after the data ends.
    */
  def q145(s: SparkSession, dir: String): DataFrame = {
    val au = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
      .materialize() // three consumers: days, DAU, the expansion
    val days = au.select(col("d")).distinct()
    val dau = au.groupBy("d").agg(countDistinct(col("user_id")).as("dau"))
    val wau = au
      .select(explode(expr("sequence(d, date_add(d, 6))")).as("wd"),
        col("user_id"))
      .join(days.withColumnRenamed("d", "wd"), Seq("wd"), "left_semi")
      .groupBy(col("wd").as("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("d"))
      .select(col("d").as("day"), col("dau"), col("wau"),
        expr("(dau * 1000000) div wau").as("stickiness_1e6"))
  }

  /** q146 — INTER-ARRIVAL GAP percentiles per event type: each event's
    * gap to the SAME USER's previous event (any type — the user's
    * activity clock), summarized as median/p90 seconds per arriving
    * type — the cadence profile behind session-gap tuning (q42's
    * 30-minute threshold stops being folklore when this table says
    * where the gap distribution's knee is), engagement monitoring,
    * and hazard-style churn features. Gaps are exact integer micros;
    * only the final percentile interpolation is float, rounded to the
    * engine-agreed 4 decimals (the q45 contract).
    *
    * Scale shape: one window pass partitioned by user (the q137/q144
    * anatomy), one partial-agg percentile per type — exact percentile
    * over per-type gap multisets, beside which q65's sketch path
    * stands for the quantile-at-scale trade (the q45/q65 gate pair).
    */
  def q146(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("prev_us", lag(col("tus"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_us", col("tus") - col("prev_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_us, array(0.5D, 0.9D))").as("p"))
      .select(col("event_type"), col("n_gaps"),
        round(element_at(col("p"), 1) / 1000000.0, 4).as("p50_gap_s"),
        round(element_at(col("p"), 2) / 1000000.0, 4).as("p90_gap_s"))
  }

  /** q158's interval hold: each event occupies [t, t + 5 min) — the
    * exclusive end is encoded in the sweep ordering (ends sort before
    * starts at the same instant). Shared with the oracle.
    */
  val ConcurrencyHoldUs = 300L * 1000000L

  /** q158 — PEAK CONCURRENCY per event type: treat each event as a
    * [t, t+5min) interval and find the maximum number simultaneously
    * open — the classic sweep-line statistic (server load peaks,
    * fleet occupancy, concurrent-session capacity planning). The
    * sweep is exact integers: ±1 deltas at `2·tus + {1,0}` sweep
    * keys (ends even, starts odd — exclusive-end tie order encoded
    * in the key), a running sum, and a max.
    *
    * Scale shape: the running sum is
    * [[graft.operators.SequencePacking]]'s two-pass distributed
    * prefix sum (its FOURTH consumer: shard packing, compaction
    * planning, the windowless Gini, now the sweep line) — a per-type
    * window would drag each type's entire sweep through one task;
    * the prefix sum keeps parallelism at the range-partition count.
    * Equal sweep keys (same-microsecond same-kind endpoints) permute
    * only WITHIN a tie group, and a tie group's running-sum multiset
    * is order-invariant, so max(cum) is deterministic even though
    * per-row cums under ties are not (why this query may share sweep
    * keys while the packing callers require unique order keys).
    */
  def q158(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"))
    val sweep = ev.select(col("event_type"),
        (col("tus") * 2L + 1L).as("ord"), lit(1L).as("delta"))
      .unionAll(ev.select(col("event_type"),
        ((col("tus") + ConcurrencyHoldUs) * 2L).as("ord"),
        lit(-1L).as("delta")))
    graft.operators.SequencePacking
      .withBins(sweep, Seq("event_type"), "ord", "delta", Long.MaxValue / 4)
      .groupBy("event_type")
      .agg(expr("count(1) div 2").as("n_events"),
        max(col("cum_tokens")).as("max_concurrent"))
  }

  /** q159 — TEMPORAL EVENT-TYPE CO-OCCURRENCE: which event types
    * happen in the SAME user-hour, with lift — q133's basket analysis
    * with (user, hour) as the basket and event types as the items:
    * the behavioral-affinity table ("errors co-occur with retries,
    * purchases with views") that complements q137's SEQUENTIAL
    * transitions with an order-free within-window view. Baskets hold
    * ≤ |event types| items by construction, so the within-basket
    * pairing needs no guard; all counts and the 10⁻⁶ lift are exact
    * integers.
    *
    * Scale shape: one distinct over (user-hour, type) — the activity
    * table; pair counts via ordered within-basket self-join bounded
    * by the type space; marginals and N ride the same distinct frame
    * (the q133 anatomy with a provably tiny basket). The basket key
    * is the COMPOSITE (user_id, hour), never a concatenated string:
    * the key exists only to group and join, and a composite of two
    * native columns shuffles ~2× fewer bytes through both exchanges
    * (distinct + self-join) and hashes/compares as longs instead of
    * ~30-char strings — with no numeric-range packing assumption a
    * 64-bit user space would break (r17 A/B in BASELINE.md).
    */
  def q159(s: SparkSession, dir: String): DataFrame = {
    val items = t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id").as("u"), date_trunc("HOUR", col("ts")).as("h"),
        col("event_type").as("p"))
      .distinct()
      .materialize() // three consumers: pairs, marginals, N
    val totals = items.agg(countDistinct(col("u"), col("h")).as("n_baskets"))
    val itemCnt = items.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val pairs = items.toDF("u", "h", "type_a")
      .join(items.toDF("u", "h", "type_b"), Seq("u", "h"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(itemCnt.toDF("type_a", "n_a"), Seq("type_a"))
      .join(itemCnt.toDF("type_b", "n_b"), Seq("type_b"))
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_baskets"),
        expr("(n_ab * n_baskets * 1000000) div (n_a * n_b)").as("lift_1e6"))
  }

  /** One skyline (Pareto-frontier) pruning pass: drop every row of
    * `df` dominated by another row in the same `parts` group —
    * A dominates B iff `A.x ≥ B.x ∧ A.y ≥ B.y` with at least one
    * strict. Two windows encode the exact rule: a row survives iff
    * its `y` strictly beats every strictly-greater-`x` row's best `y`
    * (RANGE frame to `-1` on the integer sort key ⇔ `x' > x`) and it
    * holds the max `y` within its own `x` (equal-(x,y) duplicates all
    * survive — neither dominates). Requires integer `x`, `y`.
    */
  private[graft] def skylinePrune(df: DataFrame, parts: Seq[String]): DataFrame = {
    val pc = parts.map(col)
    val byX = Window.partitionBy(pc: _*).orderBy(col("x").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy(pc :+ col("x"): _*)
    df.withColumn("mxy", max(col("y")).over(byX))
      .withColumn("mys", max(col("y")).over(sameX))
      .filter((col("mxy").isNull || col("mxy") < col("y")) &&
        col("mys") === col("y"))
      .drop("mxy", "mys")
  }

  /** q163 — SKYLINE (Pareto frontier) of users over (activity,
    * spend): the users no other user beats on BOTH event count and
    * total value — the multi-criteria shortlist operator (best
    * docs by quality×length, cheapest-fastest suppliers, frontier
    * model checkpoints) that no single ORDER BY can express. Spend is
    * exact integer cents (the q128 discipline) so dominance never
    * rides a float ulp.
    *
    * Scale shape: the classic two-phase distributed skyline — a
    * LOCAL prune inside each of 32 hash-salted partitions first
    * (dominance is transitive, so a locally-dominated row is
    * globally dominated: local pruning is lossless), then the exact
    * two-window pass over the ~|skyline|·32 survivors. The global
    * window is single-partition by construction but sees only the
    * pruned set (expected O(log n) skyline per partition for
    * independent dims), never the full aggregate table — the
    * difference between sorting 10M users in one task and sorting a
    * few hundred.
    */
  def q163(s: SparkSession, dir: String): DataFrame = {
    val users = t(s, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        coalesce(expr("sum(CAST(round(value * 100) AS BIGINT))"), lit(0L))
          .as("y"))
      .withColumn("salt", pmod(xxhash64(col("user_id")), lit(32)))
    val local = skylinePrune(users, Seq("salt"))
    skylinePrune(local, Seq.empty)
      .select(col("user_id"), col("x").as("n_events"),
        round(col("y").cast("double") / 100.0, 2).as("total_value"))
  }

  /** q164 — ROBUST OUTLIER COUNTS per event type via median/MAD: the
    * median, the median absolute deviation, and the count of values
    * beyond the conventional `3·1.4826·MAD` fence — the outlier
    * detector that (unlike q102's mean/stddev z-score) a single
    * 10⁹-valued corruption cannot recruit into hiding itself
    * (breakdown point ½ vs 0). Both medians are EXACT interpolated
    * percentiles (`percentile` ↔ DuckDB `quantile_cont`, the same
    * `(n−1)·p` definition — q45's proven pairing); the fence compare
    * runs on bit-identical doubles in both engines.
    *
    * Scale shape: two grouped exact-percentile passes plus a counting
    * pass, with the per-type medians BROADCAST back (group cardinality
    * = |event types|, never a shuffle). Exact grouped percentiles
    * buffer a group's values in the agg state — fine while a single
    * type fits one executor (q45's documented bound); beyond that,
    * q65's approx-percentile path is the same query with one line
    * swapped.
    */
  def q164(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withDev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("value") - col("med")))
    val mad = withDev.groupBy("event_type")
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(col("ad") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** q165's lookback: a touch converts only within 7 days. */
  val AttributionWindowUs = 7L * 86400L * 1000000L

  /** q165 — LAST-TOUCH ATTRIBUTION: credit each purchase to the most
    * recent prior click/view by the same user within
    * [[AttributionWindowUs]] — the marketing-attribution /
    * cause-assignment join ("which exposure preceded this
    * conversion") that is an AS-OF join from purchases into touches,
    * here expressed WITHOUT a join at all: one interleaved pass over
    * the merged stream carries the latest touch forward
    * (`last(..., ignoreNulls)` over rows strictly before — the (ts,
    * event_id) house order makes "prior" total), and purchases just
    * read it. Expired or absent touches attribute to 'none'; revenue
    * is exact cents.
    *
    * Scale shape: ONE shuffle by user and a linear sorted-window scan
    * — no purchase×touch fanout join, no per-purchase subquery; the
    * final rollup is |touch types|+1 rows. The asymmetric-cardinality
    * trap (hot users with thousands of touches) costs this plan
    * nothing beyond the sort it already does.
    */
  def q165(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("tus"))
    val ev = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"), col("value"))
      .select(col("*"), last(touch, ignoreNulls = true).over(w).as("t_ts"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w).as("t_type"))
    ev.filter(col("event_type") === "purchase")
      .groupBy(when(col("t_ts").isNotNull &&
          col("t_ts") >= col("tus") - lit(AttributionWindowUs), col("t_type"))
        .otherwise("none").as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(coalesce(expr("sum(CAST(round(value * 100) AS BIGINT))"),
          lit(0L)).cast("double") / 100.0, 2).as("total_value"))
  }

  /** q170's geometry: the path keeps a session's first [[PathLen]]
    * events; the report keeps the top [[PathTopK]] paths.
    */
  val PathLen = 5
  val PathTopK = 20

  /** q170 — TOP SESSION PATHS: the [[PathTopK]] most common event-type
    * sequences (first [[PathLen]] steps, `a>b>c`) across q42-style
    * gap sessions — the "how do users actually move" path-mining
    * table behind funnel DESIGN (q110 checks a funnel someone already
    * hypothesized; this surfaces the paths worth hypothesizing),
    * plus each path's exact share in 10⁻⁶. Path assembly is
    * order-pinned end to end: the in-session rank and the final
    * string both order by (micros, event_id), so the path is a pure
    * function of the data, not of partitioning.
    *
    * Scale shape: sessionization and ranking share ONE user_id
    * exchange (three window specs over the same sort); the path
    * rollup is a partial agg on path strings ≤ [[PathLen]] types
    * long, and the top-k is TakeOrdered over the path dictionary —
    * the corpus is never globally sorted.
    */
  def q170(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = SessionGapHours * 3600L * 1000000L
    val sessioned = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("new_s",
        when(lag("tus", 1).over(w).isNull ||
          col("tus") - lag("tus", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("new_s").over(run))
      .withColumn("rn", row_number().over(Window
        .partitionBy("user_id", "session_seq")
        .orderBy(col("tus"), col("event_id"))))
      .filter(col("rn") <= PathLen)
    val paths = sessioned
      .groupBy("user_id", "session_seq")
      .agg(expr("""array_join(transform(
          |  array_sort(collect_list(struct(tus, event_id, event_type))),
          |  x -> x.event_type), '>')""".stripMargin).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .materialize() // dictionary-sized; two consumers (total + top-k)
    val total = paths.agg(sum(col("n_sessions")).as("total"))
    paths.orderBy(col("n_sessions").desc, col("path").asc).limit(PathTopK)
      .crossJoin(broadcast(total))
      .select(col("path"), col("n_sessions"),
        expr("(n_sessions * 1000000) div total").as("share_1e6"))
  }

  /** q171's point-in-time split: features from strictly before
    * [[TrainCutoff]], the label from the [[LabelDays]]-day window at
    * and after it. Shared with the oracle.
    */
  val TrainCutoff = "2024-01-22 00:00:00"
  val LabelDays = 7

  /** q171 — LEAKAGE-SAFE TRAINING-SET ASSEMBLY: one row per user with
    * behavioral features computed ONLY from events strictly before
    * [[TrainCutoff]] and a purchase label from the [[LabelDays]]-day
    * window starting at it — the point-in-time-correct feature/label
    * extraction every churn/propensity model needs, where the
    * classic silent failure is a feature that peeks past the cutoff
    * (q92's split-leakage audit is the post-hoc check; this operator
    * is the constructive fix: the cutoff is IN the aggregation
    * predicates, so leakage is structurally impossible). Users with
    * no pre-cutoff history are excluded — they have no feature row to
    * train on. All features are exact integers (counts, cents, days).
    *
    * Scale shape: ONE scan and one partial-agg shuffle on user_id —
    * features and label are conditional aggregates over the same
    * pass, never a features⋈labels self-join.
    */
  def q171(s: SparkSession, dir: String): DataFrame = {
    val cut = lit(TrainCutoff).cast("timestamp")
    val labelEnd = expr(s"timestamp'$TrainCutoff' + INTERVAL $LabelDays DAYS")
    val pre = col("ts") < cut
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(
        sum(when(pre, 1L).otherwise(0L)).as("n_events"),
        sum(when(pre && col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        coalesce(sum(when(pre,
          expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L))
          .as("spend_cents"),
        countDistinct(when(pre, to_date(col("ts")))).as("active_days"),
        max(when(pre, to_date(col("ts")))).as("last_day"),
        max(when(col("ts") >= cut && col("ts") < labelEnd &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))
      .filter(col("n_events") > 0L)
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("spend_cents"), col("active_days"),
        datediff(lit(TrainCutoff).cast("date"), col("last_day"))
          .cast("long").as("recency_days"),
        col("label"))
  }

  /** q172's report size. */
  val GridTopK = 15

  /** q172 — SPATIAL GRID DENSITY with 3×3 kernel smoothing: bucket
    * the event cloud into 1°×1° cells (the q23 coordinate derivation),
    * smooth each cell by summing its 8-neighborhood, and report the
    * [[GridTopK]] densest smoothed cells — the hotspot detector
    * (demand heatmaps, anomaly geography, the reference's
    * stop-clustering) where raw per-cell counts flicker and a kernel
    * sum is stable. Cells are exact integer indices (`floor`), counts
    * exact longs; a cell with no events of its own can still win on
    * its neighborhood (left join, not inner).
    *
    * Scale shape: the events pass is ONE partial-agg rollup to the
    * bounded cell table (≤ 360·180 rows — geography is finite); the
    * 9× explode, neighbor sum, and ranking all run on that table, so
    * smoothing cost is independent of event volume. Top-k is
    * TakeOrdered.
    */
  def q172(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(
        ((col("event_id") % 360L) - 180L).as("cx"),
        expr("CAST(floor(value % 90.0) AS BIGINT)").as("cy"))
      .agg(count(lit(1)).as("n"))
      .materialize() // cell-table-sized; two consumers (own + 3x3)
    val spread = cells
      .select(col("cx"), col("cy"), col("n"),
        explode(expr("transform(sequence(0, 8), " +
          "k -> struct(k div 3 - 1 AS dx, k % 3 - 1 AS dy))")).as("o"))
      .groupBy((col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"))
      .agg(sum(col("n")).as("smoothed"))
    spread.join(cells.withColumnRenamed("n", "own"), Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"),
        coalesce(col("own"), lit(0L)).as("n_own"), col("smoothed"))
      .orderBy(col("smoothed").desc, col("cy").asc, col("cx").asc)
      .limit(GridTopK)
  }

  /** q173 — HOUR-OF-WEEK SEASONALITY PROFILE: per event type, the
    * 168-bucket hour-of-week histogram reduced to its peak (which
    * hour, how many events, and the peak-to-uniform concentration
    * ratio) — the load-shaping/seasonality card behind capacity
    * planning and anomaly baselines (q102 scores deviations from a
    * running mean; this says WHEN deviations are normal). The bucket
    * is pure integer arithmetic (`hours-since-epoch mod 168`), not a
    * calendar function — engines disagree on week-start conventions,
    * integers don't. Peak arbitration is exact: max count, then the
    * EARLIEST hour (min) on ties.
    *
    * Scale shape: one partial-agg rollup to ≤ |types|·168 profile
    * rows; the peak join and concentration math run on that profile,
    * broadcast-joined — event volume only ever crosses one exchange.
    */
  def q173(s: SparkSession, dir: String): DataFrame = {
    val prof = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 3600000000) % 168").as("how"))
      .agg(count(lit(1)).as("n"))
      .materialize() // profile-sized; two consumers (totals + peak)
    val tot = prof.groupBy("event_type")
      .agg(sum(col("n")).as("n_total"), count(lit(1)).as("n_hours"),
        max(col("n")).as("peak_n"))
    prof.join(broadcast(tot), Seq("event_type"))
      .filter(col("n") === col("peak_n"))
      .groupBy("event_type")
      .agg(max(col("n_total")).as("n_total"), max(col("n_hours")).as("n_hours"),
        min(col("how")).as("peak_how"), max(col("peak_n")).as("peak_n"))
      .withColumn("concentration_1e6",
        expr("(peak_n * 168 * 1000000) div n_total"))
  }

  /** q176's smoothing memory: only the trailing [[EwmaWindowDays]]
    * days contribute (the 2⁻ᵏ tail beyond is sub-integer anyway).
    */
  val EwmaWindowDays = 20

  /** q176 — EWMA FORECAST BACKTEST: per event type, smooth the daily
    * count series with a half-life-one-day decayed sum (q142's exact
    * bit-shift decay: `D_t = Σ x_i >> (t−i)` over the trailing
    * [[EwmaWindowDays]] days — weights sum to ~2, so `D_t div 2` is
    * tomorrow's forecast) and score it against what actually happened
    * — the capacity-forecast primitive plus its OWN honesty check
    * (mean absolute error, in 10⁻² events), in pure integer
    * arithmetic end to end. Backtest pairs need both days present in
    * the rollup; a truly empty day would need a calendar spine —
    * out of scope here and absent in this lake.
    *
    * Scale shape: events collapse to the (type, day) rollup in one
    * partial-agg pass; the banded self-join, decay shifts, and error
    * rollup all run on that ≤ |types|·days table.
    */
  def q176(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("x"))
      .materialize() // rollup-sized; three consumers below
    val ewma = daily.toDF("event_type", "t", "xt")
      .join(daily.toDF("event_type", "i", "xi"), Seq("event_type"))
      .filter(col("i") <= col("t") &&
        col("i") > col("t") - EwmaWindowDays)
      .groupBy("event_type", "t")
      .agg(sum(expr("shiftright(xi, CAST(t - i AS INT))")).as("ewma"))
    ewma
      .join(daily.toDF("event_type", "d", "actual")
          .withColumn("t", col("d") - 1L),
        Seq("event_type", "t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_backtest"),
        sum(col("actual")).as("n_events_scored"),
        expr("CAST(sum(abs(actual - ewma div 2)) * 100 AS BIGINT) " +
          "div count(1)").as("mae_1e2"))
  }

  /** q177's order-statistic ranks: exact type-1 quantiles (the
    * ⌈p·n⌉-th smallest) — no interpolated float crosses engines.
    * `d` is the engine's integer-division spelling (`div` / `//`).
    */
  def q177Rank(p: Int, n: String, d: String = "div"): String =
    s"($p * $n + 99) $d 100"

  /** q177 — FUNNEL STAGE LATENCY: how long converting users take
    * between funnel steps (view→click, click→purchase) — the p50/p90
    * time-to-convert card that turns q110's WHO-converts table into
    * WHEN (SLA budgets, abandonment-window sizing, re-marketing
    * timing). Latencies are exact micros from q110's own step
    * timestamps; quantiles are exact order statistics at ⌈p·n⌉
    * ([[q177Rank]]), so the whole card is integers.
    *
    * Scale shape: everything downstream of q110's single user
    * exchange runs on the per-user funnel table (one row per
    * converting user); the rank windows partition by stage over that
    * table, never over events.
    */
  def q177(s: SparkSession, dir: String): DataFrame = {
    val f = q110(s, dir).materialize() // funnel-table-sized; 2 stages
    def stage(name: String, a: String, b: String): DataFrame =
      f.filter(col(a).isNotNull && col(b).isNotNull)
        .select(lit(name).as("stage"), col("user_id"),
          (col(b) - col(a)).as("d_us"))
    val d = stage("view>click", "t_view", "t_click")
      .unionAll(stage("click>purchase", "t_click", "t_purchase"))
    d.withColumn("rn", row_number().over(Window.partitionBy("stage")
        .orderBy(col("d_us"), col("user_id"))))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("stage")))
      .groupBy("stage")
      .agg(max(col("nn")).as("n"),
        min(col("d_us")).as("min_us"),
        min(when(expr(s"rn = ${q177Rank(50, "nn")}"), col("d_us")))
          .as("p50_us"),
        min(when(expr(s"rn = ${q177Rank(90, "nn")}"), col("d_us")))
          .as("p90_us"),
        max(col("d_us")).as("max_us"))
  }

  /** q179's quantile granularity (quintiles, the RFM convention). */
  val RfmQ = 5

  /** q179 — RFM SEGMENTATION: every user scored on Recency (days
    * since last event, bucket 1 = most recent), Frequency (event
    * count), and Monetary (whole-dollar spend), each quintiled
    * independently, then rolled up to segment populations — the
    * classic customer-base segmentation grid ("champions" = R1F5M5,
    * "at-risk big spenders" = R5F*M5…). All three quantile cuts use
    * q62's SORT-FREE integer histogram-rank thresholds: R/F/M are
    * small-cardinality integers, so each cut is a value-histogram
    * partial agg plus a four-value threshold row — `ntile()` would
    * globally sort the user base three times for the same answer.
    *
    * Scale shape: one corpus pass to the per-user RFM rollup
    * (checkpointed); three histogram passes over THAT table; the
    * three broadcast threshold rows assign buckets in one projection;
    * the segment rollup is ≤ 5³ rows.
    */
  def q179(s: SparkSession, dir: String): DataFrame = {
    val rfm = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(datediff(lit(NowLit.take(10)).cast("date"),
          max(to_date(col("ts")))).cast("long").as("r"),
        count(lit(1)).as("f"),
        expr("coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) div 100")
          .as("m"))
      .materialize() // user-table-sized; 3 histograms + assignment
    def thr(cn: String): DataFrame = {
      val cum = rfm.groupBy(col(cn).as("v")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      val cols = (1 until RfmQ).map { k =>
        min(when(col("cum") >= expr(s"($k * n + ${RfmQ - 1}) div $RfmQ"),
          col("v"))).as(s"${cn}_t$k")
      }
      cum.agg(cols.head, cols.tail: _*)
    }
    def bucket(cn: String): Column =
      (lit(1L) + (1 until RfmQ)
        .map(k => (col(cn) > col(s"${cn}_t$k")).cast("long"))
        .reduce(_ + _)).as(s"${cn}_q")
    rfm.crossJoin(broadcast(thr("r")))
      .crossJoin(broadcast(thr("f")))
      .crossJoin(broadcast(thr("m")))
      .select(col("user_id"), col("m"), bucket("r"), bucket("f"),
        bucket("m"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"), sum(col("m")).as("m_total"))
  }

  /** q181's trigger: fire when an hour runs at ≥ 3.00× its type's
    * trailing-24h hourly rate (integer cross-multiplied compare).
    */
  val BurstFactor1e2 = 300L
  val BurstBaselineHours = 24L

  /** q181 — BURST DETECTION: hours where an event type runs at
    * ≥ [[BurstFactor1e2]]/100× its own trailing-24-hour rate — the
    * incident/virality trigger (error storms, flash crowds) that
    * complements q173's WHERE-peaks-normally-are with
    * WHEN-did-we-leave-normal, and q102's per-user z-score with a
    * population-level rate alarm. The compare is integer
    * cross-multiplication (`n·24·100 ≥ trailing·300`) — no rate
    * division until the reported ratio, and that is a floored 10⁻²
    * integer. The trailing window is a RANGE frame on the integer
    * epoch-hour, so silent hours correctly SHRINK the baseline
    * (a gap then a spike alarms — rows-frames would smear history).
    *
    * Scale shape: events collapse to the (type, hour) rollup in one
    * partial-agg pass; the window runs per type over ≤ 24·365 rows a
    * year; output is alarm rows only.
    */
  def q181(s: SparkSession, dir: String): DataFrame =
    burstsOf(t(s, dir, "events"))

  /** q181 over any event frame — shared with the streaming monitor's
    * equality pin (the `fillOf` discipline).
    */
  private[graft] def burstsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("h"))
      .rangeBetween(-BurstBaselineHours, -1)
    events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("trailing24", sum(col("n")).over(w))
      .filter(col("trailing24").isNotNull && col("trailing24") > 0L &&
        col("n") * BurstBaselineHours * 100L >=
          col("trailing24") * BurstFactor1e2)
      .select(col("event_type"),
        expr("timestamp_micros(h * 3600000000)").as("hour_ts"),
        col("n"), col("trailing24"),
        expr(s"(n * $BurstBaselineHours * 100) div trailing24")
          .as("ratio_1e2"))
  }

  /** q187 — TIME-WEIGHTED AVERAGE VALUE (TWAP) per user: each
    * observation holds until the next one, so its weight is the
    * interval it was live — the duration-weighted mean (sensor
    * readings, position marks, price marks) that a count-weighted
    * `avg` silently mis-states whenever sampling is irregular (one
    * spike sampled densely would dominate `avg`; TWAP weights it by
    * how long it actually held). Exact integers: cents × micros
    * accumulates in DECIMAL(38,0) (cᵢ·Δtᵢ at a month's span brushes
    * 2⁶³ — the q157 cast-before-multiply lesson), one integer
    * division at the end. Users with one event have no held interval
    * and drop.
    *
    * Scale shape: one user-sorted window (lead) and one partial-agg
    * rollup — the same single exchange the sessionizer pays.
    */
  def q187(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dur", lead(col("tus"), 1).over(w) - col("tus"))
      .filter(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur")).as("span_us"),
        expr(s"CAST(sum(CAST(cents AS $dec) * CAST(dur AS $dec)) " +
          s"div sum(CAST(dur AS $dec)) AS BIGINT)").as("twap_cents"))
  }

  /** q188's CUSUM geometry: per-type reference rate from the first
    * [[CusumRefDays]] days, slack at [[CusumSlackPct]]% of it, alarm
    * threshold at [[CusumThreshPct]]% of it (all 10⁻² fixed point).
    */
  val CusumRefDays = 7L
  val CusumSlackPct = 10L
  val CusumThreshPct = 300L

  /** q188 — CUSUM CHANGE-POINT DETECTION on daily volume: the classic
    * one-sided CUSUM `S_t = max(0, S_{t−1} + (x_t − k))` looks like an
    * inherently sequential recurrence — but it has a CLOSED windowed
    * form, `S_t = P_t − min_{j≤t} P_j` over the prefix sums of
    * `x_t − k`, so the whole detector is two stacked window functions
    * (prefix sum + running min) on the daily rollup: the q169 lesson
    * again (find the bounded/windowed identity, don't carry state).
    * The reference rate k is each type's first-[[CusumRefDays]] mean
    * plus [[CusumSlackPct]]% slack (both 10⁻² fixed point — exact
    * integers end to end); alarms fire where the accumulated excess
    * S_t clears [[CusumThreshPct]]% of the reference — a sustained
    * drift detector, where q181's burst trigger needs one loud hour.
    *
    * Scale shape: one partial-agg pass to the (type, day) rollup;
    * both windows share one per-type sort over ≤ 365 rows a year.
    */
  def q188(s: SparkSession, dir: String): DataFrame =
    cusumOf(t(s, dir, "events"))

  /** q188 over any event frame — the spec's planted-drift test shares
    * the exact definition (the `burstsOf` discipline).
    */
  private[graft] def cusumOf(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("x"))
      .materialize() // rollup-sized; reference + detector passes
    val ref = daily
      .withColumn("d0", min(col("d")).over(Window.partitionBy("event_type")))
      .filter(col("d") < col("d0") + CusumRefDays)
      .groupBy("event_type")
      .agg(expr(s"(sum(x) * 100) div $CusumRefDays").as("k_1e2"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(ref), Seq("event_type"))
      .withColumn("p", sum(expr(
        s"x * 100 - (k_1e2 + (k_1e2 * $CusumSlackPct) div 100)")).over(w))
      // the identity's min ranges over P_0 = 0 too: least(0, min P_j)
      .withColumn("s_1e2",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .withColumn("alarm", col("s_1e2") >
        expr(s"(k_1e2 * $CusumThreshPct) div 100"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), max(col("k_1e2")).as("k_1e2"),
        max(col("s_1e2")).as("max_s_1e2"),
        min(when(col("alarm"),
          expr("timestamp_micros(d * 86400000000)"))).as("first_alarm_ts"),
        max(col("alarm")).as("drifted"))
  }

  /** q189's alarm bar: χ² (1 df) at α=0.001 in 10⁻⁶ fixed point —
    * SRM checks run strict because assignment bugs corrupt EVERY
    * downstream readout.
    */
  val SrmChi2Bar1e6 = 10828000L

  /** q189 — SAMPLE-RATIO-MISMATCH guardrail for the experimentation
    * stack: the q126/q128 readouts assume the `md5('ab-'++user)` coin
    * actually lands 50/50 — a biased assignment (bucketing bug,
    * filtered arm, bot skew) silently poisons both, and the SRM χ²
    * is the standard tripwire (1 df, α=0.001 ⇒ χ² > 10.828). The
    * statistic on an even split reduces to `(nₐ−n_b)²/(nₐ+n_b)`,
    * computed in exact integers and quantized to 10⁻⁶ (the q136
    * discipline); one row per experiment population (event type).
    *
    * Scale shape: one partial-agg pass to per-(type, user) rows —
    * reused from the arm hash — then a |types|-row card; the arm
    * count shuffle carries two longs per type per partition.
    */
  def q189(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .withColumn("arm", graft.functions.DedupFunctions.md5Hash32(
        concat(lit("ab-"), col("user_id").cast("string"))) % 2)
      .groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)")
          .as("chi2_1e6"))
      .withColumn("srm_alarm", col("chi2_1e6") > SrmChi2Bar1e6)
  }

  /** q194 — GROWTH ACCOUNTING: the weekly new / retained /
    * resurrected / churned user ledger (the standard MAU-accounting
    * identity: `churnedₜ = activeₜ₋₁ − retainedₜ`) that explains
    * WHERE an active-user curve's movement comes from — q111's
    * cohort grid shows decay per acquisition vintage; this shows the
    * flow balance per calendar week. Per-user classification is one
    * lag over that user's active weeks (new = first week, retained =
    * active the week before, resurrected = returned after a gap);
    * the churn column closes the identity from the PREVIOUS week's
    * card row. Weeks are integer epoch-weeks. Lag semantics assume a
    * calendar-dense lake (every week present corpus-wide — true
    * here); a sparse deployment adds a week spine, not new logic.
    *
    * Scale shape: one distinct rollup to (user, week), one user-
    * ordered lag window over it, a per-week partial agg, and a
    * |weeks|-row window for the identity — events cross one exchange.
    */
  def q194(s: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy("w")
    val weekly = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("w"))
      .distinct()
      .withColumn("first_w", min(col("w")).over(Window.partitionBy("user_id")))
      .withColumn("prev_w", lag(col("w"), 1).over(wUser))
      .select(col("w"),
        (col("w") === col("first_w")).as("is_new"),
        (col("prev_w") === col("w") - 1L).as("is_retained"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        coalesce(sum(when(col("is_retained"), 1L)), lit(0L))
          .as("n_retained"),
        sum(when(!col("is_new") && !coalesce(col("is_retained"),
          lit(false)), 1L).otherwise(0L)).as("n_resurrected"))
    weekly
      .withColumn("n_churned",
        lag(col("n_active"), 1).over(Window.orderBy("w")) -
          col("n_retained"))
      .select(expr("timestamp_micros(w * 604800000000)").as("week_ts"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"))
  }

  /** q195's interior-window width: residuals only where the full
    * ±3-day centered window exists.
    */
  val SeasonalMaDays = 7L

  /** q195 — SEASONALITY STRENGTH: how much of each type's daily
    * volume variance a centered 7-day moving average explains —
    * `1 − Var(residual)/Var(raw)` over interior days, the classic
    * STL-style decomposition statistic that says whether q173's
    * weekly profile is signal or wishful thinking. Exact to the end:
    * the residual is SCALED BY 7 (`r = 7x − Σ±3 x`) so no moving-
    * average division ever happens, variances are the integer
    * `n·Σx² − (Σx)²` form (the q121/q126 moment discipline), and the
    * single signed ratio rounds half-away in double (q183 rule —
    * strength goes NEGATIVE when the "trend" fits worse than the
    * mean, and that is a finding, not an error).
    *
    * Scale shape: one partial-agg rollup to daily counts; one
    * per-type RANGE window (full-window days only); a |types|-row
    * card.
    */
  def q195(s: SparkSession, dir: String): DataFrame = {
    val half = (SeasonalMaDays - 1) / 2
    val wMa = Window.partitionBy("event_type").orderBy("d")
      .rangeBetween(-half, half)
    t(s, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("nw", count(lit(1)).over(wMa))
      .withColumn("s7", sum(col("x")).over(wMa))
      .filter(col("nw") === SeasonalMaDays) // interior days only
      .withColumn("r", lit(SeasonalMaDays) * col("x") - col("s7"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"))
      .select(col("event_type"), col("n_days"),
        when(col("n_days") * col("sxx") - col("sx") * col("sx") =!= 0L,
          expr(s"""CAST(round((1.0 -
                 |  CAST(n_days * srr - sr * sr AS DOUBLE) /
                 |  (${SeasonalMaDays * SeasonalMaDays} *
                 |   (n_days * sxx - sx * sx))) * 1000000, 0)
                 | AS BIGINT)""".stripMargin)).as("strength_1e6"))
  }

  /** q198 — LINEAR MULTI-TOUCH ATTRIBUTION: where q165 gives the last
    * touch everything, this splits each purchase's credit EQUALLY
    * over every click/view in its [[AttributionWindowUs]] lookback —
    * the other canonical attribution model, and the one that needs
    * real purchase×touch pairs (multi-touch IS pairwise; q165's
    * window trick cannot see more than one predecessor). Credit is
    * integer: each of a purchase's n touches gets `10⁶ div n` (the
    * ≤ n−1 micro-units lost to flooring are the documented price of
    * exactness). The per-purchase touch count comes from a RANGE
    * window BEFORE the join, so the join carries no aggregation —
    * only bounded fan-out: a user's touches within one lookback
    * window.
    *
    * Scale shape: one user-partitioned RANGE window for the counts;
    * one banded self-join whose fan-out is (touches in window) per
    * purchase — the honest cost of the model, bounded by per-user
    * activity rate × window, never corpus².
    */
  def q198(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"))
      .materialize() // window pass + both join sides
    val w = Window.partitionBy("user_id").orderBy("tus")
      .rangeBetween(-AttributionWindowUs, -1)
    val purchases = ev
      .withColumn("n_touch", sum(when(col("event_type") =!= "purchase", 1L)
        .otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase" && col("n_touch") > 0L)
      .select(col("user_id"), col("tus").as("ptus"), col("n_touch"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("tus").as("ttus"),
        col("event_type").as("touch_type"))
    purchases.join(touches, Seq("user_id"))
      .filter(col("ttus") >= col("ptus") - AttributionWindowUs &&
        col("ttus") < col("ptus"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("1000000 div n_touch")).as("credit_1e6"))
  }

  /** q199's density floor: a cell participates in clustering only
    * with at least this many events (DBSCAN's minPts, grid form).
    */
  val GridDenseMin = 10L

  /** q199 — SPATIAL HOTSPOT CLUSTERS (grid DBSCAN): q172 ranks
    * individual smoothed cells; this CONNECTS them — dense cells
    * (≥ [[GridDenseMin]] events) that touch in the 8-neighborhood
    * merge into hotspot regions via
    * [[graft.operators.ConnectedComponents]] (its seventh consumer),
    * the grid formulation of DBSCAN that replaces the ε-neighbor
    * search with cell adjacency and therefore scales as the CELL
    * table, not the point cloud. Output is per-region: cell count,
    * event mass, and the bounding box — the region label itself is
    * engine-internal (min cell id here, min id in the oracle's
    * recursive replay — identical SETS) and is dropped.
    *
    * Scale shape: the event cloud collapses to the bounded cell
    * table in one rollup; adjacency, CC, and the region rollup all
    * run on ≤ 360·180 cells regardless of event volume.
    */
  def q199(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(((col("event_id") % 360L) - 180L).as("cx"),
        expr("CAST(floor(value % 90.0) AS BIGINT)").as("cy"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= GridDenseMin)
      .withColumn("cell", (col("cx") + 180L) * 1000L + col("cy") + 90L)
      .materialize() // bounded cell table; adjacency + labeling
    val edges = cells.select(col("cell"), col("cx"), col("cy"))
      .withColumn("o", explode(expr(
        "transform(sequence(0, 8), k -> " +
          "struct(k div 3 - 1 AS dx, k % 3 - 1 AS dy))")))
      .filter(!(col("o.dx") === 0 && col("o.dy") === 0))
      .select(col("cell"),
        ((col("cx") + col("o.dx") + 180L) * 1000L +
          col("cy") + col("o.dy") + 90L).as("nbr"))
      .join(cells.select(col("cell").as("nbr")), Seq("nbr"))
      .filter(col("cell") < col("nbr"))
    val comp = graft.operators.ConnectedComponents.run(edges, "cell", "nbr")
    cells.join(comp.withColumnRenamed("v", "cell"), Seq("cell"), "left")
      .withColumn("comp", coalesce(col("comp"), col("cell")))
      .groupBy("comp")
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_events"),
        min(col("cx")).as("min_cx"), min(col("cy")).as("min_cy"),
        max(col("cx")).as("max_cx"), max(col("cy")).as("max_cy"))
      .drop("comp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_hotspot_clusters" -> (q199 _),
    "q198_linear_attribution" -> (q198 _),
    "q195_seasonal_strength" -> (q195 _),
    "q194_growth_accounting" -> (q194 _),
    "q189_srm_guardrail" -> (q189 _),
    "q188_cusum_changepoint" -> (q188 _),
    "q187_twap" -> (q187 _),
    "q181_burst_detection" -> (q181 _),
    "q179_rfm_segments" -> (q179 _),
    "q177_funnel_latency" -> (q177 _),
    "q176_ewma_forecast" -> (q176 _),
    "q173_hour_profile" -> (q173 _),
    "q172_grid_density" -> (q172 _),
    "q171_train_assembly" -> (q171 _),
    "q170_session_paths" -> (q170 _),
    "q165_attribution" -> (q165 _),
    "q164_mad_outliers" -> (q164 _),
    "q163_skyline" -> (q163 _),
    "q159_type_cooccurrence" -> (q159 _),
    "q158_peak_concurrency" -> (q158 _),
    "q146_interarrival" -> (q146 _),
    "q145_rolling_wau" -> (q145 _),
    "q144_forward_fill" -> (q144 _),
    "q137_event_transitions" -> (q137 _),
    "q134_zorder" -> (q134 _),
    "q128_cuped" -> (q128 _),
    "q126_ab_welch" -> (q126 _),
    "q111_cohort_retention" -> (q111 _),
    "q110_funnel" -> (q110 _),
    "q10_first_last_per_group" -> (q10 _),
    "q11_duration_watermark" -> (q11 _),
    "q12_band_join_nearest" -> (q12 _),
    "q19_hourly_stats" -> (q19 _),
    "q23_bbox_filter" -> (q23 _),
    "q22_argmin_nearest" -> (q22 _),
    "q24_interval_arith" -> (q24 _),
    "q25_tz_convert" -> (q25 _),
    "q26_partition_paths" -> (q26 _),
    "q27_json_extract" -> (q27 _),
    "q39_running_window" -> (q39 _),
    "q42_sessionize" -> (q42 _),
    "q47_asof_join" -> (q47 _),
    "q102_running_anomaly" -> (q102 _),
    "q105_rolling_features" -> (q105 _))

  private def q128OracleSql: String = {
    val exprs = cupedExprs("//")
    s"""WITH pu AS (
       | SELECT event_type, user_id,
       |  CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000) % 2 = 0
       |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
       |  CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000) % 2 <> 0
       |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS y,
       |  CAST(concat('0x', substr(md5(concat('ab-',
       |    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2 AS arm
       | FROM events
       | WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
       | GROUP BY event_type, user_id),
       |st AS (
       | SELECT event_type,
       |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
       |  sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sxa,
       |  sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sya,
       |  sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS sxxa,
       |  sum(CASE WHEN arm = 0 THEN x * y ELSE 0 END) AS sxya,
       |  sum(CASE WHEN arm = 0 THEN y * y ELSE 0 END) AS syya,
       |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
       |  sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sxb,
       |  sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS syb,
       |  sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS sxxb,
       |  sum(CASE WHEN arm = 1 THEN x * y ELSE 0 END) AS sxyb,
       |  sum(CASE WHEN arm = 1 THEN y * y ELSE 0 END) AS syyb
       | FROM pu GROUP BY 1),
       |tht AS (
       | SELECT *, CAST((${exprs.head._1}) AS HUGEINT) AS th FROM st)
       |SELECT event_type,
       | CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       | CAST(th AS BIGINT) AS theta_1e6,
       | CAST((${exprs(1)._1}) AS BIGINT) AS ${exprs(1)._2},
       | CAST((${exprs(2)._1}) AS BIGINT) AS ${exprs(2)._2}
       |FROM tht""".stripMargin
  }

  private def q134OracleSql: String = {
    val terms = (0 until ZBits).map { b =>
      s"(((xb >> $b) & 1) << ${2 * b}) + (((yb >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")
    s"""WITH e AS (
       | SELECT user_id % ${1L << ZBits} AS xb,
       |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % ${1L << ZBits} AS yb
       | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |z AS (SELECT xb, yb, ($terms) AS zval FROM e)
       |SELECT CAST(zval // ${1L << ZCellShift} AS BIGINT) AS zcell,
       | CAST(count(*) AS BIGINT) AS n_events,
       | CAST(count(DISTINCT xb) AS BIGINT) AS n_user_buckets,
       | CAST(count(DISTINCT yb) AS BIGINT) AS n_day_buckets,
       | CAST(min(zval) AS BIGINT) AS z_min,
       | CAST(max(zval) AS BIGINT) AS z_max
       |FROM z GROUP BY 1""".stripMargin
  }

  /** q110's oracle (the chained min-agg funnel replay) as a def so
    * q177's latency oracle can inline it as a CTE.
    */
  private def q110OracleSql: String = {
    val Seq(s1, s2, s3) = FunnelSteps
    s"""WITH ev AS (
       | SELECT user_id, event_type, epoch_us(ts) AS tus
       | FROM events
       | WHERE ts IS NOT NULL AND event_type IN ('$s1', '$s2', '$s3')),
       |f1 AS (SELECT user_id, min(tus) AS t1 FROM ev
       |       WHERE event_type = '$s1' GROUP BY 1),
       |f2 AS (SELECT e.user_id, min(e.tus) AS t2 FROM ev e
       |       JOIN f1 USING (user_id)
       |       WHERE e.event_type = '$s2' AND e.tus > f1.t1 GROUP BY 1),
       |f3 AS (SELECT e.user_id, min(e.tus) AS t3 FROM ev e
       |       JOIN f2 USING (user_id)
       |       WHERE e.event_type = '$s3' AND e.tus > f2.t2 GROUP BY 1),
       |u AS (SELECT DISTINCT user_id FROM ev)
       |SELECT u.user_id,
       | CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
       |      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |   AS steps_completed,
       | f1.t1 AS t_view, f2.t2 AS t_click, f3.t3 AS t_purchase
       |FROM u LEFT JOIN f1 USING (user_id) LEFT JOIN f2 USING (user_id)
       | LEFT JOIN f3 USING (user_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q199_hotspot_clusters" ->
      s"""WITH RECURSIVE cells AS (
        | SELECT (event_id % 360) - 180 AS cx,
        |  CAST(floor(value % 90.0) AS BIGINT) AS cy,
        |  CAST(count(*) AS BIGINT) AS n,
        |  ((event_id % 360) - 180 + 180) * 1000
        |    + CAST(floor(value % 90.0) AS BIGINT) + 90 AS cell
        | FROM events WHERE value IS NOT NULL
        | GROUP BY 1, 2, 4 HAVING count(*) >= $GridDenseMin),
        |adj AS (
        | SELECT c.cell AS a, ((c.cx + dx.v + 180) * 1000
        |   + c.cy + dy.v + 90) AS b
        | FROM cells c
        |  CROSS JOIN unnest([-1, 0, 1]) AS dx(v)
        |  CROSS JOIN unnest([-1, 0, 1]) AS dy(v)
        | WHERE NOT (dx.v = 0 AND dy.v = 0)),
        |e AS (
        | SELECT a, b FROM adj JOIN cells n ON adj.b = n.cell
        | UNION
        | SELECT adj.b, adj.a FROM adj JOIN cells n ON adj.b = n.cell),
        |reach AS (
        | SELECT a AS v, a AS r FROM e
        | UNION
        | SELECT e.a, re.r FROM e JOIN reach re ON e.b = re.v),
        |comp AS (SELECT v, min(r) AS comp FROM reach GROUP BY v),
        |lab AS (
        | SELECT c.*, coalesce(cp.comp, c.cell) AS comp
        | FROM cells c LEFT JOIN comp cp ON c.cell = cp.v)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        | CAST(sum(n) AS BIGINT) AS n_events,
        | CAST(min(cx) AS BIGINT) AS min_cx, CAST(min(cy) AS BIGINT) AS min_cy,
        | CAST(max(cx) AS BIGINT) AS max_cx, CAST(max(cy) AS BIGINT) AS max_cy
        |FROM lab GROUP BY comp""".stripMargin,
    "q198_linear_attribution" ->
      s"""WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND event_type IN ('click', 'view', 'purchase')),
        |p AS (
        | SELECT user_id, tus AS ptus, n_touch FROM (
        |  SELECT *, CAST(coalesce(sum(CASE WHEN event_type <> 'purchase'
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY tus
        |    RANGE BETWEEN $AttributionWindowUs PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS n_touch
        |  FROM ev)
        | WHERE event_type = 'purchase' AND n_touch > 0),
        |tt AS (
        | SELECT user_id, tus AS ttus, event_type AS touch_type
        | FROM ev WHERE event_type <> 'purchase')
        |SELECT tt.touch_type, CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST(sum(1000000 // p.n_touch) AS BIGINT) AS credit_1e6
        |FROM p JOIN tt ON p.user_id = tt.user_id
        | AND tt.ttus >= p.ptus - $AttributionWindowUs
        | AND tt.ttus < p.ptus
        |GROUP BY 1""".stripMargin,
    "q194_growth_accounting" ->
      """WITH uw AS (
        | SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
        | FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |cls AS (
        | SELECT w,
        |  w = min(w) OVER (PARTITION BY user_id) AS is_new,
        |  lag(w) OVER (PARTITION BY user_id ORDER BY w) = w - 1
        |    AS is_retained
        | FROM uw),
        |card AS (
        | SELECT w, CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(coalesce(sum(CASE WHEN is_retained THEN 1 END), 0)
        |    AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN NOT is_new
        |    AND NOT coalesce(is_retained, false) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_resurrected
        | FROM cls GROUP BY 1)
        |SELECT make_timestamp(w * 604800000000) AS week_ts,
        | n_active, n_new, n_retained, n_resurrected,
        | CAST(lag(n_active) OVER (ORDER BY w) - n_retained AS BIGINT)
        |   AS n_churned
        |FROM card""".stripMargin,
    "q195_seasonal_strength" -> {
      val half = (SeasonalMaDays - 1) / 2
      s"""WITH daily AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |ma AS (
        | SELECT *,
        |  CAST(count(*) OVER win AS BIGINT) AS nw,
        |  CAST(sum(x) OVER win AS BIGINT) AS s7
        | FROM daily
        | WINDOW win AS (PARTITION BY event_type ORDER BY d
        |   RANGE BETWEEN $half PRECEDING AND $half FOLLOWING)),
        |r AS (
        | SELECT event_type, x, $SeasonalMaDays * x - s7 AS r
        | FROM ma WHERE nw = $SeasonalMaDays),
        |m AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(r) AS BIGINT) AS sr,
        |  CAST(sum(r * r) AS BIGINT) AS srr
        | FROM r GROUP BY 1)
        |SELECT event_type, n_days,
        | CASE WHEN n_days * sxx - sx * sx <> 0
        |  THEN CAST(round((1.0 -
        |    CAST(n_days * srr - sr * sr AS DOUBLE) /
        |    (${SeasonalMaDays * SeasonalMaDays} *
        |     (n_days * sxx - sx * sx))) * 1000000, 0) AS BIGINT)
        | END AS strength_1e6
        |FROM m""".stripMargin
    },
    "q189_srm_guardrail" ->
      s"""WITH u AS (
        | SELECT DISTINCT event_type, user_id FROM events
        | WHERE user_id IS NOT NULL AND value IS NOT NULL
        |   AND ts IS NOT NULL),
        |a AS (
        | SELECT event_type,
        |  CAST(concat('0x', substr(md5(concat('ab-',
        |    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2 AS arm
        | FROM u),
        |c AS (
        | SELECT event_type,
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        | FROM a GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        | CAST(((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
        |   AS BIGINT) AS chi2_1e6,
        | ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
        |   > $SrmChi2Bar1e6 AS srm_alarm
        |FROM c""".stripMargin,
    "q187_twap" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND value IS NOT NULL),
        |d AS (
        | SELECT user_id, cents,
        |  lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |    - tus AS dur
        | FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        | CAST(sum(dur) AS BIGINT) AS span_us,
        | CAST(sum(CAST(cents AS HUGEINT) * CAST(dur AS HUGEINT))
        |   // sum(CAST(dur AS HUGEINT)) AS BIGINT) AS twap_cents
        |FROM d WHERE dur IS NOT NULL GROUP BY 1""".stripMargin,
    "q188_cusum_changepoint" ->
      s"""WITH daily AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |ref AS (
        | SELECT event_type,
        |  CAST((sum(x) * 100) // $CusumRefDays AS BIGINT) AS k_1e2
        | FROM (SELECT *, min(d) OVER (PARTITION BY event_type) AS d0
        |       FROM daily)
        | WHERE d < d0 + $CusumRefDays GROUP BY 1),
        |c AS (
        | SELECT dd.event_type, dd.d, dd.x, r.k_1e2,
        |  CAST(sum(dd.x * 100 -
        |    (r.k_1e2 + (r.k_1e2 * $CusumSlackPct) // 100)) OVER
        |    (PARTITION BY dd.event_type ORDER BY dd.d
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        | FROM daily dd JOIN ref r USING (event_type)),
        |s AS (
        | SELECT *, p - least(CAST(0 AS BIGINT),
        |   CAST(min(p) OVER (PARTITION BY event_type ORDER BY d
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS s_1e2
        | FROM c),
        |a AS (
        | SELECT *, s_1e2 > (k_1e2 * $CusumThreshPct) // 100 AS alarm
        | FROM s)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        | CAST(max(k_1e2) AS BIGINT) AS k_1e2,
        | CAST(max(s_1e2) AS BIGINT) AS max_s_1e2,
        | min(CASE WHEN alarm THEN make_timestamp(d * 86400000000) END)
        |   AS first_alarm_ts,
        | CAST(max(CAST(alarm AS INT)) AS BOOLEAN) AS drifted
        |FROM a GROUP BY 1""".stripMargin,
    "q181_burst_detection" ->
      s"""WITH hourly AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |w AS (
        | SELECT *, CAST(sum(n) OVER (PARTITION BY event_type ORDER BY h
        |   RANGE BETWEEN $BurstBaselineHours PRECEDING AND 1 PRECEDING)
        |   AS BIGINT) AS trailing24
        | FROM hourly)
        |SELECT event_type, make_timestamp(h * 3600000000) AS hour_ts,
        | n, trailing24,
        | CAST(n * $BurstBaselineHours * 100 // trailing24 AS BIGINT)
        |   AS ratio_1e2
        |FROM w
        |WHERE trailing24 IS NOT NULL AND trailing24 > 0
        |  AND n * $BurstBaselineHours * 100 >=
        |      trailing24 * $BurstFactor1e2""".stripMargin,
    "q179_rfm_segments" -> {
      def thrSql(cn: String): String =
        s"""${cn}cum AS (
           | SELECT v, sum(c) OVER (ORDER BY v
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |  sum(c) OVER () AS n
           | FROM (SELECT $cn AS v, CAST(count(*) AS BIGINT) AS c
           |       FROM rfm GROUP BY 1)),
           |${cn}t AS (SELECT
           |${(1 until RfmQ).map(k =>
              s"  min(CASE WHEN cum >= ($k * n + ${RfmQ - 1}) // $RfmQ " +
                s"THEN v END) AS ${cn}_t$k").mkString(",\n")}
           | FROM ${cn}cum)""".stripMargin
      def bucketSql(cn: String): String =
        s"1 + " + (1 until RfmQ)
          .map(k => s"CAST($cn > ${cn}_t$k AS BIGINT)").mkString(" + ")
      s"""WITH rfm AS (
        | SELECT user_id,
        |  CAST(date_diff('day', max(CAST(ts AS DATE)),
        |    DATE '${NowLit.take(10)}') AS BIGINT) AS r,
        |  CAST(count(*) AS BIGINT) AS f,
        |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) // 100
        |    AS BIGINT) AS m
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1),
        |${thrSql("r")},
        |${thrSql("f")},
        |${thrSql("m")},
        |b AS (
        | SELECT CAST(${bucketSql("r")} AS BIGINT) AS r_q,
        |  CAST(${bucketSql("f")} AS BIGINT) AS f_q,
        |  CAST(${bucketSql("m")} AS BIGINT) AS m_q, m
        | FROM rfm CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
        | CAST(sum(m) AS BIGINT) AS m_total
        |FROM b GROUP BY 1, 2, 3""".stripMargin
    },
    "q176_ewma_forecast" ->
      s"""WITH daily AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |  CAST(count(*) AS BIGINT) AS x
        | FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |ew AS (
        | SELECT a.event_type, a.d AS t,
        |  CAST(sum(b.x >> CAST(a.d - b.d AS INT)) AS BIGINT) AS ewma
        | FROM daily a JOIN daily b ON a.event_type = b.event_type
        |  AND b.d <= a.d AND b.d > a.d - $EwmaWindowDays
        | GROUP BY 1, 2)
        |SELECT ew.event_type,
        | CAST(count(*) AS BIGINT) AS n_backtest,
        | CAST(sum(n.x) AS BIGINT) AS n_events_scored,
        | CAST(CAST(sum(abs(n.x - ew.ewma // 2)) * 100 AS BIGINT)
        |   // count(*) AS BIGINT) AS mae_1e2
        |FROM ew JOIN daily n
        | ON ew.event_type = n.event_type AND n.d = ew.t + 1
        |GROUP BY 1""".stripMargin,
    "q177_funnel_latency" ->
      s"""WITH funnel AS ($q110OracleSql),
        |d AS (
        | SELECT 'view>click' AS stage, user_id,
        |  t_click - t_view AS d_us FROM funnel
        | WHERE t_view IS NOT NULL AND t_click IS NOT NULL
        | UNION ALL
        | SELECT 'click>purchase' AS stage, user_id,
        |  t_purchase - t_click AS d_us FROM funnel
        | WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL),
        |rk AS (
        | SELECT stage, d_us,
        |  row_number() OVER (PARTITION BY stage
        |    ORDER BY d_us, user_id) AS rn,
        |  count(*) OVER (PARTITION BY stage) AS nn
        | FROM d)
        |SELECT stage, CAST(max(nn) AS BIGINT) AS n,
        | CAST(min(d_us) AS BIGINT) AS min_us,
        | CAST(min(CASE WHEN rn = ${q177Rank(50, "nn", "//")} THEN d_us END)
        |   AS BIGINT) AS p50_us,
        | CAST(min(CASE WHEN rn = ${q177Rank(90, "nn", "//")} THEN d_us END)
        |   AS BIGINT) AS p90_us,
        | CAST(max(d_us) AS BIGINT) AS max_us
        |FROM rk GROUP BY 1""".stripMargin,
    "q172_grid_density" ->
      s"""WITH cells AS (
        | SELECT (event_id % 360) - 180 AS cx,
        |  CAST(floor(value % 90.0) AS BIGINT) AS cy,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |sp AS (
        | SELECT cells.cx + dx.v AS cx, cells.cy + dy.v AS cy,
        |  CAST(sum(n) AS BIGINT) AS smoothed
        | FROM cells
        |  CROSS JOIN unnest([-1, 0, 1]) AS dx(v)
        |  CROSS JOIN unnest([-1, 0, 1]) AS dy(v)
        | GROUP BY 1, 2)
        |SELECT sp.cx, sp.cy,
        | CAST(coalesce(c.n, 0) AS BIGINT) AS n_own, sp.smoothed
        |FROM sp LEFT JOIN cells c ON sp.cx = c.cx AND sp.cy = c.cy
        |ORDER BY sp.smoothed DESC, sp.cy ASC, sp.cx ASC
        |LIMIT $GridTopK""".stripMargin,
    "q173_hour_profile" ->
      """WITH prof AS (
        | SELECT event_type,
        |  (epoch_us(ts) // 3600000000) % 168 AS how,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        | SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
        |  CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(max(n) AS BIGINT) AS peak_n
        | FROM prof GROUP BY 1)
        |SELECT p.event_type, max(t.n_total) AS n_total,
        | max(t.n_hours) AS n_hours,
        | CAST(min(p.how) AS BIGINT) AS peak_how,
        | max(t.peak_n) AS peak_n,
        | CAST(max(t.peak_n) * 168 * 1000000 // max(t.n_total) AS BIGINT)
        |   AS concentration_1e6
        |FROM prof p JOIN tot t USING (event_type)
        |WHERE p.n = t.peak_n GROUP BY 1""".stripMargin,
    "q170_session_paths" -> {
      val gapUs = SessionGapHours * 3600L * 1000000L
      s"""WITH e AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        | FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |s AS (
        | SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |   OR tus - lag(tus) OVER w > $gapUs THEN 1 ELSE 0 END AS new_s
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s2 AS (
        | SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |   ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM s),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
        |   ORDER BY tus, event_id) AS rn
        | FROM s2),
        |p AS (
        | SELECT user_id, session_seq,
        |  string_agg(event_type, '>' ORDER BY tus, event_id) AS path
        | FROM r WHERE rn <= $PathLen GROUP BY 1, 2),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |      FROM p GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM c),
        |k AS (SELECT path, n_sessions FROM c
        |      ORDER BY n_sessions DESC, path ASC LIMIT $PathTopK)
        |SELECT k.path, k.n_sessions,
        | CAST(k.n_sessions * 1000000 // tt.total AS BIGINT) AS share_1e6
        |FROM k, tt""".stripMargin
    },
    "q171_train_assembly" -> {
      val cutDate = TrainCutoff.take(10)
      s"""SELECT user_id,
        | CAST(sum(CASE WHEN ts < TIMESTAMP '$TrainCutoff'
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN ts < TIMESTAMP '$TrainCutoff'
        |   AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_purchases,
        | CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '$TrainCutoff'
        |   THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)
        |   AS spend_cents,
        | CAST(count(DISTINCT CASE WHEN ts < TIMESTAMP '$TrainCutoff'
        |   THEN CAST(ts AS DATE) END) AS BIGINT) AS active_days,
        | CAST(date_diff('day',
        |   max(CASE WHEN ts < TIMESTAMP '$TrainCutoff'
        |     THEN CAST(ts AS DATE) END),
        |   DATE '$cutDate') AS BIGINT) AS recency_days,
        | CAST(max(CASE WHEN ts >= TIMESTAMP '$TrainCutoff'
        |   AND ts < TIMESTAMP '$TrainCutoff' + INTERVAL $LabelDays DAY
        |   AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS label
        |FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1 HAVING n_events > 0""".stripMargin
    },
    "q163_skyline" ->
      """WITH u AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |    AS BIGINT) AS y
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT a.user_id, a.x AS n_events,
        | round(a.y / 100.0, 2) AS total_value
        |FROM u a
        |WHERE NOT EXISTS (
        | SELECT 1 FROM u b
        | WHERE b.x >= a.x AND b.y >= a.y
        |   AND (b.x > a.x OR b.y > a.y))""".stripMargin,
    "q164_mad_outliers" ->
      """WITH ev AS (
        | SELECT event_type, value FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |m1 AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |       FROM ev GROUP BY 1),
        |d AS (SELECT ev.event_type, ev.value, m1.med,
        |       abs(ev.value - m1.med) AS ad
        |      FROM ev JOIN m1 USING (event_type)),
        |m2 AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        | round(max(d.med), 6) AS med, round(max(m2.mad), 6) AS mad,
        | CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * m2.mad THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_outliers
        |FROM d JOIN m2 USING (event_type) GROUP BY 1""".stripMargin,
    "q165_attribution" ->
      s"""WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id, event_type, value
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND event_type IN ('click', 'view', 'purchase')),
        |w AS (
        | SELECT *,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN tus END
        |    IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY tus, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ts,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |    IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY tus, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_type
        | FROM ev)
        |SELECT CASE WHEN t_ts IS NOT NULL
        |   AND t_ts >= tus - $AttributionWindowUs THEN t_type
        |  ELSE 'none' END AS touch_type,
        | CAST(count(*) AS BIGINT) AS n_purchases,
        | round(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |   / 100.0, 2) AS total_value
        |FROM w WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q159_type_cooccurrence" ->
      """WITH items AS (
        | SELECT DISTINCT
        |  concat(CAST(user_id AS VARCHAR), '@',
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP)::VARCHAR) AS o,
        |  event_type AS p
        | FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |   AND event_type IS NOT NULL),
        |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM items),
        |ic AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1),
        |pc AS (
        | SELECT a.p AS type_a, b.p AS type_b, CAST(count(*) AS BIGINT) AS n_ab
        | FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        | GROUP BY 1, 2)
        |SELECT pc.type_a, pc.type_b, pc.n_ab, ia.n AS n_a, ib.n AS n_b,
        | t.n_baskets,
        | CAST((pc.n_ab * t.n_baskets * 1000000) // (ia.n * ib.n) AS BIGINT)
        |   AS lift_1e6
        |FROM pc
        |JOIN ic ia ON pc.type_a = ia.p
        |JOIN ic ib ON pc.type_b = ib.p
        |CROSS JOIN tot t""".stripMargin,
    "q158_peak_concurrency" ->
      s"""WITH ev AS (
        | SELECT event_type, epoch_us(ts) AS tus FROM events
        | WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |sweep AS (
        | SELECT event_type, tus * 2 + 1 AS ord, 1 AS delta FROM ev
        | UNION ALL
        | SELECT event_type, (tus + $ConcurrencyHoldUs) * 2, -1 FROM ev),
        |c AS (
        | SELECT event_type,
        |  CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY ord
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        | FROM sweep)
        |SELECT event_type, CAST(count(*) // 2 AS BIGINT) AS n_events,
        | CAST(max(cum) AS BIGINT) AS max_concurrent
        |FROM c GROUP BY 1""".stripMargin,
    "q146_interarrival" ->
      """WITH seq AS (
        | SELECT event_type, epoch_us(ts) AS tus,
        |  lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_us
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT event_type, tus - prev_us AS gap_us FROM seq
        |      WHERE prev_us IS NOT NULL),
        |q AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(quantile_cont(gap_us, [0.5, 0.9]) AS DOUBLE[]) AS p
        | FROM g GROUP BY 1)
        |SELECT event_type, n_gaps,
        | round(p[1] / 1000000.0, 4) AS p50_gap_s,
        | round(p[2] / 1000000.0, 4) AS p90_gap_s
        |FROM q""".stripMargin,
    "q145_rolling_wau" ->
      """WITH au AS (
        | SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |days AS (SELECT DISTINCT d FROM au),
        |wau AS (
        | SELECT dy.d, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
        | FROM days dy JOIN au a ON a.d BETWEEN dy.d - 6 AND dy.d
        | GROUP BY 1),
        |dau AS (
        | SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        | FROM au GROUP BY 1)
        |SELECT dau.d AS day, dau.dau, wau.wau,
        | CAST((dau.dau * 1000000) // wau.wau AS BIGINT) AS stickiness_1e6
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin,
    "q144_forward_fill" ->
      """SELECT event_id, user_id, value,
        | last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
        | (value IS NULL AND last_value(value IGNORE NULLS) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL)
        |   AS was_filled
        |FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL""".stripMargin,
    "q137_event_transitions" ->
      """WITH seq AS (
        | SELECT user_id, event_type,
        |  lag(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS from_type
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |tr AS (
        | SELECT from_type, event_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS n_trans
        | FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
        |       FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n_trans, ft.n_from,
        | CAST((tr.n_trans * 1000000) // ft.n_from AS BIGINT) AS p_1e6
        |FROM tr JOIN ft ON tr.from_type = ft.from_type""".stripMargin,
    "q134_zorder" -> q134OracleSql,
    "q128_cuped" -> q128OracleSql,
    "q126_ab_welch" ->
      s"""WITH pu AS (
         | SELECT event_type, user_id,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS x,
         |  CAST(concat('0x', substr(md5(concat('ab-',
         |    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2 AS arm
         | FROM events
         | WHERE user_id IS NOT NULL AND value IS NOT NULL
         | GROUP BY event_type, user_id),
         |st AS (
         | SELECT event_type,
         |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
         |  sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sa,
         |  sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS qa,
         |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
         |  sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sb,
         |  sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS qb
         | FROM pu GROUP BY 1),
         |r AS (
         | SELECT event_type,
         |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         |  CAST(sa // na AS BIGINT) AS mean_a_cents,
         |  CAST(sb // nb AS BIGINT) AS mean_b_cents,
         |  CAST(CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE (
         |    CASE WHEN ((na * qa - sa * sa) // (na * (na - 1))) // na
         |            + ((nb * qb - sb * sb) // (nb * (nb - 1))) // nb = 0
         |         THEN NULL
         |    ELSE ((sa // na - sb // nb) * (sa // na - sb // nb) * 1000000)
         |      // ( ((na * qa - sa * sa) // (na * (na - 1))) // na
         |         + ((nb * qb - sb * sb) // (nb * (nb - 1))) // nb )
         |    END) END AS BIGINT) AS t2_1e6
         | FROM st)
         |SELECT event_type, n_a, n_b, mean_a_cents, mean_b_cents, t2_1e6,
         | coalesce(t2_1e6 >= $AbT2Bar1e6, FALSE) AS significant
         |FROM r""".stripMargin,
    "q111_cohort_retention" ->
      s"""WITH ev AS (
         | SELECT user_id, event_type, epoch_us(ts) // $WeekUs AS wk
         | FROM events WHERE ts IS NOT NULL),
         |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev
         |      WHERE event_type = 'signup' GROUP BY 1),
         |a AS (SELECT DISTINCT user_id, wk FROM ev)
         |SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
         | CAST(count(*) AS BIGINT) AS n_active
         |FROM a JOIN c USING (user_id)
         |WHERE a.wk >= c.cohort_wk
         |GROUP BY 1, 2""".stripMargin,
    "q110_funnel" -> q110OracleSql,
    "q10_first_last_per_group" ->
      """WITH r AS (
        | SELECT user_id, event_id, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events WHERE ts IS NOT NULL)
        |SELECT user_id,
        | max(CASE WHEN rn_a = 1 THEN event_id END) AS first_event_id,
        | max(CASE WHEN rn_a = 1 THEN ts END) AS first_ts,
        | max(CASE WHEN rn_d = 1 THEN event_id END) AS last_event_id,
        | max(CASE WHEN rn_d = 1 THEN ts END) AS last_ts,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM r GROUP BY user_id""".stripMargin,
    "q11_duration_watermark" ->
      """WITH r AS (
        | SELECT user_id, event_id, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events WHERE ts IS NOT NULL),
        |fl AS (
        | SELECT user_id,
        |  max(CASE WHEN rn_a = 1 THEN ts END) AS first_ts,
        |  max(CASE WHEN rn_d = 1 THEN ts END) AS last_ts
        | FROM r GROUP BY user_id)
        |SELECT user_id,
        | CASE
        |  WHEN last_ts < TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 6 HOUR
        |   THEN CAST(round((epoch_us(last_ts) - epoch_us(first_ts)) / 6e7) AS BIGINT)
        |  WHEN first_ts < TIMESTAMP '2024-01-31 00:00:00' - INTERVAL 2 DAY
        |   THEN 0
        |  ELSE NULL END AS duration_min
        |FROM fl""".stripMargin,
    "q12_band_join_nearest" ->
      """WITH j AS (
        | SELECT a.event_id AS signup_id, a.user_id, b.event_id AS purchase_id,
        |  abs(epoch_us(a.ts) - epoch_us(b.ts)) AS diff_us,
        |  row_number() OVER (PARTITION BY a.event_id
        |    ORDER BY abs(epoch_us(a.ts) - epoch_us(b.ts)), b.event_id) AS rn
        | FROM events a JOIN events b ON a.user_id = b.user_id
        | WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        |   AND abs(epoch_us(a.ts) - epoch_us(b.ts)) < 43200000000)
        |SELECT signup_id, user_id, purchase_id, diff_us FROM j WHERE rn = 1""".stripMargin,
    "q19_hourly_stats" ->
      """SELECT date_trunc('hour', ts) AS hour,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | min(ts) AS min_ts, max(ts) AS max_ts,
        | round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q22_argmin_nearest" ->
      """WITH pts AS (
        | SELECT user_id, event_id,
        |  CAST(round(2 * 6371008.8 * asin(sqrt(
        |    pow(sin(radians(32.0853 - (value % 90.0)) / 2), 2) +
        |    cos(radians(value % 90.0)) * cos(radians(32.0853)) *
        |    pow(sin(radians(34.7818 - (CAST(event_id % 360 AS DOUBLE) - 180.0)) / 2), 2)
        |  ))) AS BIGINT) AS dist_m
        | FROM events),
        |rk AS (
        | SELECT user_id, event_id, dist_m,
        |  row_number() OVER (PARTITION BY user_id ORDER BY dist_m, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_points
        | FROM pts)
        |SELECT user_id, dist_m AS nearest_dist_m, event_id AS nearest_event_id,
        | CAST(n_points AS BIGINT) AS n_points
        |FROM rk WHERE rn = 1""".stripMargin,
    "q23_bbox_filter" ->
      """SELECT event_id, user_id,
        | round(value % 90.0, 6) AS lat,
        | round(CAST(event_id % 360 AS DOUBLE) - 180.0, 6) AS lon
        |FROM events
        |WHERE (value % 90.0) BETWEEN 10.0 AND 40.0
        |  AND (CAST(event_id % 360 AS DOUBLE) - 180.0) BETWEEN -30.0 AND 60.0""".stripMargin,
    "q24_interval_arith" ->
      """SELECT o_orderkey, o_orderdate + INTERVAL 90 DAY AS due_date
        |FROM orders
        |WHERE o_orderdate + INTERVAL 90 DAY < TIMESTAMP '1996-01-01 00:00:00'""".stripMargin,
    "q25_tz_convert" ->
      """SELECT event_id,
        | strftime(timezone('Asia/Jerusalem', timezone('UTC', ts)), '%Y-%m-%d %H:%M:%S') AS local_time,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_time
        |FROM events WHERE event_type = 'signup'""".stripMargin,
    "q26_partition_paths" ->
      """SELECT strftime(ts, '%Y/%m/%d/%H') AS hour_path,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | max(strftime(ts, '%Y/%m/%d/%H/%M')) AS max_snapshot_id
        |FROM events GROUP BY 1""".stripMargin,
    "q27_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q39_running_window" ->
      """SELECT event_id, user_id, ts,
        | round(CAST(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_value
        |FROM events""".stripMargin,
    "q102_running_anomaly" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, ts,
         |  CAST(round(value * 100) AS BIGINT) AS vc
         | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         |c AS (
         | SELECT event_id, user_id, ts, vc,
         |  CAST(count(*) OVER w AS BIGINT) AS n,
         |  CAST(sum(vc) OVER w AS BIGINT) AS s1c,
         |  CAST(sum(vc * vc) OVER w AS BIGINT) AS s2c
         | FROM e
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |z AS (
         | SELECT event_id, user_id, ts, vc, n, s1c,
         |  CAST(s2c AS DOUBLE) / n
         |    - (CAST(s1c AS DOUBLE) / n) * (CAST(s1c AS DOUBLE) / n) AS vr
         | FROM c)
         |SELECT event_id, user_id, ts,
         | (s1c - ((s1c % n) + n) % n) // n AS mean_centi,
         | CASE WHEN n >= $AnomalyMinN AND vr > $AnomalyVarEpsC
         |  THEN CAST(floor(
         |   ((CAST(vc AS DOUBLE) - CAST(s1c AS DOUBLE) / n) / sqrt(vr)) * 100.0
         |  ) AS BIGINT)
         | END AS z_centi,
         | coalesce(CASE WHEN n >= $AnomalyMinN AND vr > $AnomalyVarEpsC
         |  THEN abs((CAST(vc AS DOUBLE) - CAST(s1c AS DOUBLE) / n) / sqrt(vr)) > 3.0
         | END, FALSE) AS is_anomaly
         |FROM z""".stripMargin,
    "q105_rolling_features" ->
      s"""WITH e AS (
         | SELECT event_id, user_id, ts,
         |  CAST(round(value * 100) AS BIGINT) AS vc,
         |  epoch_us(ts) AS tus
         | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
         |SELECT event_id, user_id, ts,
         | CAST(count(*) OVER w1 AS BIGINT) AS n_1h,
         | CAST(sum(vc) OVER w1 AS BIGINT) AS sum_centi_1h,
         | CAST(count(*) OVER w2 AS BIGINT) AS n_24h,
         | CAST(sum(vc) OVER w2 AS BIGINT) AS sum_centi_24h
         |FROM e
         |WINDOW
         | w1 AS (PARTITION BY user_id ORDER BY tus
         |   RANGE BETWEEN $FeatureHorizon1 PRECEDING AND CURRENT ROW),
         | w2 AS (PARTITION BY user_id ORDER BY tus
         |   RANGE BETWEEN $FeatureHorizon2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q42_sessionize" ->
      s"""WITH l AS (
         | SELECT user_id, event_id, ts, value,
         |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         | FROM events WHERE ts IS NOT NULL),
         |f AS (
         | SELECT *, CASE WHEN prev_ts IS NULL
         |   OR epoch_us(ts) - epoch_us(prev_ts) > ${6 * 3600L * 1000000L}
         |  THEN 1 ELSE 0 END AS new_s
         | FROM l),
         |g AS (
         | SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         | FROM f)
         |SELECT user_id, session_seq,
         | min(ts) AS session_start, max(ts) AS session_end,
         | CAST(count(*) AS BIGINT) AS n_events,
         | round(CAST(sum(value) AS DOUBLE), 2) AS total_value
         |FROM g GROUP BY user_id, session_seq""".stripMargin,
    "q47_asof_join" ->
      """WITH s AS (
        | SELECT event_id AS signup_id, user_id, ts FROM events
        | WHERE event_type = 'signup' AND ts IS NOT NULL),
        |p AS (
        | SELECT user_id, ts, value, event_id FROM events
        | WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |j AS (
        | SELECT s.signup_id, s.user_id, p.value, p.event_id AS pid,
        |  row_number() OVER (PARTITION BY s.signup_id
        |    ORDER BY p.ts DESC, p.event_id DESC) AS rn
        | FROM s LEFT JOIN p ON s.user_id = p.user_id AND p.ts <= s.ts)
        |SELECT signup_id, user_id,
        | CASE WHEN pid IS NULL THEN NULL ELSE value END AS asof_value
        |FROM j WHERE rn = 1""".stripMargin)
}
