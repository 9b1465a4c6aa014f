package graft.queries

import graft.Materialize.Ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage over the star-schema lake, one query per
  * SURVEY.md §2 inventory row (tags in each scaladoc). Every query has a
  * DuckDB oracle in [[RelationalQueries.oracles]] with IDENTICAL column
  * names and explicitly-cast aggregate types.
  *
  * Determinism rules applied throughout (the driver hash-compares):
  *  - double aggregates rounded (2 dp for money sums, 4 dp for ratios);
  *  - every top-k / arbitration has a total order (unique id tiebreak);
  *  - time arithmetic in exact integer micros (`unix_micros` ↔
  *    DuckDB `epoch_us`), never float seconds.
  */
object RelationalQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q01 — scan + group-agg (§2.4 A3/A4 family; TPC-H Q1 shape).
    * Ref: stats counts `stats/api.py:46-79`. Filter pushes to parquet;
    * partial aggregation (map-side combine) before the single shuffle.
    */
  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** q02 — projection + range/comparison predicates (§2.1 S1/S2, §2.2 P1/P3).
    * Ref: keyset scan `siri/add_ride_durations.py:139-147`. In Spark the
    * whole filter reaches the parquet reader (PushedFilters) — no
    * pagination machinery needed.
    */
  def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") > 30)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")

  /** q03 — LIKE-prefix filter (§2.2 P4, §2.8 F9).
    * Ref: `snapshot_id LIKE 'YYYY/MM/DD/%'` `stats/api.py:51-53`.
    * `startsWith` compiles to a StartsWith pushed filter.
    */
  def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").startsWith("small"))
      .select("p_partkey", "p_name", "p_brand")

  /** q04 — enum filter + ORDER BY DESC LIMIT n (§2.2 P6, §2.6 O3/O4).
    * Ref: `etl_status != pending` + latest-n `stats/api.py:20-22`.
    * Total order (price desc, key asc) makes the top-10 a deterministic
    * set. Spark plans this as TakeOrderedAndProject — no global sort.
    */
  def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus") =!= "F")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")

  /** q05 — day-truncation grouping (§2.2 P5, §2.8 F1).
    * Ref: `date_trunc('day', scheduled_start_time)` `siri/common.py:21`.
    */
  def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("day_total"))

  /** q06 — multi-way FK-chain inner join (§2.3 J1; TPC-H Q5 shape).
    * Ref: the 6-table export join `packagers/siri.py:51-56`.
    * `nation`/`region` are broadcast (explicit hint): at 100 TB the only
    * shuffles left are lineitem⋈orders⋈customer on their keys, and AQE
    * handles the rest.
    */
  def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** q07 — left outer join preserving unmatched rows (§2.3 J2).
    * Ref: `siri_ride LEFT JOIN gtfs_ride` `packagers/siri.py:57`.
    * Count/max over the nullable side; customers with no big order keep
    * n_big=0 / max_big=null — the reference's IS-NULL progress semantics.
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count("o_orderkey").as("n_big"),
        round(max("o_totalprice"), 2).as("max_big"))
  }

  /** q08 — left join with range residual on the join condition (§2.3 J3).
    * Ref: versioned-dim date-window join `packagers/siri.py:58,60`.
    * The equi key drives the shuffle; the interval predicate is a
    * residual filter inside the join.
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    t(s, dir, "orders")
      .join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left")
      .groupBy("o_orderkey")
      .agg(count("l_linenumber").as("n_early_lines"))
  }

  /** q09 — composite-key equi join (§2.3 J4) + last-element-per-group
    * (§2.4 A8 shape): the "last line of each order" fetched by joining
    * back on (orderkey, max linenumber). Ref: `grs.gtfs_ride_id = gr.id
    * AND grs.gtfs_stop_id = srs.gtfs_stop_id` `packagers/siri.py:59`.
    */
  def q09(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val lastLine = li.groupBy("l_orderkey")
      .agg(max("l_linenumber").as("l_linenumber"))
    li.join(lastLine, Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  }

  /** q13 — join on a computed (expression) key (§2.3 J8, §2.8 F3).
    * Ref: journey_ref reconstruction join `siri/update_rides_gtfs.py:67-78`.
    * The derived key is materialized as a column first so the join stays
    * a plain hash join on both engines.
    */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("src_num", regexp_extract(col("source"), "src(\\d+)", 1).cast("long"))
    docs.join(broadcast(t(s, dir, "supplier")), col("src_num") === col("s_suppkey"), "left")
      .groupBy("src_num")
      .agg(count(lit(1)).as("n_docs"),
        max("s_name").as("supplier_name"))
  }

  /** q14 — exact-timestamp equi join (§2.3 J9).
    * Ref: `scheduled_start_time = start_time` `siri/update_rides_gtfs.py:30-44`.
    * Self-join on order date; aggregated to same-day pair counts so the
    * result stays bounded.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").select(col("o_orderkey").as("a_key"),
      col("o_orderdate").as("a_date"), col("o_orderpriority").as("a_prio"))
    val b = t(s, dir, "orders").select(col("o_orderkey").as("b_key"),
      col("o_orderdate").as("b_date"))
    a.filter(col("a_prio") === "1-URGENT")
      .join(b, col("a_date") === col("b_date"))
      .filter(col("a_key") =!= col("b_key"))
      .groupBy(col("a_date").as("order_date"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** q15 — anti join (§2.3 J13).
    * Ref: dates with no task row, `NOT IN` subquery
    * `idempotent_process_gtfs_data.py:95-108`. `left_anti` never
    * materializes the right payload — only the key set is shuffled.
    */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** q16 — semi join / EXISTS (§2.3 J14).
    * Ref: snapshots `.has()` locations `stats/api.py:55-58`.
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val window97 = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    t(s, dir, "customer")
      .join(window97, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
  }

  /** q17 — coalesce-precedence enrichment (§2.3 J15, §2.8 F12).
    * Ref: journey-match overwrites route-match
    * `siri/update_rides_gtfs.py:98-114` → `coalesce(journey, route)`.
    * Two candidate lookups with a declared priority, resolved by
    * coalesce — deterministic, unlike the reference's UPDATE ordering.
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    // preferred: the order's line 1 part; fallback: the order's last-line
    // part. l_linenumber is NOT unique per order in this lake — both
    // candidates use a deterministic min/max tiebreak so the enrichment
    // join can never fan out (§7.3 invariant). Both lookups ride ONE
    // aggregation pass (a conditional min beside the struct max), so
    // lineitem is scanned and shuffled once and a single join resolves
    // the precedence — not one scan+join per candidate.
    val both = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k"))
      .agg(
        min(when(col("l_linenumber") === 1, col("l_partkey"))).as("first_part"),
        max(struct(col("l_linenumber"), col("l_partkey"))).as("m"))
      .select(col("k"), col("first_part"), col("m.l_partkey").as("last_part"))
    t(s, dir, "orders")
      .join(both, col("o_orderkey") === col("k"), "left")
      .select(col("o_orderkey"),
        coalesce(col("first_part"), col("last_part"), lit(-1L)).as("resolved_part"))
  }

  /** q18 — ratio-of-counts with zero guard (§2.4 A4, §2.8 F10).
    * Ref: ≥90% completeness check `gtfs/update_ride_aggregations.py:58-74`.
    */
  def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(date_trunc("MONTH", col("o_orderdate"))).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(
          when(count(lit(1)) === 0, 0.0)
            .otherwise(count(when(col("o_orderstatus") === "O", 1)) * lit(100.0) / count(lit(1))),
          4).as("pct_open"))

  /** q20 — UNION with dedup (§2.7 U1).
    * Ref: never-run ∪ failed dates `idempotent_process_gtfs_data.py:96-108`.
    */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F")
      .select(to_date(col("o_orderdate")).as("order_day"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(to_date(col("o_orderdate")).as("order_day"))
    a.union(b).distinct()
  }

  /** q21 — min/max over a filtered window (§2.4 A2).
    * Ref: materialized-CTE min/max id `siri/add_ride_durations.py:119-124`
    * — a Postgres-planner workaround we don't need: one partial-agg scan.
    */
  def q21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .agg(min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
        count(lit(1)).as("n_rows"))

  /** q121 — grouped closed-form OLS (least-squares trend per group):
    * slope and intercept of extended-price-cents against quantity for
    * each return flag, from the five sufficient statistics
    * (n, Σx, Σy, Σx², Σxy) — the FEATURE-ENGINEERING aggregation a
    * training pipeline runs per entity ("per-user value trend",
    * "per-source length drift") at any scale, because the statistics
    * are one partial-agg shuffle and the model algebra happens on the
    * k-group result.
    *
    * Exactness contract: x is integral quantity, y integer CENTS
    * (`round(price·100)` — exact at the lake's 2-dp precision), sums
    * accumulate in DECIMAL(38,0) (exact, order-free — a double
    * Σxy would be partial-agg-order dependent and could never
    * hash-gate), and slope/intercept are emitted in 10⁻⁶ fixed point
    * via integral division — both engines TRUNCATE toward zero
    * (Spark `div`, DuckDB `//` — measured on negative operands, not
    * assumed; a negative intercept is the case that separates
    * truncation from floor). A float regression would disagree across
    * engines in the last ulp; this one is bit-exact by construction.
    */
  /** The q121 core over any (grpCol STRING, x BIGINT, y BIGINT) frame
    * — factored so PropertySpec can replay the fixed-point algebra
    * against an exact BigInt reference on generated points (including
    * negative-y / negative-slope cases, where truncating vs floor
    * division actually differ).
    *
    * Per-ROW and per-PARTITION arithmetic runs in LONG (caller
    * contract: |x·x| and |x·y| fit a long — row VALUES are
    * magnitude-bounded by the schema, not by corpus size, so the bound
    * is scale-free; partition subtotals add ≤ ~10⁶ such products at
    * 128 MB splits, 4 orders inside the long range, and every
    * accumulation is `addExact`/`multiplyExact` so an out-of-contract
    * caller fails LOUDLY instead of wrapping). Only the cross-
    * partition SUMS accumulate in DECIMAL(38,0), which keeps the
    * order-free exactness at unbounded row counts — |partitions| · 5
    * decimal adds total, off the per-row path. Groups are
    * low-cardinality by caller contract (a flag / a scope label), so
    * the per-partition state is a handful of 5-long arrays.
    *
    * The r16-era form multiplied DECIMAL(38,0)×DECIMAL(38,0) per row —
    * a precision-checked BigDecimal multiply on the hot path for
    * values that fit a long; the r17 A/B measured the long-row fold at
    * −21% task and this dense-partial pass on top of it (BASELINE.md
    * "q121 long-row-math").
    */
  private[graft] def trendOf(pts: DataFrame, grpCol: String): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    val partials = pts
      .select(col(grpCol).cast("string"), col("x").cast("long"),
        col("y").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
        it.foreach { case (g, x, y) =>
          val a = acc.getOrElseUpdate(g, new Array[Long](5))
          a(0) += 1L
          a(1) = Math.addExact(a(1), x)
          a(2) = Math.addExact(a(2), y)
          a(3) = Math.addExact(a(3), Math.multiplyExact(x, x))
          a(4) = Math.addExact(a(4), Math.multiplyExact(x, y))
        }
        acc.iterator.map { case (g, a) => (g, a(0), a(1), a(2), a(3), a(4)) }
      }
      .toDF(grpCol, "pn", "psx", "psy", "psxx", "psxy")
    partials.groupBy(grpCol)
      .agg(sum(col("pn").cast(dec)).as("n"),
        sum(col("psx").cast(dec)).as("sx"),
        sum(col("psy").cast(dec)).as("sy"),
        sum(col("psxx").cast(dec)).as("sxx"),
        sum(col("psxy").cast(dec)).as("sxy"))
      .select(col(grpCol), col("n").cast("long").as("n_rows"),
        expr("""CAST(((n * sxy - sx * sy) * 1000000)
            div (n * sxx - sx * sx) AS BIGINT)""").as("slope_1e6"),
        expr("""CAST(((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx)
              * 1000000)
            div (n * (n * sxx - sx * sx)) AS BIGINT)""").as("intercept_1e6"))
  }

  def q121(s: SparkSession, dir: String): DataFrame =
    trendOf(
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          // long row values (quantity ≤ 50, cents < 10⁸): products fit
          // a long per ROW at any corpus size; sums go DECIMAL in trendOf
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("y")),
      "l_returnflag")

  /** Minimum basket co-occurrence count for a q133 pair — the standard
    * association-mining support cut — and the degenerate-basket guard:
    * baskets with more than [[CoocMaxBasket]] distinct items are
    * DROPPED before pairing (a 10k-item cart contributes ~5×10⁷ pairs
    * of zero analytical value — the classic co-occurrence scale
    * killer; StressBench measures the guard under exactly that
    * basket). TPC-H baskets hold ≤ 7 lines, so the cut is inert on
    * this lake and the oracle replays it identically.
    */
  val CoocMinSupport = 2L
  val CoocMaxBasket = 100L

  /** q133 — basket CO-OCCURRENCE with LIFT: for every part pair bought
    * together in ≥ [[CoocMinSupport]] orders, the co-order count and
    * `lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)` in 10⁻⁶ fixed
    * point — the association-rule statistic behind "users who bought X"
    * and, in a training-data pipeline, source/tag affinity mining
    * (which domains co-occur in the same crawl record beyond chance).
    * All-positive integer floor division — hash-gates cross-engine
    * (the q121 discipline).
    *
    * Plan: distinct (order, part) items once (one shuffle, then
    * checkpointed for its three consumers); pair generation is an
    * order-key self-join whose fanout is per-basket QUADRATIC BUT
    * BASKET-BOUNDED — TPC-H baskets hold ≤ 7 lines, and at 100 TB a
    * deployment caps basket size (`slice(sort_array(...), 1, K)`)
    * before pairing, the standard guard against degenerate carts; the
    * pair count is one partial-agg shuffle on (part_a, part_b) and the
    * support cut prunes the long tail BEFORE the stats joins. Basket
    * total N rides a broadcast one-row frame (scalar, never data).
    */
  /** The guarded pair generator q133 and the stress bench share:
    * distinct items, degenerate baskets (> maxBasket items) dropped,
    * ordered within-basket pairs counted with the support cut applied
    * BEFORE any join-back.
    *
    * Shape: ONE groupByKey shuffle on the basket key with map-side
    * in-group pairing, then the pair partial agg — two exchanges
    * total. The declarative alternative (size filter + order-key
    * self-join + pair agg) re-shuffles the item table twice more and
    * measured ~25% slower at sf0.1 (2.3–2.7 s vs 1.8 s min-of-3,
    * quiet window); the in-group combination loop is
    * the rare place where `flatMapGroups` beats the join, because the
    * quadratic-but-basket-bounded fanout never needs to leave the
    * task that holds the basket.
    */
  private[graft] def basketPairs(itemsIn: DataFrame,
                                 maxBasket: Long): DataFrame = {
    import itemsIn.sparkSession.implicits._
    itemsIn.select(col("o").cast("long"), col("p").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ps = it.map(_._2).toArray.distinct.sorted
        if (ps.length < 2 || ps.length > maxBasket) Iterator.empty
        else ps.indices.iterator.flatMap(i =>
          Iterator.range(i + 1, ps.length).map(j => (ps(i), ps(j))))
      }
      .toDF("part_a", "part_b")
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= CoocMinSupport)
  }

  /** The distinct (order, part) basket item table and its guarded
    * within-basket pair counts — a per-dataset INDEX artifact (the
    * [[purchaseEdges]] discipline), memoized as ONE tuple on the lake
    * fingerprint so q133 (lift stats) and q174 (also-bought
    * shortlist) share one fact-scan + distinct and one groupByKey
    * pairing pass; a real pipeline computes the pair table once and
    * serves both reports. One `getAny` per consumer keeps the bench
    * warm-tagging honest: a cold run registers exactly one memo miss,
    * never an intra-query self-hit.
    *
    */
  private def basketTables(s: SparkSession,
                           dir: String): (DataFrame, DataFrame) =
    QueryMemo.getAny[(DataFrame, DataFrame)](s, "basket-tables:" + dir +
        ":" + graft.sources.DatasetFingerprint.ofTable(s, dir, "lineitem")) {
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
        .materialize()
      val pairs = basketPairs(items, CoocMaxBasket).materialize()
      (items, pairs)
    }

  /** The lift marginals — per-part item frequency and the one-row
    * distinct-basket total — folded into their OWN memoized artifact
    * (VERDICT r17 item 5): both are pure per-dataset derivations of
    * the basket items, exactly like the pair table — a serving
    * pipeline stores the marginals next to the pair counts because
    * every lift readout needs them. A SEPARATE memo entry (not fields
    * of [[basketTables]]) so q174, which only consumes pairs, never
    * builds marginals it would throw away — its COLD/standalone cost
    * is unchanged. The q133 bench entry now measures the residual
    * three-way stats join (it was already warm-tagged); the artifact's
    * cold build cost is recorded in BASELINE.md ("basket artifact cold
    * build"), and `SPARK_GRAFT_BENCH_COLD=1` still measures q133's
    * full standalone cost. The caller hands in the `items` frame it
    * already holds (instead of this builder re-entering
    * [[basketTables]]) so a cold q133 registers two memo MISSES and
    * zero self-hits — the warm tag stays honest.
    */
  private def basketMarginals(s: SparkSession, dir: String,
                              items: DataFrame): (DataFrame, DataFrame) =
    QueryMemo.getAny[(DataFrame, DataFrame)](s, "basket-marginals:" + dir +
        ":" + graft.sources.DatasetFingerprint.ofTable(s, dir, "lineitem")) {
      val itemCnt = items.groupBy(col("p"))
        .agg(count(lit(1)).as("n")).materialize()
      val totals = items.agg(countDistinct(col("o")).as("n_baskets"))
        .materialize()
      (itemCnt, totals)
    }

  def q133(s: SparkSession, dir: String): DataFrame = {
    val (items, pairCnt) = basketTables(s, dir)
    val (itemCnt, totals) = basketMarginals(s, dir, items)
    pairCnt
      .join(itemCnt.toDF("part_a", "n_a"), Seq("part_a"))
      .join(itemCnt.toDF("part_b", "n_b"), Seq("part_b"))
      .crossJoin(broadcast(totals))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_baskets"),
        expr("(n_ab * n_baskets * 1000000) div (n_a * n_b)").as("lift_1e6"))
  }

  /** q135's compaction target and the per-row size proxy (a fixed-width
    * row estimate — a real deployment reads footer byte counts; the
    * PLAN is identical either way). Shared with the oracle.
    */
  val CompactTargetBytes = 16384L
  val CompactRowBytes = 64L

  /** q135 — LAKE COMPACTION PLAN: the metadata-scale half of small-file
    * compaction ([[graft.sources.Lake.compact]] is the executor half —
    * it rewrites one directory; this PLANS a whole lake). Model each
    * (month partition, ship-day) as one ingest file with
    * `rows · CompactRowBytes` bytes, then greedily pack files in day
    * order into ~[[CompactTargetBytes]] output groups, restarting per
    * partition — exactly Delta/Iceberg OPTIMIZE's bin-packing step,
    * and exactly [[graft.operators.SequencePacking.withBins]] with
    * bytes as the token count (one operator, two first-class uses:
    * training-shard packing and lake maintenance). `bin_id =
    * (cum − bytes) div target`: oversized files keep their own bin,
    * every other bin fills to the target.
    *
    * Scale shape: file stats are one partial-agg shuffle over the
    * fact table (a real deployment reads the file LISTING — metadata,
    * not data); the packing is withBins' two-pass distributed prefix
    * sum — parallelism = range partitions regardless of how many
    * files one month holds, no per-partition window task (the
    * operator's scaladoc proves why that matters at 100 TB).
    */
  def q135(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "lineitem")
      .groupBy(to_date(date_trunc("MONTH", col("l_shipdate"))).as("p_month"),
        to_date(col("l_shipdate")).as("file_day"))
      .agg((count(lit(1)) * CompactRowBytes).as("bytes"))
    graft.operators.SequencePacking
      .withBins(files, Seq("p_month"), "file_day", "bytes",
        CompactTargetBytes)
      .select(col("p_month"), col("file_day"), col("bytes"),
        col("cum_tokens").as("cum_bytes"), col("bin_id"))
  }

  /** Fixed round count for [[q141]] — part of the cross-engine
    * contract (the oracle unrolls exactly this many hub→auth→hub
    * rounds; see [[graft.operators.Hits]]).
    */
  val HitsIters = 3

  /** q141 — HITS hubs & authorities over the customer→part purchase
    * bipartite graph: a part's AUTHORITY is reinforced by the hub
    * weight of the customers who buy it, a customer's HUB score by
    * the authority of the parts they buy — the mutual-reinforcement
    * ranking (Kleinberg) that separates "bought by heavy,
    * wide-ranging buyers" from raw popularity, and the bipartite
    * complement to the PageRank family (q104/q107/q125) on the
    * dedup graphs. Exact integer fixed point with max-normalization
    * each half-step — every score hash-gates against the unrolled
    * SQL replay.
    *
    * Scale shape: the edge build is one distinct over the fact join
    * (FK-chain, both sides shuffled once); each half-step is one
    * |E|-pair equi-join + partial-agg sum + a one-row max broadcast —
    * the PageRank iteration anatomy on a bipartite edge set, chained
    * into one AQE-sized action.
    */
  /** The distinct customer→part purchase edge list — a per-dataset
    * INDEX artifact (the [[graft.queries.DedupQueries]]
    * `checkpointedSignatures` discipline): one fact-join + distinct,
    * memoized on the lake fingerprint so the six HITS half-step
    * passes and any other bipartite consumer reread the
    * materialization, not the fact table.
    */
  private def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    QueryMemo.get(s, "purchase-edges:" + dir + ":" +
        graft.sources.DatasetFingerprint.ofTable(s, dir, "lineitem")) {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
        .materialize()
    }

  def q141(s: SparkSession, dir: String): DataFrame =
    q141For(s, dir, HitsIters)

  /** [[q141]] with a caller-chosen round count — the REDUCED-ROUND
    * scale check of VERDICT r14 item 1: the full 3-round unrolled SQL
    * replay is infeasible in DuckDB above sf0.1 (it exhausted 79 GiB
    * of spill at sf0.5), but a 1-round replay fits, so
    * [[graft.ScaleStabilityProbe]] pairs `q141For(_, _, 1)` against
    * [[q141OracleSqlFor]](1) at sf0.5/sf1 — an independent
    * hash-compare of the exact half-step arithmetic at the scales the
    * full replay can't reach.
    */
  private[graft] def q141For(s: SparkSession, dir: String,
                             iters: Int): DataFrame =
    graft.operators.Hits.run(purchaseEdges(s, dir), iters)

  /** [[purchaseEdges]] exposed for the partitioning-stability leg of
    * [[graft.ScaleStabilityProbe]] — same memoized artifact, so a
    * probe re-run measures the HITS rounds, not the edge build.
    */
  private[graft] def hitsEdges(s: SparkSession, dir: String): DataFrame =
    purchaseEdges(s, dir)

  /** q142's decay geometry: weights halve every [[HalfLifeDays]] days
    * of age relative to [[DecayRef]], in 2⁻²⁰ fixed point
    * ([[DecayScale]]); the shift is clamped to [0, 62] because a JVM
    * long shift is mod-64 — an unclamped 64-day-half-life pathology
    * would silently wrap to weight = full scale. Shared with the
    * oracle.
    */
  val DecayScale = 1L << 20
  val HalfLifeDays = 365
  val DecayRef = "1998-12-01"

  /** q142 — TIME-DECAYED POPULARITY: per part, the count of orders and
    * the half-life-decayed order mass `Σ DecayScale >> (age div
    * halfLife)` — the freshness-weighted popularity every feature
    * store and trending ranker maintains, here EXACT: quantizing the
    * exponential to power-of-two steps turns the weight into an
    * integer bit shift, so the sum is order-free long arithmetic and
    * hash-gates cross-engine (a float `exp(-λ·age)` sum never could —
    * the q121 argument applied to decay curves). Continuous-decay
    * deployments trade this exactness back for smoothness; the
    * pipeline shape is identical.
    *
    * Scale shape: one distinct over the fact join (a part counted
    * once per order), one partial-agg shuffle on part; the decay
    * weight is a codegen'd projection.
    */
  def q142(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("p"), col("o_orderkey").as("o"),
        to_date(col("o_orderdate")).as("d"))
      .distinct()
      .withColumn("wt", expr(
        s"""shiftright(${DecayScale}L, CAST(least(greatest(
           |  datediff(DATE '$DecayRef', d) div $HalfLifeDays, 0), 62) AS INT))""".stripMargin))
      .groupBy(col("p").as("part"))
      .agg(count(lit(1)).as("n_orders"), sum(col("wt")).as("decayed_2p20"))

  /** q157 — JOIN-FANOUT STATISTICS: for each candidate join key of
    * the fact table, the exact self-join output size `Σ_k c_k²`, the
    * hottest key's count, and the key cardinality — the
    * cost-based-optimizer primitive a 100 TB deployment computes
    * BEFORE committing to a join (`Σ c_k²` IS the self-join row
    * count; `Σ cA·cB` the general case), and the measured
    * justification for q133's basket guard and the salting/AQE-skew
    * decisions ([[graft.operators.SaltedAgg]], q138's Gini). Exact
    * integers in DECIMAL(38,0): Σc² at web scale exceeds 2⁶³ — which
    * is precisely the warning the table exists to give.
    *
    * Scale shape: one partial-agg count per key choice over the same
    * scan, each reduced to a one-row summary; the per-key count
    * tables never leave the executors.
    */
  def q157(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    def statsFor(keyCol: String): DataFrame =
      t(s, dir, "lineitem")
        .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(expr(s"CAST(c AS $dec) * CAST(c AS $dec)")).cast("long")
            .as("self_join_rows"),
          max(col("c")).as("max_key_rows"))
        .select(lit(keyCol).as("join_key"), col("n_keys"),
          col("self_join_rows"), col("max_key_rows"))
    statsFor("l_orderkey")
      .unionAll(statsFor("l_partkey"))
      .unionAll(statsFor("l_suppkey"))
  }

  /** q162 — SINGLE-TABLE COLUMN PROFILE (the deequ/"dataset card"
    * statistics pass): for every column of `orders` — row count, null
    * count, EXACT distinct count, and canonical min/max — the data-
    * quality card a lake computes on ingest before q160's cross-table
    * audit trusts the keys (completeness = n_rows−n_nulls,
    * uniqueness = n_distinct/n_rows, range sanity = min/max; the
    * deequ Profile/Check primitives re-expressed as one query).
    * Min/max are computed in the column's NATIVE type (numeric order,
    * not lexicographic) and canonicalized to strings only at the end
    * — bigints/doubles via cast, timestamps via an explicit
    * `yyyy-MM-dd HH:mm:ss` format pin so both engines render
    * identically.
    *
    * Scale shape: one branch per column, each a column-PRUNED scan
    * (parquet reads exactly one column per branch — the profile of a
    * 400-column table reads 400 columns once, not 400 full-table
    * passes) into a (value, count) partial agg; the shuffle carries
    * distinct values only, and the second-level agg reduces to one
    * row per branch before the driver-free union. No multi-
    * countDistinct Expand (which would multiply the scan ×columns
    * through one shuffle).
    */
  def q162(s: SparkSession, dir: String): DataFrame = {
    def profile(c: String, canon: Column => Column): DataFrame =
      t(s, dir, "orders")
        .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          count(col("v")).as("n_distinct"),
          canon(min(col("v"))).as("min_value"),
          canon(max(col("v"))).as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    val str = (v: Column) => v.cast("string")
    val ts = (v: Column) => date_format(v, "yyyy-MM-dd HH:mm:ss")
    profile("o_orderkey", str)
      .unionAll(profile("o_custkey", str))
      .unionAll(profile("o_orderstatus", str))
      .unionAll(profile("o_totalprice", str))
      .unionAll(profile("o_orderdate", ts))
      .unionAll(profile("o_orderpriority", str))
  }

  /** q174's shortlist size. */
  val AlsoBoughtK = 3

  /** q174 — "ALSO-BOUGHT" RECOMMENDATION SHORTLIST: for every part,
    * the [[AlsoBoughtK]] parts most often co-purchased with it —
    * q133's basket co-occurrence turned into the serving-side
    * artifact (the item-item collaborative-filtering table every
    * storefront precomputes). Pairs come from the same guarded
    * within-basket generator as q133 (degenerate mega-baskets
    * excluded, support-filtered), symmetrized to both directions;
    * the per-part cut is [[graft.operators.TopKPerGroup]]'s bounded
    * typed aggregator — ranked by co-purchase count desc, partner id
    * asc (total order).
    *
    * Scale shape: the pair mass shuffles once into the bounded top-k
    * buffers — no window sort over the pair table (a `row_number`
    * recipe would sort every part's full partner list for a 3-row
    * answer); partial aggregation caps each map partition's
    * contribution at k rows per part.
    */
  def q174(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the memoized artifact is already checkpointed; both union arms
    // reread the materialization, not the fact table
    val pairs = basketTables(s, dir)._2
    val sym = pairs
      .select(col("part_a").as("part"), col("part_b").as("rec"), col("n_ab"))
      .unionAll(pairs
        .select(col("part_b").as("part"), col("part_a").as("rec"),
          col("n_ab")))
    val agg = graft.operators.TopKPerGroup.topK[(Long, Long)](
      AlsoBoughtK, Ordering.by { case (n, r) => (-n, r) })
    sym.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (part, top) =>
        top.iterator.zipWithIndex.map { case ((n, rec), i) =>
          (part, (i + 1).toLong, rec, n)
        }
      }
      .toDF("part", "rank", "rec", "n_ab")
  }

  /** q180 — SUPPLIER CONCENTRATION (Herfindahl–Hirschman index) per
    * part type: each type's supplier revenue shares squared and
    * summed — the market-concentration / single-point-of-failure
    * audit (procurement risk, data-source concentration in a corpus)
    * on the q18 ratio-gate family but quadratic in shares, so a
    * 0.9-share supplier dominates the score the way it dominates the
    * risk. Exact integers end to end: revenue in cents, `HHI =
    * Σcᵢ²·10⁶ / (Σcᵢ)²` in DECIMAL(38,0) (cᵢ² at web scale exceeds
    * 2⁶³ — the q157 lesson, cast BEFORE the square).
    *
    * Scale shape: one fact-table partial agg to (type, supplier)
    * revenue (the part dimension broadcasts onto the scan); the HHI
    * algebra runs on that rollup; output is |types| rows.
    */
  def q180(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
        col("p_type"))), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("l_suppkey"))
      .agg(expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT))")
        .as("c"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("c")).as("revenue_cents"),
        sum(expr(s"CAST(c AS $dec) * CAST(c AS $dec)")).as("sumsq"))
      .select(col("p_type"), col("n_suppliers"), col("revenue_cents"),
        expr(s"CAST(sumsq * 1000000 div (CAST(revenue_cents AS $dec) * " +
          s"CAST(revenue_cents AS $dec)) AS BIGINT)").as("hhi_1e6"))
  }

  /** Benford's-law expected first-digit shares, 10⁻⁶ fixed point —
    * ONE Scala evaluation of `log₁₀(1 + 1/d)` interpolated into both
    * engines (the MinHash-constant discipline: shared literals, not
    * shared math).
    */
  val BenfordExp1e6: Seq[Long] =
    (1 to 9).map(d => math.round(math.log10(1.0 + 1.0 / d) * 1000000))

  /** q197 — BENFORD'S-LAW AUDIT of order totals: the first-significant-
    * digit distribution against `log₁₀(1+1/d)` — the forensic-
    * accounting screen for fabricated or systematically clipped
    * amounts (organic multiplicative data follows Benford; invented
    * numbers and price floors don't). The first digit comes from the
    * CENTS STRING (scale-invariant: ×10ᵏ never changes the leading
    * digit) — no float log whose edge behavior at exact powers of
    * ten could differ; the per-digit deviation is exact 10⁻⁶
    * integers. Flat synthetic prices FAIL Benford loudly — the audit
    * exists to say so, and the dev_1e6 column says by how much.
    *
    * Scale shape: one scan into a ≤ 9-row digit histogram; the
    * expected-share table is a 9-literal broadcast.
    */
  def q197(s: SparkSession, dir: String): DataFrame = {
    val expArr = s"array(${BenfordExp1e6.mkString("L, ")}L)"
    t(s, dir, "orders")
      .filter(expr("CAST(round(o_totalprice * 100) AS BIGINT)") >= 1L)
      .groupBy(expr("CAST(substring(CAST(CAST(round(o_totalprice * 100) " +
        "AS BIGINT) AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div total").as("obs_1e6"),
        expr(s"$expArr[CAST(digit - 1 AS INT)]").as("exp_1e6"))
      .withColumn("dev_1e6", abs(col("obs_1e6") - col("exp_1e6")))
  }

  /** q183's period boundary (P1 strictly before, P2 at/after). */
  val AttribSplit = "1998-01-01 00:00:00"

  /** q183 — METRIC-DELTA ATTRIBUTION ("why did revenue move"): split
    * history at [[AttribSplit]], and for each order-priority segment
    * report the exact revenue delta and its signed share of the TOTAL
    * delta — the root-cause decomposition a metrics review runs
    * before anyone stares at dashboards (Σ contributions ≡ 10⁶ by
    * construction, so segments that moved WITH the metric and
    * against it are both visible). Revenue is exact cents from ONE
    * conditional-aggregate scan; the contribution share divides two
    * exact longs in double and rounds half-away (integer `div`
    * truncates toward zero in Spark but floors in DuckDB on NEGATIVE
    * quotients — deltas can be negative, so this is the one place
    * round-not-div is the PORTABLE choice). Ranked by |delta|.
    *
    * Scale shape: one fact scan, one partial-agg exchange; the
    * attribution algebra and rank window run on |segments| rows.
    */
  def q183(s: SparkSession, dir: String): DataFrame = {
    val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    val seg = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("segment"))
      .agg(
        coalesce(sum(when(col("o_orderdate") <
          lit(AttribSplit).cast("timestamp"), expr(cents))), lit(0L))
          .as("c1"),
        coalesce(sum(when(col("o_orderdate") >=
          lit(AttribSplit).cast("timestamp"), expr(cents))), lit(0L))
          .as("c2"))
      .withColumn("delta", col("c2") - col("c1"))
      .materialize() // |segments| rows; total + report
    val tot = seg.agg(sum(col("delta")).as("total_delta"))
    seg.crossJoin(broadcast(tot))
      .select(col("segment"), col("c1"), col("c2"), col("delta"),
        when(col("total_delta") =!= 0L,
          round(col("delta").cast("double") * 1000000.0 /
            col("total_delta"), 0).cast("long")).as("contribution_1e6"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("delta")).desc, col("segment").asc)).cast("long"))
  }

  /** q167's replica count and the 95% order-statistic ranks: with
    * B=200 sorted replica means, the CI is the 5th and 196th
    * (`floor(0.025·B)` from each end — the percentile-bootstrap
    * convention with EXACT order statistics, no interpolated quantile
    * whose float could differ between engines).
    */
  val BootB = 200
  val BootLoRank: Int = BootB * 25 / 1000
  val BootHiRank: Int = BootB - BootLoRank + 1

  /** q167 — BAYESIAN CLUSTER BOOTSTRAP: a 95% confidence interval on
    * mean customer lifetime value per market segment, resampling
    * CUSTOMERS (the exchangeable unit — resampling orders would fake
    * independence inside a customer) with Rubin's Bayesian bootstrap:
    * replica b reweights each customer by an Exp(1) draw, here
    * `-ln(u)` from the hash-uniform `md5('bb-'++custkey++'-'++b)`
    * (the q43/q161 discipline) so all [[BootB]] replicas are
    * deterministic and engine-portable where seeded RNG is neither.
    * Weights are quantized to 10⁻⁴ longs; each replica mean is an
    * exact integer division of integer sums, and the CI is exact
    * order statistics at [[BootLoRank]]/[[BootHiRank]] — no float
    * ever crosses an engine boundary.
    *
    * Scale shape: the LTV rollup is one partial-agg shuffle; the
    * ×[[BootB]] replica pass folds MAP-SIDE into |segments|·B partial
    * groups inside each task before its shuffle — resampling 10M
    * customers 200 times moves 200·|segments| rows per task, not
    * 2×10⁹. The rank window orders B rows per segment. (Weighted-
    * product sums fit longs here: w₄ < 2.3·10⁵ and cents < 2⁶³/
    * (2.3·10⁵·n_segment) — the q157-style DECIMAL(38,0) upgrade is
    * one cast away when a segment's mass outgrows that.)
    *
    * The draw loop is a TYPED per-partition fold (VERDICT r16 second
    * A/B, the q166-fold discipline): the r15 form exploded 200 rows
    * per customer and ran the md5 draw as a codegen'd
    * concat→md5→hex-substring→conv→log→round expression chain per
    * row; the fold computes the SAME value from the raw digest bytes
    * ([[graft.functions.DedupFunctions.md5Hash32Jvm]] — first 4
    * bytes == first 8 hex chars parsed base-16, bit-identical) and
    * accumulates (num, den) per (segment, b) in one pass, so the ×B
    * rows are never materialized and the only expression work left
    * is one ln + one round per draw. Round semantics replicate
    * Spark's `round(double, 0)` exactly: a frac-vs-0.5 fast path
    * (exact — `r − floor(r)` is exact for r ≥ 0, and shortest-repr
    * decimal ordering against .5 agrees with binary ordering), with
    * true dyadic ties delegated to the BigDecimal HALF_UP form the
    * codegen'd Round uses. Oracle hash unchanged at every gated SF.
    */
  def q167(s: SparkSession, dir: String): DataFrame = {
    val ltv = t(s, dir, "customer")
      .join(t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))")
          .as("ocents")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), col("c_custkey"),
        coalesce(col("ocents"), lit(0L)).as("cents"))
      // spread the ×B replica pass across the session's parallelism:
      // the broadcast join inherits the sub-4MB customer scan's ONE
      // partition (SCALE.md §20), and 200 md5+ln draws per customer is
      // codec-scale per-row CPU (~0.2 ms/row) — serial it costs ~3 s,
      // spread it costs one 24-byte-row exchange (the §20 rule's
      // keep side, unlike the rejected tokenize-scale spreads)
      .repartition(s.sparkContext.defaultParallelism)
      .materialize() // two consumers: point estimate + replicas
    import s.implicits._
    val repPartial = ltv
      .select(col("c_mktsegment"), col("c_custkey"), col("cents"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // dense accumulators indexed by segIdx·B + b: the segment set
        // (≤5 distinct) is dictionary-encoded per partition, so the
        // ×B-per-customer hot loop adds into two long arrays instead
        // of boxing a (String, Int) tuple + a computeIfAbsent lambda
        // probe per draw (VERDICT r16 item 3 — the PackedKeyTable
        // discipline applied to the accumulator side)
        val segs = new scala.collection.mutable.ArrayBuffer[String](8)
        var nums = new Array[Long](0)
        var dens = new Array[Long](0)
        def segIdx(seg: String): Int = {
          var i = 0
          // linear scan beats any map at ≤5 entries, once per CUSTOMER
          while (i < segs.length) { if (segs(i) == seg) return i; i += 1 }
          segs += seg
          nums = java.util.Arrays.copyOf(nums, segs.length * BootB)
          dens = java.util.Arrays.copyOf(dens, segs.length * BootB)
          segs.length - 1
        }
        it.foreach { case (seg, ck, cents) =>
          val base = segIdx(seg) * BootB
          val prefix = "bb-" + ck + "-"
          var b = 0
          while (b < BootB) {
            val h = graft.functions.DedupFunctions.md5Hash32Jvm(prefix + b)
            // the exact expression chain of the r15 column form:
            // u = (hash+1)/2³², w4 = round(-ln(u)·10⁴, 0) HALF_UP
            val r = -math.log((h + 1L).toDouble / 4294967296.0) * 10000.0
            val f = math.floor(r)
            val frac = r - f
            val w4 =
              if (frac > 0.5) f.toLong + 1L
              else if (frac < 0.5) f.toLong
              else // exact .5 — the BigDecimal HALF_UP path Round codegens
                new java.math.BigDecimal(java.lang.Double.toString(r))
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            nums(base + b) += w4 * cents
            dens(base + b) += w4
            b += 1
          }
        }
        segs.indices.iterator.flatMap { si =>
          (0 until BootB).iterator.map { b =>
            (segs(si), b, nums(si * BootB + b), dens(si * BootB + b))
          }
        }
      }
      .toDF("c_mktsegment", "b", "num", "den")
    val rep = repPartial
      .groupBy(col("c_mktsegment"), col("b"))
      .agg(sum(col("num")).as("num"), sum(col("den")).as("den"))
      .withColumn("mean_cents", expr("num div den"))
    val rk = rep.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy(col("mean_cents"), col("b"))))
    val ci = rk.groupBy("c_mktsegment").agg(
      max(when(col("rn") === BootLoRank, col("mean_cents"))).as("lo_cents"),
      max(when(col("rn") === BootHiRank, col("mean_cents"))).as("hi_cents"))
    ltv.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        expr("sum(cents) div count(1)").as("mean_cents"))
      .join(ci, Seq("c_mktsegment"))
  }

  /** q160 — REFERENTIAL-INTEGRITY AUDIT: for each FK relationship of
    * the star schema, the exact count of child rows whose parent is
    * missing (orphans) and parent rows no child references
    * (childless) — the ingest-contract check every lake runs before
    * trusting joins (an orphan silently vanishes from every inner
    * join; the reference's pipelines assume these invariants, this
    * table PROVES them). Both directions are anti-join counts — no
    * payload moves, just keys.
    *
    * Scale shape: per relationship one distinct-key projection per
    * side and two anti semi-joins reduced to one-row counts; the
    * three relationship rows union driver-free.
    */
  def q160(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
      // both anti-join directions in ONE full-outer join: a key set
      // missing its counterpart surfaces as a null marker on the other
      // side, so each relationship costs one join + one agg instead of
      // two anti-joins, two aggs, and a crossJoin stitch
      val ck = child.select(col(childKey).as("k")).distinct()
        .withColumn("cm", lit(1))
      val pk = parent.select(col(parentKey).as("k")).distinct()
        .withColumn("pm", lit(1))
      ck.join(pk, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(when(col("pm").isNull, 1L)), lit(0L))
            .as("n_orphan_keys"),
          coalesce(sum(when(col("cm").isNull, 1L)), lit(0L))
            .as("n_childless_parents"))
        .select(lit(rel).as("relationship"), col("n_orphan_keys"),
          col("n_childless_parents"))
    }
    audit("lineitem->orders", t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders"), "o_orderkey")
      .unionAll(audit("orders->customer", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey"))
      .unionAll(audit("lineitem->part", t(s, dir, "lineitem"), "l_partkey",
        t(s, dir, "part"), "p_partkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_benford_audit" -> (q197 _),
    "q183_delta_attribution" -> (q183 _),
    "q180_supplier_hhi" -> (q180 _),
    "q174_also_bought" -> (q174 _),
    "q167_bootstrap_ci" -> (q167 _),
    "q162_column_profile" -> (q162 _),
    "q160_referential_audit" -> (q160 _),
    "q157_join_fanout" -> (q157 _),
    "q142_decayed_popularity" -> (q142 _),
    "q141_hits" -> (q141 _),
    "q135_compaction_plan" -> (q135 _),
    "q133_cooccurrence" -> (q133 _),
    "q121_group_trend" -> (q121 _),
    "q01_group_agg" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_like_prefix" -> (q03 _),
    "q04_topn" -> (q04 _),
    "q05_day_trunc" -> (q05 _),
    "q06_join_chain" -> (q06 _),
    "q07_left_join" -> (q07 _),
    "q08_left_join_residual" -> (q08 _),
    "q09_composite_key_join" -> (q09 _),
    "q13_expr_key_join" -> (q13 _),
    "q14_exact_ts_join" -> (q14 _),
    "q15_anti_join" -> (q15 _),
    "q16_semi_join" -> (q16 _),
    "q17_coalesce_precedence" -> (q17 _),
    "q18_ratio_counts" -> (q18 _),
    "q20_union_distinct" -> (q20 _),
    "q21_minmax_window" -> (q21 _))

  /** One unrolled HITS round (auth half-step then hub half-step, each
    * a join-sum plus scalar-max normalization), generated per round
    * index so the oracle replays exactly [[HitsIters]] rounds.
    */
  private def hitsRoundSql(i: Int): String = {
    val sc = graft.operators.Hits.Scale
    s"""a${i}r AS (SELECT p, CAST(sum(s) AS BIGINT) AS s
       |  FROM e JOIN h${i - 1} USING (c) GROUP BY p),
       |a$i AS (SELECT p, (s * $sc) // (SELECT max(s) FROM a${i}r) AS s FROM a${i}r),
       |h${i}r AS (SELECT c, CAST(sum(s) AS BIGINT) AS s
       |  FROM e JOIN a$i USING (p) GROUP BY c),
       |h$i AS (SELECT c, (s * $sc) // (SELECT max(s) FROM h${i}r) AS s FROM h${i}r)""".stripMargin
  }

  private def q141OracleSql: String = q141OracleSqlFor(HitsIters)

  /** The [[q141]] unrolled-SQL oracle for a caller-chosen round count
    * (see [[q141For]] — the reduced-round scale check).
    */
  private[graft] def q141OracleSqlFor(iters: Int): String =
    s"""WITH e AS (
       | SELECT DISTINCT o_custkey AS c, l_partkey AS p
       | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |h0 AS (SELECT DISTINCT c, CAST(${graft.operators.Hits.Scale} AS BIGINT) AS s FROM e),
       |${(1 to iters).map(hitsRoundSql).mkString(",\n")}
       |SELECT 'hub' AS side, c AS id, CAST(s AS BIGINT) AS score FROM h$iters
       |UNION ALL
       |SELECT 'auth' AS side, p AS id, CAST(s AS BIGINT) AS score FROM a$iters""".stripMargin

  val oracles: Map[String, String] = Map(
    "q197_benford_audit" -> {
      val expList = BenfordExp1e6.mkString("[", ", ", "]")
      s"""WITH c AS (
        | SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |   AS VARCHAR), 1, 1) AS BIGINT) AS digit
        | FROM orders
        | WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1),
        |h AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
        |      FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
        |SELECT h.digit, h.n,
        | CAST((h.n * 1000000) // t.total AS BIGINT) AS obs_1e6,
        | CAST(($expList)[CAST(h.digit AS INT)] AS BIGINT) AS exp_1e6,
        | CAST(abs((h.n * 1000000) // t.total
        |   - ($expList)[CAST(h.digit AS INT)]) AS BIGINT) AS dev_1e6
        |FROM h, t""".stripMargin
    },
    "q183_delta_attribution" ->
      s"""WITH seg AS (
        | SELECT o_orderpriority AS segment,
        |  CAST(coalesce(sum(CASE WHEN o_orderdate < TIMESTAMP '$AttribSplit'
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
        |    AS BIGINT) AS c1,
        |  CAST(coalesce(sum(CASE WHEN o_orderdate >= TIMESTAMP '$AttribSplit'
        |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
        |    AS BIGINT) AS c2
        | FROM orders GROUP BY 1),
        |d AS (SELECT *, c2 - c1 AS delta FROM seg),
        |tot AS (SELECT CAST(sum(delta) AS BIGINT) AS total_delta FROM d)
        |SELECT d.segment, d.c1, d.c2, d.delta,
        | CAST(CASE WHEN t.total_delta <> 0
        |   THEN round(CAST(d.delta AS DOUBLE) * 1000000.0 / t.total_delta, 0)
        |  END AS BIGINT) AS contribution_1e6,
        | CAST(row_number() OVER (ORDER BY abs(d.delta) DESC, d.segment ASC)
        |   AS BIGINT) AS rank
        |FROM d CROSS JOIN tot t""".stripMargin,
    "q180_supplier_hhi" ->
      """WITH r AS (
        | SELECT p.p_type, l.l_suppkey,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
        |    AS HUGEINT) AS c
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        | GROUP BY 1, 2)
        |SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
        | CAST(sum(c) AS BIGINT) AS revenue_cents,
        | CAST(sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
        |   AS hhi_1e6
        |FROM r GROUP BY 1""".stripMargin,
    "q174_also_bought" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |ok AS (SELECT o FROM items GROUP BY o HAVING count(*) <= $CoocMaxBasket),
        |kept AS (SELECT i.o, i.p FROM items i JOIN ok ON i.o = ok.o),
        |pc AS (
        | SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
        | FROM kept a JOIN kept b ON a.o = b.o AND a.p < b.p
        | GROUP BY 1, 2 HAVING count(*) >= $CoocMinSupport),
        |sym AS (
        | SELECT part_a AS part, part_b AS rec, n_ab FROM pc
        | UNION ALL
        | SELECT part_b AS part, part_a AS rec, n_ab FROM pc),
        |rk AS (
        | SELECT part, rec, n_ab, CAST(row_number() OVER
        |   (PARTITION BY part ORDER BY n_ab DESC, rec ASC) AS BIGINT) AS rank
        | FROM sym)
        |SELECT part, rank, rec, n_ab FROM rk WHERE rank <= $AlsoBoughtK""".stripMargin,
    "q167_bootstrap_ci" ->
      s"""WITH ltv AS (
        | SELECT c.c_mktsegment, c.c_custkey,
        |  CAST(coalesce(o.cents, 0) AS BIGINT) AS cents
        | FROM customer c LEFT JOIN (
        |  SELECT o_custkey,
        |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |  FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey),
        |rep AS (
        | SELECT c_mktsegment, b,
        |  CAST(sum(w4 * cents) AS BIGINT) // CAST(sum(w4) AS BIGINT)
        |   AS mean_cents
        | FROM (
        |  SELECT l.c_mktsegment, l.cents, t.i AS b,
        |   CAST(round(-ln((CAST(concat('0x', substr(md5(concat('bb-',
        |     CAST(l.c_custkey AS VARCHAR), '-', CAST(t.i AS VARCHAR))),
        |     1, 8)) AS BIGINT) + 1) / 4294967296.0) * 10000) AS BIGINT) AS w4
        |  FROM ltv l CROSS JOIN unnest(range(0, $BootB)) AS t(i))
        | GROUP BY 1, 2),
        |rk AS (
        | SELECT c_mktsegment, b, mean_cents,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY mean_cents, b) AS rn
        | FROM rep),
        |ci AS (
        | SELECT c_mktsegment,
        |  CAST(max(CASE WHEN rn = $BootLoRank THEN mean_cents END) AS BIGINT)
        |    AS lo_cents,
        |  CAST(max(CASE WHEN rn = $BootHiRank THEN mean_cents END) AS BIGINT)
        |    AS hi_cents
        | FROM rk GROUP BY 1),
        |pt AS (
        | SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(sum(cents) AS BIGINT) // count(*) AS BIGINT) AS mean_cents
        | FROM ltv GROUP BY 1)
        |SELECT pt.c_mktsegment, pt.n_customers, pt.mean_cents,
        | ci.lo_cents, ci.hi_cents
        |FROM pt JOIN ci USING (c_mktsegment)""".stripMargin,
    "q162_column_profile" -> {
      def profile(c: String, canon: String => String): String =
        s"""SELECT '$c' AS column_name,
           | CAST(sum(cnt) AS BIGINT) AS n_rows,
           | CAST(coalesce(sum(CASE WHEN v IS NULL THEN cnt END), 0)
           |   AS BIGINT) AS n_nulls,
           | CAST(count(v) AS BIGINT) AS n_distinct,
           | ${canon("min(v)")} AS min_value,
           | ${canon("max(v)")} AS max_value
           |FROM (SELECT $c AS v, count(*) AS cnt FROM orders GROUP BY 1)""".stripMargin
      val str = (e: String) => s"CAST($e AS VARCHAR)"
      val ts = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      Seq(profile("o_orderkey", str), profile("o_custkey", str),
        profile("o_orderstatus", str), profile("o_totalprice", str),
        profile("o_orderdate", ts), profile("o_orderpriority", str))
        .mkString("\nUNION ALL\n")
    },
    "q160_referential_audit" -> {
      def audit(rel: String, child: String, ck: String,
                parent: String, pk: String): String =
        s"""SELECT '$rel' AS relationship,
           | CAST((SELECT count(*) FROM (SELECT DISTINCT $ck AS k FROM $child) c
           |   WHERE c.k NOT IN (SELECT $pk FROM $parent)) AS BIGINT)
           |   AS n_orphan_keys,
           | CAST((SELECT count(*) FROM (SELECT DISTINCT $pk AS k FROM $parent) p
           |   WHERE p.k NOT IN (SELECT $ck FROM $child)) AS BIGINT)
           |   AS n_childless_parents""".stripMargin
      Seq(audit("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        audit("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        audit("lineitem->part", "lineitem", "l_partkey",
          "part", "p_partkey")).mkString("\nUNION ALL\n")
    },
    "q157_join_fanout" -> {
      def statsFor(k: String): String =
        s"""SELECT '$k' AS join_key, CAST(count(*) AS BIGINT) AS n_keys,
           | CAST(sum(c * c) AS BIGINT) AS self_join_rows,
           | CAST(max(c) AS BIGINT) AS max_key_rows
           |FROM (SELECT CAST(count(*) AS HUGEINT) AS c
           |      FROM lineitem GROUP BY $k)""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(statsFor)
        .mkString("\nUNION ALL\n")
    },
    "q142_decayed_popularity" ->
      s"""WITH po AS (
        | SELECT DISTINCT l_partkey AS p, o_orderkey AS o,
        |  CAST(o_orderdate AS DATE) AS d
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |w AS (
        | SELECT p, ($DecayScale >> least(greatest(
        |   date_diff('day', d, DATE '$DecayRef') // $HalfLifeDays, 0), 62)) AS wt
        | FROM po)
        |SELECT p AS part, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(wt) AS BIGINT) AS decayed_2p20
        |FROM w GROUP BY 1""".stripMargin,
    "q141_hits" -> q141OracleSql,
    "q135_compaction_plan" ->
      s"""WITH f AS (
        | SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS p_month,
        |  CAST(l_shipdate AS DATE) AS file_day,
        |  CAST(count(*) * $CompactRowBytes AS BIGINT) AS bytes
        | FROM lineitem GROUP BY 1, 2),
        |c AS (
        | SELECT p_month, file_day, bytes,
        |  CAST(sum(bytes) OVER (PARTITION BY p_month ORDER BY file_day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
        | FROM f)
        |SELECT p_month, file_day, bytes, cum_bytes,
        | CAST((cum_bytes - bytes) // $CompactTargetBytes AS BIGINT) AS bin_id
        |FROM c""".stripMargin,
    "q133_cooccurrence" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_baskets FROM items),
        |ic AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1),
        |ok AS (SELECT o FROM items GROUP BY o HAVING count(*) <= $CoocMaxBasket),
        |kept AS (SELECT i.o, i.p FROM items i JOIN ok ON i.o = ok.o),
        |pc AS (
        | SELECT a.p AS part_a, b.p AS part_b, CAST(count(*) AS BIGINT) AS n_ab
        | FROM kept a JOIN kept b ON a.o = b.o AND a.p < b.p
        | GROUP BY 1, 2 HAVING count(*) >= $CoocMinSupport)
        |SELECT pc.part_a, pc.part_b, pc.n_ab, ia.n AS n_a, ib.n AS n_b,
        | t.n_baskets,
        | CAST((pc.n_ab * t.n_baskets * 1000000) // (ia.n * ib.n) AS BIGINT)
        |   AS lift_1e6
        |FROM pc
        |JOIN ic ia ON pc.part_a = ia.p
        |JOIN ic ib ON pc.part_b = ib.p
        |CROSS JOIN tot t""".stripMargin,
    "q121_group_trend" ->
      """WITH b AS (
        | SELECT l_returnflag, CAST(l_quantity AS HUGEINT) AS x,
        |  CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
        | FROM lineitem),
        |a AS (
        | SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |  sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
        | FROM b GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        | CAST(((n * sxy - sx * sy) * 1000000)
        |   // (n * sxx - sx * sx) AS BIGINT) AS slope_1e6,
        | CAST(((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) * 1000000)
        |   // (n * (n * sxx - sx * sx)) AS BIGINT) AS intercept_1e6
        |FROM a""".stripMargin,
    "q01_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        | round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
        | round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
        | round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity > 30""".stripMargin,
    "q03_like_prefix" ->
      "SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE 'small%'",
    "q04_topn" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_orderstatus <> 'F'
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q05_day_trunc" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_day,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS day_total
        |FROM orders GROUP BY 1""".stripMargin,
    "q06_join_chain" ->
      """SELECT n_name,
        | round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q07_left_join" ->
      """SELECT c_custkey,
        | CAST(count(o_orderkey) AS BIGINT) AS n_big,
        | round(CAST(max(o_totalprice) AS DOUBLE), 2) AS max_big
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q08_left_join_residual" ->
      """SELECT o_orderkey, CAST(count(l_linenumber) AS BIGINT) AS n_early_lines
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin,
    "q09_composite_key_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |JOIN (SELECT l_orderkey, max(l_linenumber) AS l_linenumber
        |      FROM lineitem GROUP BY l_orderkey) last
        |USING (l_orderkey, l_linenumber)""".stripMargin,
    "q13_expr_key_join" ->
      """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | max(s_name) AS supplier_name
        |FROM documents LEFT JOIN supplier
        |  ON CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) = s_suppkey
        |GROUP BY 1""".stripMargin,
    "q14_exact_ts_join" ->
      """SELECT a.o_orderdate AS order_date, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM orders a JOIN orders b ON a.o_orderdate = b.o_orderdate
        |WHERE a.o_orderpriority = '1-URGENT' AND a.o_orderkey <> b.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q15_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q16_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00')""".stripMargin,
    "q17_coalesce_precedence" ->
      """SELECT o_orderkey,
        | COALESCE(f.first_part, l.last_part, -1) AS resolved_part
        |FROM orders
        |LEFT JOIN (SELECT l_orderkey, min(l_partkey) AS first_part FROM lineitem
        |           WHERE l_linenumber = 1 GROUP BY l_orderkey) f ON o_orderkey = f.l_orderkey
        |LEFT JOIN (SELECT l_orderkey, l_partkey AS last_part FROM (
        |            SELECT l_orderkey, l_partkey, row_number() OVER (
        |              PARTITION BY l_orderkey
        |              ORDER BY l_linenumber DESC, l_partkey DESC) AS rn
        |            FROM lineitem) WHERE rn = 1) l ON o_orderkey = l.l_orderkey""".stripMargin,
    "q18_ratio_counts" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | round(CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) * 100.0
        |   / count(*) AS DOUBLE), 4) AS pct_open
        |FROM orders GROUP BY 1""".stripMargin,
    "q20_union_distinct" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_day FROM orders
        |WHERE o_orderstatus = 'F'
        |UNION
        |SELECT CAST(o_orderdate AS DATE) AS order_day FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q21_minmax_window" ->
      """SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin)
}
