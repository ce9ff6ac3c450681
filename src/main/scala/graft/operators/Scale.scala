package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-technique operators: the shuffle-shaping tools a 100 TB
  * deployment reaches for when the default hash partitioning isn't
  * enough (SURVEY.md §5).
  */
object Scale {

  /** Two-phase salted aggregation: spread each hot group key over
    * `saltFactor` sub-keys for the first (heavy) partial aggregation,
    * then combine the partials in a second (tiny) aggregation.
    *
    * Use when one group key dominates the data (power-law keys): the
    * first shuffle spreads the hot key across `saltFactor` reducers
    * instead of melting one. Aggregates must be decomposable — pass
    * the partial and final expressions separately.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      saltFactor: Int,
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** `q_salted_agg` — the events-per-type aggregation through the
    * salted two-phase path; the oracle is the PLAIN single-phase
    * aggregation, proving the decomposition is exact.
    */
  def qSaltedAgg(t: Tables): DataFrame =
    saltedAgg(
      t.events,
      keys = Seq(col("event_type")),
      saltFactor = 16,
      partial = Seq(count(lit(1)).as("pn"), sum(col("value")).as("ps")),
      finalAgg = Seq(
        sum(col("pn")).as("n"),
        round(sum(col("ps")), 2).as("sum_value")))

  /** Salted skew join: equi-join where one key dominates the probe
    * side. The probe side salts each row into one of `saltFactor`
    * sub-keys; the (small-per-key) build side replicates each row
    * across ALL `saltFactor` sub-keys, so the hot key's rows spread
    * over `saltFactor` reducers instead of melting one. Exact for any
    * equi-join: every probe row still meets every matching build row
    * exactly once. The manual form of what AQE's skew-join split does
    * at runtime — needed when the skew is known ahead of time or AQE's
    * per-partition thresholds miss it (one giant key inside an
    * otherwise-average partition).
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      key: String, saltFactor: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** `q_salted_join` — events joined to per-user order counts through
    * the salted path, reduced to a per-event-type summary; the oracle
    * is the PLAIN join + aggregation, proving the salting is exact.
    */
  def qSaltedJoin(t: Tables): DataFrame = {
    val userOrders = t.orders
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    saltedJoin(t.events, userOrders, "user_id", saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_orders")).as("sum_orders"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Banded range self-join: pairs of same-user events at most
    * `bandUs` apart in time. A raw inequality join plans as a
    * nested-loop (per-user cartesian — quadratic in the hottest user);
    * bucketizing time into band-width buckets turns it into an
    * EQUI-join on (user, bucket): the later event sits in exactly one
    * bucket, the earlier event probes its own bucket and the next, so
    * every qualifying pair is met exactly once and non-qualifying
    * candidates are bounded by two buckets' width. The standard
    * interval/band-join rewrite for time-window pairing at scale.
    */
  def qRangeJoinBanded(t: Tables, bandUs: Long = 60000000L): DataFrame = {
    val e = t.events.select(col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val earlier = e.select(col("user_id"), col("us").as("a_us"))
      .withColumn("bkt", explode(array(
        expr(s"a_us DIV $bandUs"), expr(s"a_us DIV $bandUs + 1"))))
    val later = e.select(col("user_id"), col("us").as("b_us"))
      .withColumn("bkt", expr(s"b_us DIV $bandUs"))
    earlier.join(later, Seq("user_id", "bkt"))
      .filter(col("b_us") > col("a_us") && col("b_us") - col("a_us") <= bandUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** `q_interval_overlap` — interval×interval OVERLAP self-join:
    * per customer, how many pairs of their orders were concurrently
    * "open" (fulfillment span = order date → last line shipment, end
    * clamped to ≥ start — the synthetic data ships some lines before
    * the order date). The interval-overlap complement to
    * [[qRangeJoinBanded]]'s point-in-band pairing: both endpoints
    * range over intervals, the classic concurrency/resource-contention
    * query.
    *
    * Scale shape — the GRID interval join (the standard rewrite
    * Spark lacks natively): a raw `a.s <= b.e AND b.s <= a.e` join
    * plans as a per-key nested loop; instead each interval is
    * exploded to the `span/bucketDays + 1` grid cells it touches and
    * candidates meet in an EQUI-join on (customer, cell). Every
    * overlapping pair shares at least the cell containing the LATER
    * start, so counting a pair only in that one cell
    * (`cell == greatest(s_a, s_b) DIV w`) makes the grid join EXACT —
    * no distinct pass needed. Fan-out is bounded by max-span/w + 1
    * (≤5 at w=640d here; size w to the span distribution), candidate
    * pairs by cell co-residency, and the per-key loop never
    * materializes. All integer day arithmetic — deterministic
    * cross-engine. */
  def qIntervalOverlap(t: Tables, bucketDays: Int = 640): DataFrame = {
    val spans = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("s"))
      .agg(max(datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
        .cast("long")).as("ls"))
      .select(col("o_orderkey"), col("o_custkey"), col("s"),
        greatest(col("s"), col("ls")).as("e"))
    val cells = spans.withColumn("bkt",
      explode(sequence(expr(s"s DIV $bucketDays"), expr(s"e DIV $bucketDays"))))
    val a = cells.select(col("o_custkey"), col("bkt"), col("o_orderkey").as("ka"),
      col("s").as("sa"), col("e").as("ea"))
    val b = cells.select(col("o_custkey"), col("bkt"), col("o_orderkey").as("kb"),
      col("s").as("sb"), col("e").as("eb"))
    a.join(b, Seq("o_custkey", "bkt"))
      .filter(col("ka") < col("kb") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("bkt") === expr(s"greatest(sa, sb) DIV $bucketDays"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  /** `q_interval_overlap_auto` — the SAME overlap-join class written
    * the way a SQL user writes it: a bare inequality join with NO
    * equi key (supplier activity spans × customer activity spans,
    * "which suppliers were active while this customer was buying"),
    * which Spark alone can only plan as a nested loop. The
    * [[graft.plans.IntervalOverlapRewrite]] optimizer rule fires on
    * exactly this shape and turns it into the grid equi-join
    * [[qIntervalOverlap]] builds by hand — the operator exists to
    * keep the RULE on the driver's correctness gate and in the bench
    * (plan-pinned: no nested loop in the final plan). All integer day
    * arithmetic; the oracle is the plain inequality join. */
  def qIntervalOverlapAuto(t: Tables): DataFrame = {
    val epoch = lit("1992-01-01")
    // sparse slices (max-quantity lines, urgent orders) so the spans
    // vary — the unfiltered activity spans all cover the full horizon
    // and every pair would overlap trivially
    val supSpan = t.lineitem.filter(col("l_quantity") >= 49)
      .groupBy(col("l_suppkey"))
      .agg(datediff(to_date(min(col("l_shipdate"))), epoch).cast("long").as("ss"),
        datediff(to_date(max(col("l_shipdate"))), epoch).cast("long").as("se"))
    val custSpan = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(datediff(to_date(min(col("o_orderdate"))), epoch).cast("long").as("cs"),
        datediff(to_date(max(col("o_orderdate"))), epoch).cast("long").as("ce"))
    supSpan.join(custSpan, col("ss") <= col("ce") && col("cs") <= col("se"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_overlapping_customers"))
  }

  /** E213b — `q_abs_band_auto`: the consumer of
    * [[graft.plans.AbsBandJoinRewrite]] — writes the NAIVE
    * `abs(a − b) <= c` join (the way a SQL analyst would) and relies
    * on the OPTIMIZER to band it: close-in-value supplier/customer
    * account-balance pairs across the two ledgers (the fuzzy
    * reconciliation probe a finance review runs — who on each side
    * carries a near-identical balance). Cents cast to exact int64;
    * no other cross-side predicate, so without the rule this is a
    * nested loop over suppliers × customers — the plan-pin spec
    * asserts the banded equi-join fired. The oracle states the
    * plain predicate; the rewrite's exactness is its proof
    * obligation (the `q_interval_overlap_auto` discipline). */
  def qAbsBandAuto(t: Tables, bandCents: Int = 500): DataFrame = {
    val sup = t.supplier.select(col("s_suppkey"),
      round(col("s_acctbal") * 100).cast("long").as("s_cents"))
    val cust = t.customer.select(col("c_custkey"),
      round(col("c_acctbal") * 100).cast("long").as("c_cents"))
    sup.join(cust, abs(col("s_cents") - col("c_cents")) <= bandCents)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_close_customers"),
        min(abs(col("s_cents") - col("c_cents"))).as("closest_cents"))
  }

  /** `q_skyline` — the SKYLINE (Pareto frontier) operator, public
    * Börzsönyi–Kossmann–Stocker 2001: parts no other part dominates
    * on (price ↓, size ↑) — cheaper-and-bigger beats, the classic
    * multi-criteria shortlist relational algebra lacks. A frontier
    * is the "best tradeoffs" readout a top-k on any single weighted
    * score can't give.
    *
    * Distributed shape — the 2-D sort-based skyline WITHOUT the
    * single-partition global window a naive running-max needs: prices
    * quantize to an exact integer grid (floor(p·10 + 0.5) — the data
    * is 0.1-stepped, so the grid is a monotone bijection and
    * dominance is unchanged), then the strict-prefix maximum of size
    * over increasing price splits two-level exactly like the
    * `corpus_token_shards` prefix sum: per-price partial-agg maxima,
    * within-BUCKET prefix windows (keyed by price DIV width), and a
    * bucket-level prefix over the per-bucket maxima — a
    * metadata-scale frame (#buckets rows). A point survives iff no
    * strictly-cheaper point is at least as big AND no same-price
    * point is strictly bigger — all exact integer compares, so the
    * DuckDB NOT-EXISTS oracle (the O(n²) definition, affordable at
    * oracle SF) replays it bit-exact. */
  def qSkyline(t: Tables, bucketWidth: Long = 128): DataFrame = {
    val pts = t.part.select(col("p_partkey"), col("p_retailprice"),
      floor(col("p_retailprice") * 10 + lit(0.5)).cast("long").as("ix"),
      col("p_size").cast("long").as("y"))
    val perX = pts.groupBy(col("ix")).agg(max(col("y")).as("mx"))
      .withColumn("bkt", expr(s"ix DIV $bucketWidth"))
    // strict-prefix max of mx over distinct prices, two-level
    val wInBucket = Window.partitionBy(col("bkt")).orderBy(asc("ix"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inb = perX.withColumn("inb", max(col("mx")).over(wInBucket))
    val bMax = perX.groupBy(col("bkt")).agg(max(col("mx")).as("bm"))
    // #buckets rows (price-span / width) — metadata-scale by design,
    // the one place a global window is the RIGHT call
    val wBuckets = Window.orderBy(asc("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bPre = bMax.withColumn("pre", max(col("bm")).over(wBuckets))
    val xStats = inb.join(bPre.select(col("bkt"), col("pre")), Seq("bkt"))
      .select(col("ix"), col("mx"),
        greatest(coalesce(col("inb"), lit(-1L)), coalesce(col("pre"), lit(-1L)))
          .as("maxy_lt"))
    pts.join(xStats, Seq("ix"))
      // survive iff nothing strictly cheaper is ≥ y, and nothing at the
      // same price is > y (mx ≥ y always, so mx ≤ y means y == mx)
      .filter(col("maxy_lt") < col("y") && col("mx") <= col("y"))
      .select(col("p_partkey"), col("p_retailprice"), col("y").as("p_size"))
  }

  /** `q_approx_stats` — sketch aggregates per event type: HyperLogLog++
    * distinct users and approximate percentiles. Fixed-size sketches
    * merge associatively, so at 100 TB these cost one narrow shuffle of
    * O(sketch) state per group versus an exact distinct's full-width
    * shuffle. Rows-only check (sketch values are engine-specific);
    * ApproxSpec asserts the estimates against exact answers.
    */
  def qApproxStats(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_median"))

  /** `q_approx_stats_bounded` — the VALUE GATE for [[qApproxStats]]:
    * sketch estimates are engine-specific (rows-only at the gate),
    * but their ERROR BUDGET is not — this twin joins the sketches
    * against their exact answers and emits per-group verdict columns
    * the oracle asserts as the literal "ok": HLL++ distinct within
    * 15% of the exact count (default rsd 5%, 3σ), the approx median
    * inside the exact [p45, p55] value band (accuracy 10000 ⇒ rank
    * error ≤ n/10000, orders tighter). A sketch regression now fails
    * THIS named entry loudly instead of hiding behind rows-only. */
  def qApproxStatsBounded(t: Tables): DataFrame = {
    val approx = qApproxStats(t)
    val exact = t.events.groupBy(col("event_type").as("et"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        percentile(col("value"), lit(0.45)).as("p45"),
        percentile(col("value"), lit(0.55)).as("p55"))
    approx.join(exact, col("event_type") === col("et"))
      .select(col("event_type"), col("n"),
        when(abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.15, lit("ok"))
          .otherwise(concat(lit("FAIL:"), col("approx_users"),
            lit("/"), col("exact_users"))).as("users_ok"),
        when(col("approx_median").between(col("p45"), col("p55")),
            lit("ok"))
          .otherwise(concat(lit("FAIL:"), col("approx_median")))
          .as("median_ok"))
      .orderBy(col("event_type"))
  }

  /** `q_upsert_latest` — merge-on-read upsert resolution: a base table
    * unioned with a change set, one key-window rank keeping the
    * highest-version row per key — how an incremental ingest without a
    * transactional table format applies updates (the compaction job
    * materializes this view back out). The change set here is
    * deterministic (every 10th order re-priced at version 1) so the
    * resolution is oracle-checkable end-to-end.
    *
    * Shape: union is exchange-free; the rank is ONE key-partitioned
    * window — the same single shuffle a MERGE's join would pay, but
    * with no build side to size. At 100 TB the base side arrives
    * bucketed by the key and only the (small) change set shuffles.
    */
  def qUpsertLatest(t: Tables): DataFrame = {
    val base = t.orders.select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice"), lit(0).as("version"))
    val changes = t.orders.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("1-URGENT").as("o_orderpriority"),
        round(col("o_totalprice") * 1.1 + lit(1e-9), 2).as("o_totalprice"),
        lit(1).as("version"))
    base.unionByName(changes)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderkey")).orderBy(desc("version"))))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        col("version"))
  }

  /** `q_scd2_history` — slowly-changing-dimension TYPE 2 history
    * build, the warehouse companion to [[qUpsertLatest]]'s SCD1
    * latest-wins: each user's daily observed status (their day's last
    * event type, ties broken by event id — deterministic argmax) is
    * run-length compressed into `[valid_from, valid_to)` versions via
    * gaps-and-islands (change flag → running-sum island id → per-run
    * rollup), with `valid_to` = the NEXT version's start (exclusive;
    * a version stays valid across unobserved days) and the open
    * version flagged `is_current` — the dimension-table shape every
    * point-in-time join consumes.
    *
    * Shape: every window is partitioned by `user_id` (the argmax, the
    * change flag, the island running sum, the lead) — one user-keyed
    * shuffle then co-partitioned window passes, per-user state O(days
    * per user); no global window anywhere, so the build scales as
    * users do. Days are integer offsets and the change/island chain
    * is integer-exact — bit-identical cross-engine.
    */
  def qScd2History(t: Tables): DataFrame =
    finishDim(runsOf(dayStatus(scd2Events(t))))
      .orderBy(col("user_id"), col("valid_from"))

  /** Events projected to the SCD2 build's working columns (day index,
    * status candidate, tiebreak keys). A day-range filter between this
    * projection and the windows is free: every window below partitions
    * by (at least) `user_id`, and [[dayStatus]]'s argmax partitions by
    * (user_id, day), so filtering whole days never cuts a window
    * partition in half. */
  private[graft] def scd2Events(t: Tables): DataFrame =
    t.events.select(col("user_id"),
      datediff(col("ts").cast("date"),
        lit(java.sql.Date.valueOf("2024-01-01"))).as("day"),
      col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))

  /** (user_id, day, status): each user's daily observed status — the
    * day's LAST event type, event-id tiebroken (deterministic argmax). */
  private def dayStatus(proj: DataFrame): DataFrame =
    proj
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("day"))
          .orderBy(desc("us"), desc("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("event_type").as("status"))

  /** Gaps-and-islands run-length compression of the daily statuses:
    * (user_id, status, valid_from, n_days_observed), one row per
    * maximal same-status run. All windows user-partitioned. */
  private def runsOf(daily: DataFrame): DataFrame = {
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    daily
      .withColumn("chg",
        when(lag(col("status"), 1).over(byDay).isNull ||
          lag(col("status"), 1).over(byDay) =!= col("status"), 1).otherwise(0))
      .withColumn("island", sum(col("chg")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"), col("status"))
      .agg(min(col("day")).as("valid_from"),
        count(lit(1)).as("n_days_observed"))
      .select(col("user_id"), col("status"), col("valid_from"),
        col("n_days_observed"))
  }

  /** Chain the runs into the dimension shape: `valid_to` = next
    * version's start (exclusive), open version flagged `is_current`. */
  private def finishDim(runs: DataFrame): DataFrame = {
    val byFrom = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .select(col("user_id"), col("status"),
        col("valid_from").cast("int").as("valid_from"),
        col("valid_to").cast("int").as("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("n_days_observed"))
  }

  // stored SCD2 dimension state: "yesterday's" scheduled dimension
  // build as a user-bucketed catalog table, memoized per (session,
  // dataset, split) like the ANN history index — the artifact the
  // daily CDC merge maintains instead of rebuilding
  private val scd2StateCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), String]

  private[graft] def scd2State(t: Tables, splitDay: Int): String =
    scd2StateCache.synchronized {
      import graft.sources.{SourceOps, Sources}
      scd2StateCache.getOrElseUpdate(
        (SourceOps.sessionTag(t.spark), t.dir, splitDay), {
          val tag = s"${SourceOps.runId}_${SourceOps.dirTag(t.dir)}_$splitDay"
          val table = s"graft_scd2_dim_$tag"
          val hist = finishDim(runsOf(dayStatus(
            scd2Events(t).filter(col("day") < splitDay))))
          Sources.writeBucketed(hist, table, Seq("user_id"), nBuckets = 8,
            sortCols = Seq("user_id"),
            path = Some(SourceOps.staging(s"scd2_dim_$tag")))
          table
        })
    }

  /** Force the stored SCD2 dimension for the bench's explicit
    * state-build step (the history build is a separate scheduled job
    * in production — its cost must not land on the merge query). */
  private[graft] def prebuildScd2State(t: Tables, splitDay: Int = 25): Unit = {
    scd2State(t, splitDay); ()
  }

  /** `q_scd2_merge` — INCREMENTAL SCD2 maintenance, the production CDC
    * shape [[qScd2History]]'s full rebuild stands in for: yesterday's
    * dimension is a STORED user-bucketed catalog table, today's events
    * (day ≥ `splitDay`) are the increment, and the merge
    * closes / extends / appends versions without ever recomputing
    * history — at 100 TB the daily dimension rebuild is the first job
    * a warehouse refuses to run, while this merge's cost scales with
    * the increment plus the touched slice of the dimension.
    *
    * Per touched user, only the OPEN version can change (closed
    * versions' `[valid_from, valid_to)` chains never cross the day
    * boundary, because every history day < `splitDay` ≤ every
    * increment day):
    *
    *  - first increment run has the SAME status → the open version
    *    EXTENDS: the run inherits its `valid_from` and adds its
    *    observed-day count (run-length compression can't see the
    *    boundary);
    *  - different status → the open version CLOSES at the first run's
    *    start and the runs append as new versions;
    *  - users absent from the increment pass through untouched; brand
    *    new users simply append.
    *
    * Merge == recompute by construction (the full rebuild's island
    * sequence is the history islands plus the increment islands, with
    * at most the boundary pair fused) — and the oracle is the full
    * rebuild's SQL VERBATIM, so the equivalence is hash-checked at the
    * gate, the same discipline as `dedup_clusters_incremental` and
    * `q_incremental_rollup`.
    *
    * Shape: the increment's windows partition by user over increment
    * rows only; the boundary decision is one user-keyed equi-join of
    * the (daily-active-sized) first-run frame against the stored open
    * versions; untouched history is a bucketed scan plus one
    * broadcast anti-join on the touched-user set. Nothing scales with
    * history size except the pass-through scan — which production
    * writes straight back out as the new dimension. */
  def qScd2Merge(t: Tables, splitDay: Int = 25): DataFrame =
    scd2MergeOf(t.spark.table(scd2State(t, splitDay)),
        scd2Events(t).filter(col("day") >= splitDay))
      .orderBy(col("user_id"), col("valid_from"))

  /** The merge CORE: stored dimension + increment events (already in
    * the [[scd2Events]] projection; every increment day must be ≥
    * every `stored` day — the CDC contract) → merged dimension,
    * unordered. Shared by the batch query and the streaming per-day
    * CDC twin, which folds one micro-batch at a time through this. */
  private[graft] def scd2MergeOf(stored: DataFrame, incr: DataFrame): DataFrame = {
    val byFrom = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    // `marked` feeds three consumers below, but its repeated subtree
    // is shuffle-rooted and Catalyst's ReusedExchange already dedupes
    // it inside the one write job (measured: an explicit persist +
    // eager count ADDS a job per commit and reads slower)
    val marked = runsOf(dayStatus(incr))
      .withColumn("rk", row_number().over(byFrom))
    val open = stored.filter(col("is_current"))
      .select(col("user_id"), col("status").as("open_status"),
        col("valid_from").as("open_from"),
        col("n_days_observed").as("open_n"))
    val first = marked.filter(col("rk") === 1)
      .select(col("user_id"), col("status").as("first_status"),
        col("valid_from").as("first_from"))
      .join(open, Seq("user_id"), "left")
    // status changed at the boundary → close the open version there
    val closedOpen = first
      .filter(col("open_status").isNotNull &&
        col("open_status") =!= col("first_status"))
      .select(col("user_id"), col("open_status").as("status"),
        col("open_from").as("valid_from"),
        col("first_from").cast("int").as("valid_to"),
        lit(false).as("is_current"), col("open_n").as("n_days_observed"))
    // status unchanged → the first run absorbs the open version
    val extendInfo = first
      .filter(col("open_status").isNotNull &&
        col("open_status") === col("first_status"))
      .select(col("user_id"), col("open_from"), col("open_n"))
    // extendInfo is CHANGE-sized (a subset of the batch's users):
    // broadcast it so `marked` keeps its window partitioning instead
    // of reshuffling for the join — sound at any table size because
    // the bound is the CDC day, not the dimension
    val newRuns = marked.join(broadcast(extendInfo), Seq("user_id"), "left")
      .select(col("user_id"), col("status"),
        when(col("rk") === 1 && col("open_from").isNotNull, col("open_from"))
          .otherwise(col("valid_from")).as("valid_from"),
        (col("n_days_observed") +
          when(col("rk") === 1 && col("open_n").isNotNull, col("open_n"))
            .otherwise(lit(0L))).as("n_days_observed"))
    val newPart = newRuns
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .select(col("user_id"), col("status"),
        col("valid_from").cast("int").as("valid_from"),
        col("valid_to").cast("int").as("valid_to"),
        col("valid_to").isNull.as("is_current"), col("n_days_observed"))
    val touched = marked.select(col("user_id")).distinct()
    stored.filter(!col("is_current"))
      .unionByName(stored.filter(col("is_current"))
        .join(broadcast(touched), Seq("user_id"), "left_anti"))
      .unionByName(closedOpen)
      .unionByName(newPart)
  }

  /** E210 — `q_join_view_maintenance`: incremental maintenance of a
    * JOIN view — the classic IVM delta identity (Blakeley–Larson–
    * Tompa / the Griffin–Libkin algebra every materialized-view
    * engine implements):
    * Δ(O ⋈ L) = ΔO ⋈ L_old  ∪  O_old ⋈ ΔL  ∪  ΔO ⋈ ΔL,
    * so a stored join-aggregate view updates from the DELTAS without
    * re-joining history — the join-view sibling of
    * `q_incremental_rollup` (additive aggregates) and `q_scd2_merge`
    * (dimension state). The deltas deliberately CUT ACROSS each
    * other (new orders, plus late-arriving lineitems of OLD orders —
    * the case that breaks naive "just aggregate the new facts"
    * maintenance and forces all three identity terms), and the
    * group-level state is additive (count + sum), so the merge is
    * one keyed rollup over the stored view + three delta terms.
    *
    * The ORACLE is the full join recomputed from scratch — the IVM
    * identity itself is what the hash gate proves, the
    * `q_scd2_merge` merge==recompute discipline applied to joins.
    * Money sums round ONCE after the final merge (cent-grid sums
    * dwarf double noise — §6).
    *
    * Shape: the stored view is a #priorities-row table; query-time
    * work is three keyed joins whose sides are each delta-sized on
    * at least one input (ΔO⋈L_old and O_old⋈ΔL are delta × filtered
    * history on the join key; ΔO⋈ΔL is delta × delta) — at 100 TB
    * the history is touched only through the key-pruned join, never
    * re-aggregated. */
  private val joinViewCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def jvOrders(t: Tables): DataFrame =
    t.orders.select(col("o_orderkey"), col("o_orderpriority"),
      (col("o_orderkey") % 7 === 0).as("d_o"))

  private def jvLineitem(t: Tables): DataFrame =
    t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
      ((col("l_orderkey") + col("l_linenumber")) % 5 === 0).as("d_l"))

  private def jvTerm(o: DataFrame, l: DataFrame): DataFrame =
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))

  /** The stored pre-increment view state — aggregated OLD ⋈ OLD,
    * staged once per (session, dataset) (the scd2State discipline);
    * `_build_join_view` exposes its cost as a bench entry. */
  private[graft] def joinViewState(t: Tables): String =
    joinViewCache.getOrElseUpdate(
      (graft.sources.SourceOps.sessionTag(t.spark), t.dir), {
        val p = graft.sources.SourceOps.staging(
          s"join_view_${graft.sources.SourceOps.dirTag(t.dir)}")
        jvTerm(jvOrders(t).filter(!col("d_o")),
            jvLineitem(t).filter(!col("d_l")))
          .write.mode("overwrite").parquet(p)
        p
      })

  private[graft] def prebuildJoinView(t: Tables): Unit = {
    joinViewState(t); ()
  }

  def qJoinViewMaintenance(t: Tables): DataFrame = {
    val v0 = t.spark.read.parquet(joinViewState(t))
    val (o, l) = (jvOrders(t), jvLineitem(t))
    val (oOld, oNew) = (o.filter(!col("d_o")), o.filter(col("d_o")))
    val (lOld, lNew) = (l.filter(!col("d_l")), l.filter(col("d_l")))
    v0.unionByName(jvTerm(oNew, lOld))
      .unionByName(jvTerm(oOld, lNew))
      .unionByName(jvTerm(oNew, lNew))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n_items"),
        round(sum(col("s")), 2).as("revenue"))
  }

  /** E205 — `q_dim_time_travel`: snapshot-to-snapshot dimension AUDIT
    * through [[graft.sources.MergeTarget]]'s versioned reads — the
    * time-travel consumer the MERGE sink exists for (Delta's
    * `VERSION AS OF` shape): seed the target with the stored pre-CDC
    * dimension (version 0), MERGE the increment (version 1), then
    * read BOTH versions and classify every dimension row by what the
    * CDC day did to it — `added` (new version row), `closed` (the
    * open version got its `valid_to`), `extended` (still open, more
    * observed days), `unchanged`. The per-class row/user counts are
    * the audit a warehouse review reads after every merge window —
    * and the readout is impossible without versioned snapshots, which
    * is the point: the bare-parquet fold this target replaced
    * overwrote its own history.
    *
    * Classification order matters (an open version can both extend
    * and later close inside one increment — `closed` wins, both
    * engines evaluate the same CASE order). A version row can never
    * DISAPPEAR across the merge (history days < split ≤ increment
    * days ⇒ every stored `valid_from` survives), so the diff is a
    * left-complete full-outer join on (user, valid_from) — spec-
    * pinned by the no-vanished-rows assertion.
    *
    * Shape: one CDC merge (the `q_scd2_merge` plan verbatim), two
    * pinned version scans, one user-keyed full-outer join on the
    * metadata-scale dimension, one 4-row rollup. The oracle rebuilds
    * both snapshots from raw events (truncated and full SCD2 chains)
    * and replays the identical classification — so the TARGET's
    * version semantics, not just the merge math, are hash-checked. */
  def qDimTimeTravel(t: Tables, splitDay: Int = 25): DataFrame = {
    import graft.sources.{MergeTarget, SourceOps}
    val tag = s"${SourceOps.runId}_${SourceOps.dirTag(t.dir)}_$splitDay"
    val target = MergeTarget.create(t.spark,
      SourceOps.staging(s"dim_time_travel_$tag"),
      t.spark.table(scd2State(t, splitDay)))
    target.merge(0L)(scd2MergeOf)(
      scd2Events(t).filter(col("day") >= splitDay))
    val v0 = target.readVersion(0L).select(col("user_id"),
      col("valid_from"), col("is_current").as("was_current"),
      col("n_days_observed").as("was_n"))
    val head = target.read().select(col("user_id"), col("valid_from"),
      col("is_current"), col("n_days_observed"))
    val change = when(col("was_current").isNull, lit("added"))
      .when(col("was_current") && !col("is_current"), lit("closed"))
      .when(col("was_current") && col("is_current") &&
        col("was_n") =!= col("n_days_observed"), lit("extended"))
      .otherwise(lit("unchanged"))
    head.join(v0, Seq("user_id", "valid_from"), "full_outer")
      .select(change.as("change"), col("user_id"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** E213 — `q_merge_cdf`: the CHANGE DATA FEED between two committed
    * versions of the MERGE target — the row-level artifact (Delta
    * Lake's CDF / `readChangeData` shape) that downstream INCREMENTAL
    * consumers subscribe to instead of diffing snapshots themselves:
    * every inserted version row surfaces as `insert`, every modified
    * one as an `update_preimage`/`update_postimage` pair (SCD2 rows
    * never vanish across a merge — history days < split ≤ increment
    * days — so the feed legitimately carries no deletes), and
    * untouched rows don't appear at all — which is the scale point:
    * the feed is sized by the CHANGE, not the dimension.
    *
    * Complements `q_dim_time_travel` (a 4-row classification rollup
    * for the warehouse review) with the machine-consumable row-level
    * feed; the spec proves the APPLY CLOSURE — v0 + feed reconstructs
    * v1 exactly — which is the property a CDF subscriber relies on.
    *
    * Shape: one CDC merge, two pinned version scans, one user-keyed
    * full-outer join on the metadata-scale dimension; the feed's
    * pre/post pairs come from the same joined frame (no second diff
    * pass). The oracle rebuilds both snapshots from raw events and
    * emits the identical three-way feed. */
  def qMergeCdf(t: Tables, splitDay: Int = 25): DataFrame = {
    import graft.sources.{MergeTarget, SourceOps}
    val tag = s"${SourceOps.runId}_${SourceOps.dirTag(t.dir)}_$splitDay"
    val target = MergeTarget.create(t.spark,
      SourceOps.staging(s"merge_cdf_$tag"),
      t.spark.table(scd2State(t, splitDay)))
    target.merge(0L)(scd2MergeOf)(
      scd2Events(t).filter(col("day") >= splitDay))
    val v0 = target.readVersion(0L).select(col("user_id"),
      col("valid_from"), col("status").as("o_status"),
      col("valid_to").as("o_vt"), col("is_current").as("o_cur"),
      col("n_days_observed").as("o_n"))
    val v1 = target.read().select(col("user_id"), col("valid_from"),
      col("status").as("n_status"), col("valid_to").as("n_vt"),
      col("is_current").as("n_cur"), col("n_days_observed").as("n_n"))
    val j = v1.join(v0, Seq("user_id", "valid_from"), "full_outer")
    val changed = col("o_status").isNotNull &&
      (!(col("o_vt") <=> col("n_vt")) || col("o_cur") =!= col("n_cur") ||
        col("o_n") =!= col("n_n"))
    def feed(status: Column, vt: Column, cur: Column, n: Column,
        cond: Column, tag: String) =
      j.filter(cond).select(col("user_id"), col("valid_from"),
        status.as("status"), vt.as("valid_to"), cur.as("is_current"),
        n.as("n_days_observed"), lit(tag).as("_change_type"))
    feed(col("n_status"), col("n_vt"), col("n_cur"), col("n_n"),
        col("o_status").isNull, "insert")
      .unionByName(feed(col("o_status"), col("o_vt"), col("o_cur"),
        col("o_n"), changed, "update_preimage"))
      .unionByName(feed(col("n_status"), col("n_vt"), col("n_cur"),
        col("n_n"), changed, "update_postimage"))
      .orderBy(col("user_id"), col("valid_from"), col("_change_type"))
  }

  /** `q_point_in_time_join` — the consumer [[qScd2History]] exists
    * FOR, and the feature-store staple: each fact row joined to the
    * dimension version that was valid AT ITS OWN TIME (`valid_from ≤
    * day < valid_to`, open version unbounded) — the join every
    * training-data pipeline needs to avoid feature leakage (joining
    * today's attributes onto yesterday's examples), rolled up into a
    * per-status readout with exact integer cents.
    *
    * Shape: an EQUI-join on `user_id` with the interval predicate as
    * a residual filter — the dimension side holds O(versions per
    * user) rows, so the per-key fan-out is bounded by version count,
    * never corpus size; no range-join nested loop, no banding needed
    * (versions-per-key is small by construction — the SCD2 build
    * compressed them). Every event matches exactly ONE version
    * (intervals tile the timeline, spec-pinned), so the rollup's
    * row count is the status vocabulary.
    */
  def qPointInTimeJoin(t: Tables): DataFrame = {
    val dim = qScd2History(t)
      .select(col("user_id"), col("status"),
        col("valid_from"), col("valid_to"))
    val facts = t.events.select(col("user_id"),
      datediff(col("ts").cast("date"),
        lit(java.sql.Date.valueOf("2024-01-01"))).as("day"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    facts.join(dim, Seq("user_id"))
      .filter(col("day") >= col("valid_from") &&
        (col("valid_to").isNull || col("day") < col("valid_to")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
      .orderBy(col("status"))
  }

  /** `q_skew_histogram` — join-key skew profile: per-key row counts
    * bucketed on log2, with each bucket's key count, heaviest key and
    * row share — the diagnostic run before choosing a salt factor for
    * [[qSaltedJoin]]/[[qSaltedAgg]] or trusting AQE's skew split. Two
    * partial-agg shuffles (key rollup, then bucket rollup over the
    * #keys-sized frame); the row share's corpus total is a sum window
    * over the bucket list — O(log max-count) rows.
    */
  def qSkewHistogram(t: Tables): DataFrame = {
    val perKey = t.events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
    perKey
      .groupBy(floor(log2(col("n_rows"))).cast("long").as("count_bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n_rows")).as("bucket_rows"),
        max(col("n_rows")).as("max_rows"))
      .withColumn("row_share",
        round(col("bucket_rows") / sum(col("bucket_rows")).over(Window.partitionBy()) +
          lit(1e-9), 4))
  }
}
