package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational / OLAP operator suite (SURVEY.md §2.2).
  *
  * Every query is declarative DataFrame composition — Catalyst handles
  * predicate pushdown, column pruning and join selection; dimension
  * tables are broadcast explicitly. Monetary aggregates are rounded
  * identically in the DuckDB oracles (`SparkEntry.oracleSql`) so the
  * driver's hash-compare is robust to floating summation order.
  *
  * Scale notes (100 TB): fact-fact joins shuffle once on their join
  * key and rely on AQE for coalescing/skew; `nation`/`region`/
  * `supplier`/`part` are broadcast; all top-N queries order by a
  * rounded measure plus a unique key so results are deterministic.
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  /** TPC-H Q1: pricing summary report. Single scan + hash aggregate. */
  def q1PricingSummary(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= ts("2001-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-ish: shipping priority. 3-way join + agg + top-10. */
  def q3ShippingPriority(t: Tables): DataFrame =
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") < ts("1998-01-01") && col("l_shipdate") > ts("1998-01-01"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)

  /** TPC-H Q5-ish: local supplier volume. Broadcast dims, one fact shuffle. */
  def q5LocalSupplier(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** TPC-H Q6-ish: revenue delta from a tight scan-level filter. */
  def q6RevenueDelta(t: Tables): DataFrame =
    t.lineitem
      .filter(
        col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("cnt"))

  /** TPC-H Q10-ish: top returned-item customers in a quarter. */
  def q10ReturnedItems(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  /** Multi-key groupBy with the full scalar-aggregate family. */
  def qGroupMulti(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        countDistinct(col("o_custkey")).as("n_cust"))

  /** Window rank: top-3 orders per customer (deterministic tiebreak). */
  def qWindowRank(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t.orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
  }

  /** Window running sum + moving average per customer over time. */
  def qWindowRunning(t: Tables): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = order.rowsBetween(-2, Window.currentRow)
    t.orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      round(sum(col("o_totalprice")).over(run), 2).as("run_sum"),
      round(avg(col("o_totalprice")).over(mov), 4).as("mov_avg"))
  }

  /** Global top-k with unique tiebreak — TakeOrderedAndProject plan. */
  def qTopK(t: Tables): DataFrame =
    t.orders
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Distinct pairs (partial-agg distinct, no row shuffle of payload). */
  def qDistinct(t: Tables): DataFrame =
    t.customer.select(col("c_mktsegment"), col("c_nationkey")).distinct()

  /** Left-semi join (EXISTS): customers with at least one 450k+ order. */
  def qSemiJoin(t: Tables): DataFrame =
    t.customer.join(
      t.orders.filter(col("o_totalprice") > 450000),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Left-anti join (NOT EXISTS): customers with no order in 2001. */
  def qAntiJoin(t: Tables): DataFrame =
    t.customer.join(
      t.orders.filter(col("o_orderdate") >= ts("2001-01-01")),
      col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Left outer join + null-safe aggregation: order stats per customer. */
  def qOuterJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))

  /** UNION ALL of heterogeneous sources + re-aggregation. */
  def qUnion(t: Tables): DataFrame = {
    val a = t.orders.filter(col("o_totalprice") > 400000)
      .select(lit("orders").as("src"), col("o_totalprice").as("v"))
    val b = t.lineitem.filter(col("l_extendedprice") > 40000)
      .select(lit("lineitem").as("src"), col("l_extendedprice").as("v"))
    a.unionAll(b).groupBy(col("src"))
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("total"))
  }

  /** ROLLUP grouping sets with subtotals. */
  def qRollup(t: Tables): DataFrame =
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))

  /** Pivot via conditional aggregation (order status x priority). */
  def qPivot(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("f_total"),
        round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)), 2).as("o_total"),
        round(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0)), 2).as("p_total"))

  /** CASE-based conditional aggregates over lineitem. */
  def qCaseAgg(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("big_qty"),
        round(sum(when(col("l_discount") > 0.05,
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2).as("discounted_rev"))

  /** Post-aggregation filter (HAVING). */
  def qHaving(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n") >= 15)

  /** Scalar-subquery filter: parts priced above 1.02x the mean. */
  def qScalarSubquery(t: Tables): DataFrame = {
    val thr = t.part.agg((avg(col("p_retailprice")) * 1.02).as("thr"))
    t.part.crossJoin(broadcast(thr))
      .filter(col("p_retailprice") > col("thr"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
  }

  /** Exact interpolated percentiles per group. */
  def qPercentile(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("med_qty"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"))

  /** As-of join: enrich each event with the user's most recent order at
    * or before the event time.
    *
    * Spark-first plan: no range-explosion join — union both sides,
    * repartition by user, sort within partition by time, and carry the
    * latest order forward with a running `last(ignoreNulls)` window.
    * One shuffle total; scales linearly in rows at any SF.
    * Orders are pre-reduced to one row per (custkey, orderdate) with a
    * deterministic representative so ties can't produce flaky output.
    */
  def qAsofJoin(t: Tables): DataFrame = {
    val o1 = t.orders
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .select(
        col("user_id"), col("o_orderdate").as("ats"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        struct(col("last_orderkey"), col("o_orderdate").as("last_orderdate")).as("ord"))
    val ev = t.events.select(
      col("user_id"), col("ts").as("ats"), lit(1).as("kind"), col("event_id"),
      lit(null).cast("struct<last_orderkey:bigint,last_orderdate:timestamp_ntz>").as("ord"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("ats"), asc("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o1.unionAll(ev)
      .withColumn("last_ord", last(col("ord"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(
        col("event_id"), col("user_id"), col("ats").as("ts"),
        col("last_ord.last_orderkey").as("last_orderkey"),
        col("last_ord.last_orderdate").as("last_orderdate"))
  }

  /** As-of join via the NATIVE custom operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics and oracle as
    * [[qAsofJoin]], executed by the sort-merge as-of physical plan —
    * one shuffle per side, linear merge, O(1) carried state.
    */
  def qAsofJoinNative(t: Tables): DataFrame = {
    val o1 = t.orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .select(col("o_custkey").as("r_user"), col("o_orderdate").as("r_date"),
        col("last_orderkey"))
    val ev = t.events.select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOfJoinOps.asofJoin(ev, o1, "user_id", "ts", "r_user", "r_date")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_orderkey"), col("r_date").as("last_orderdate"))
  }

  /** Sessionization: a >30-min gap starts a new session; emit per-session
    * stats. lag + running sum over one user-partitioned window. */
  def qSessionize(t: Tables): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** JSON field extraction + aggregation over events.props. */
  def qJsonExtract(t: Tables): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))

  /** Tumbling time-window (hourly) aggregation over the event stream. */
  def qTimeBucket(t: Tables): DataFrame =
    t.events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
}
