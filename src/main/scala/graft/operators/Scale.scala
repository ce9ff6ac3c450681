package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
