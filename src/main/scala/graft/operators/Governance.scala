package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance sweeps: the compliance half of running a corpus at
  * scale — deletion requests must propagate through every table that
  * derives from the deleted entity, with an auditable account of what
  * was removed where.
  */
object Governance {

  /** `q_delete_propagation` — right-to-erasure cascade audit: a
    * deterministic tombstone set of customers (key ≡ 0 mod `modulus`,
    * standing in for an external deletion-request feed) is propagated
    * through the referential chain customer → orders → lineitem, and
    * the audit reports per-table rows before / deleted / after. This
    * is the sweep a GDPR/CCPA deletion job runs before rewriting: the
    * counts are the evidence trail, and a non-zero `rows_deleted` on a
    * table nobody thought referenced users is exactly what the audit
    * exists to catch.
    *
    * Scale shape: the tombstone key set is broadcast into a map-side
    * semi-join on orders (deletion feeds are tiny next to the fact
    * tables); the second hop keys lineitem by `l_orderkey` against the
    * purged-order ids — a keyed shuffle semi-join, since the purged
    * order set scales with the tombstones, not with lineitem. Every
    * audit row is a one-row aggregate; the crossJoins below are
    * one-row broadcasts, never data×data.
    */
  def deletePropagation(t: Tables, modulus: Int = 13): DataFrame = {
    val tomb = t.customer
      .filter(col("c_custkey") % modulus === 0)
      .select(col("c_custkey"))
    val purgedOrders = t.orders
      .join(broadcast(tomb), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    val purgedLines = t.lineitem
      .join(purgedOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")

    def auditRow(name: String, full: DataFrame, purged: DataFrame): DataFrame =
      full.agg(count(lit(1)).as("rows_before"))
        .crossJoin(purged.agg(count(lit(1)).as("rows_deleted")))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))

    auditRow("customer", t.customer, tomb)
      .unionAll(auditRow("orders", t.orders, purgedOrders))
      .unionAll(auditRow("lineitem", t.lineitem, purgedLines))
  }
}
