package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GovernanceSpec extends SparkSpec {

  test("delete propagation audit balances and cascades consistently") {
    val rows = Governance.deletePropagation(tables).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.values.foreach { case (before, deleted, after) =>
      assert(after == before - deleted)
      assert(deleted >= 0 && deleted <= before)
    }
    // the cascade must actually fire at this SF: tombstoned customers
    // exist, and their orders/lineitems are swept with them
    assert(rows("customer")._2 > 0)
    assert(rows("orders")._2 > 0)
    assert(rows("lineitem")._2 >= rows("orders")._2) // ≥1 line per order
  }

  test("no orphaned references survive the cascade") {
    val t = tables
    val tomb = t.customer.filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey"))
    val keptOrders = t.orders
      .join(tomb, col("o_custkey") === col("c_custkey"), "left_anti")
    // surviving orders never reference a tombstoned customer (fresh
    // renamed tombstone frame: tomb is already in keptOrders' lineage)
    val tomb2 = t.customer.filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("tomb_key"))
    assert(keptOrders.join(tomb2,
      col("o_custkey") === col("tomb_key"), "left_semi").count() == 0)
  }
}
