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

  /** `er_blocked_pairs` — record linkage (entity resolution) over the
    * part master-data: find distinct part rows that describe the same
    * product, WITHOUT comparing all pairs. Classic two-phase shape:
    *
    *  1. BLOCKING — candidates come only from keyed self-joins on
    *     cheap block keys, so work is bounded by block sizes, never
    *     n². Two passes: equal `p_name`, and equal
    *     (`p_type`, `p_brand`).
    *  2. SCORING — each candidate pair scores one point per agreeing
    *     field: name, type, brand equality, size within ±2; pairs
    *     with score ≥ 3 are matches.
    *
    * The two block keys are COMPLETE for this rule: a score ≥ 3 pair
    * agrees on at least 3 of the 4 fields, of which at most one can
    * be `size_close` — so it agrees on ≥ 2 of {name, type, brand},
    * and any such 2-subset contains `name` or {type, brand}, i.e.
    * every match collides in block 1 or block 2. The DuckDB oracle
    * scores ALL pairs, so a blocking hole would fail the hash gate —
    * the blocked plan is verified against ground truth, not trusted.
    * At 100 TB both joins shuffle on low-cardinality-bounded keys
    * (name frequency, type×brand buckets); skewed real-world block
    * keys would be salted exactly like `q_salted_join`.
    */
  def erBlockedPairs(t: Tables): DataFrame = {
    val p = t.part.select(
      col("p_partkey"), col("p_name"), col("p_type"), col("p_brand"), col("p_size"))
    def blocked(cond: org.apache.spark.sql.Column): DataFrame =
      p.as("a").join(p.as("b"), cond && col("a.p_partkey") < col("b.p_partkey"))
    val cands =
      blocked(col("a.p_name") === col("b.p_name"))
        .unionAll(blocked(
          col("a.p_type") === col("b.p_type") && col("a.p_brand") === col("b.p_brand")))
    cands
      .select(col("a.p_partkey").as("key_1"), col("b.p_partkey").as("key_2"),
        ((col("a.p_name") === col("b.p_name")).cast("int")
          + (col("a.p_type") === col("b.p_type")).cast("int")
          + (col("a.p_brand") === col("b.p_brand")).cast("int")
          + (abs(col("a.p_size") - col("b.p_size")) <= 2).cast("int")).as("score"))
      .filter(col("score") >= 3)
      .distinct() // a pair may surface from both blocks; score is identical
  }

  /** `er_resolve_clusters` — the step record linkage exists FOR: the
    * pairwise matches ([[erBlockedPairs]]) resolved into ENTITIES via
    * connected components, then each multi-member entity collapsed to
    * one golden record. Pairs alone under-resolve: (a,b) and (b,c)
    * matching without (a,c) is still ONE product seen three ways, and
    * only the transitive closure says so.
    *
    * Survivorship policy (deterministic, the auditable kind a master-
    * data pipeline wants): the minimum-key member is canonical — its
    * name/brand survive — while size and price ranges are kept as the
    * conflict evidence (a wide `price_max − price_min` is exactly the
    * row a data steward reviews). Singleton entities are suppressed:
    * the output is the duplication worklist, not a part re-listing.
    *
    * Scale shape: reuses [[Dedup.connectedComponents]] — min-label
    * propagation with adaptive path halving, one keyed join + partial
    * min per round, shuffles carry (id, label) pairs only, no
    * component ever materializes anywhere. Matches come from the
    * BLOCKED self-joins (bounded by block sizes, never n²); the
    * rollup and the canonical-fields join are keyed equi-joins on the
    * entity id. The DuckDB oracle recomputes the closure from the
    * ALL-PAIRS match set via a recursive CTE, so both the blocking
    * completeness AND the distributed CC are checked against ground
    * truth every round.
    */
  def erResolveClusters(t: Tables): DataFrame = {
    val matches = erBlockedPairs(t).select(col("key_1"), col("key_2"))
    val edges = matches
      .select(col("key_1").as("src"), col("key_2").as("dst"))
      .union(matches.select(col("key_2").as("src"), col("key_1").as("dst")))
      .persist()
    edges.count() // eager: every CC round joins this frame
    val (ccLabels, _) =
      try Dedup.connectedComponents(edges)
      finally edges.unpersist()
    // the entity assignment is a persisted artifact in production (the
    // master-data crosswalk table); writing it out here doubles as the
    // deterministic release point for the CC rounds' checkpoint blocks,
    // which live outside the CacheManager and would otherwise linger
    // until ContextCleaner GC (see Dedup.releaseLabels)
    val labelPath = graft.sources.SourceOps.staging(
      s"er_labels_${graft.sources.SourceOps.dirTag(t.dir)}")
    ccLabels.write.mode("overwrite").parquet(labelPath)
    Dedup.releaseLabels(ccLabels)
    val labels = t.spark.read.parquet(labelPath)
    val members = t.part
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .join(labels.select(col("doc_id").as("p_partkey"),
        col("cluster_id").as("entity_id")), Seq("p_partkey"))
    val entities = members.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("p_size")).as("size_min"),
        max(col("p_size")).as("size_max"),
        round(min(col("p_retailprice")), 2).as("price_min"),
        round(max(col("p_retailprice")), 2).as("price_max"))
      .filter(col("n_members") >= 2)
    // canonical fields come from the min-key member — which IS the
    // entity id (labels are component minima), so one keyed join
    entities.join(t.part.select(col("p_partkey").as("entity_id"),
        col("p_name").as("canonical_name"), col("p_brand").as("canonical_brand")),
      Seq("entity_id"))
      .select(col("entity_id"), col("n_members"), col("canonical_name"),
        col("canonical_brand"), col("size_min"), col("size_max"),
        col("price_min"), col("price_max"))
  }
}
