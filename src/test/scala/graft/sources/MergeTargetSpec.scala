package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** B18's contract, property by property: atomic pointer commit,
  * reader snapshot isolation, replayed-batch idempotence, and
  * pre-flip-crash invisibility — the four behaviors the streaming
  * SCD2 lifecycle leans on the target for. */
class MergeTargetSpec extends SparkSpec {

  private def mkTarget(name: String): (MergeTarget, DataFrame) = {
    val sess = spark
    import sess.implicits._
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    (MergeTarget.create(spark, SourceOps.staging(name), init), init)
  }

  // latest-version-wins upsert as the merge function
  private val upsert: (DataFrame, DataFrame) => DataFrame =
    (target, source) => target.unionByName(source)
      .groupBy(col("k")).agg(max(col("v")).as("v"))

  test("merge applies, bumps the version, and read() reflects it") {
    val sess = spark
    import sess.implicits._
    val (t, _) = mkTarget("mt_basic")
    assert(t.version == 0L)
    assert(t.merge(0L)(upsert)(Seq((2L, 25L), (3L, 30L)).toDF("k", "v")))
    assert(t.version == 1L)
    val got = t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 25L), (3L, 30L)))
  }

  test("readers are snapshot-isolated: a pinned frame survives later commits") {
    val sess = spark
    import sess.implicits._
    val (t, _) = mkTarget("mt_snapshot")
    val snapshot = t.read() // pinned to v=0
    t.merge(0L)(upsert)(Seq((1L, 99L)).toDF("k", "v"))
    assert(t.version == 1L)
    // the old frame still answers from its version directory
    val got = snapshot.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)),
      s"snapshot leaked a later commit: $got")
  }

  test("a replayed batch id is a no-op (foreachBatch restart semantics)") {
    val sess = spark
    import sess.implicits._
    val (t, _) = mkTarget("mt_idem")
    assert(t.merge(0L)(upsert)(Seq((1L, 11L)).toDF("k", "v")))
    val v1 = t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // restart replays batch 0: must not double-apply or bump version
    assert(!t.merge(0L)(upsert)(Seq((1L, 12L)).toDF("k", "v")))
    assert(t.version == 1L)
    assert(t.read().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == v1)
  }

  test("a crash before the pointer flip is invisible and self-heals") {
    val sess = spark
    import sess.implicits._
    val (t, _) = mkTarget("mt_crash")
    // simulate: version data fully written, process dies before flip
    Seq((1L, 777L)).toDF("k", "v").write.mode("overwrite")
      .parquet(SourceOps.staging("mt_crash") + "/v=1")
    // no reader ever resolves the orphan
    assert(t.version == 0L)
    assert(t.read().collect().map(_.getLong(1)).toSet == Set(10L, 20L))
    // the retried merge overwrites the orphan and commits cleanly
    assert(t.merge(0L)(upsert)(Seq((2L, 21L)).toDF("k", "v")))
    assert(t.read().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 21L)))
  }

  test("vacuum drops old versions, keeps the retained window readable") {
    val sess = spark
    import sess.implicits._
    val (t, _) = mkTarget("mt_vacuum")
    (0 to 2).foreach { b =>
      t.merge(b.toLong)(upsert)(Seq((1L, 100L + b)).toDF("k", "v"))
    }
    assert(t.version == 3L)
    assert(t.vacuum(keep = 2) == Seq(0L, 1L))
    // head and the retained snapshot still read; dropped versions
    // fail LOUDLY (never a partial scan)
    assert(t.read().collect().map(_.getLong(1)).max == 102L)
    assert(t.readVersion(2L).collect().map(_.getLong(1)).max == 101L)
    intercept[IllegalArgumentException](t.readVersion(1L))
    // idempotent: nothing left to drop
    assert(t.vacuum(keep = 2).isEmpty)
    // a later merge still commits cleanly on the vacuumed table
    assert(t.merge(3L)(upsert)(Seq((9L, 9L)).toDF("k", "v")))
    assert(t.version == 4L)
  }

  test("pointer flip is a same-directory atomic rename, not a rewrite") {
    val (t, _) = mkTarget("mt_pointer")
    t.merge(0L)(upsert)(t.read())
    // the pointer file exists, is one line, and no tmp residue remains
    val root = Paths.get(SourceOps.staging("mt_pointer"))
    val names = Files.list(root).iterator()
    var found = Set.empty[String]
    while (names.hasNext) found += names.next().getFileName.toString
    assert(found.contains("_latest"))
    assert(!found.exists(_.startsWith("_latest.tmp")),
      s"tmp pointer residue: $found")
  }
}
