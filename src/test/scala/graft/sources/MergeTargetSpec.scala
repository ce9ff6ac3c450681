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

  // ── bucketed targets: commit cost scales with the touched buckets ──

  private def mkBucketed(name: String, nBuckets: Int): MergeTarget = {
    val sess = spark
    import sess.implicits._
    // keys 0..63 spread over the hash buckets
    val init = (0L until 64L).map(k => (k, k * 10L)).toDF("k", "v")
    MergeTarget.create(spark, SourceOps.staging(name), init, "k", nBuckets)
  }

  private def bucketFiles(name: String): Map[String, Set[String]] = {
    val root = new java.io.File(SourceOps.staging(name))
    root.listFiles().filter(_.getName.startsWith("b=")).flatMap { b =>
      b.listFiles().filter(_.getName.startsWith("v=")).map { v =>
        s"${b.getName}/${v.getName}" ->
          Option(v.listFiles()).map(_.map(_.getName).toSet)
            .getOrElse(Set.empty[String])
      }
    }.toMap
  }

  test("bucketed merge rewrites ONLY the touched buckets' directories") {
    val sess = spark
    import sess.implicits._
    val t = mkBucketed("mt_buck", 4)
    val before = bucketFiles("mt_buck")
    assert(before.keySet == (0 until 4).map(b => s"b=$b/v=0").toSet)
    // one source key -> exactly one touched bucket
    assert(t.merge(0L)(upsert)(Seq((7L, 777L)).toDF("k", "v")))
    val after = bucketFiles("mt_buck")
    val newDirs = after.keySet -- before.keySet
    assert(newDirs.size == 1, s"expected ONE new bucket version: $newDirs")
    // untouched buckets: directories byte-identical (same file lists,
    // nothing rewritten) — commit bytes scaled with the change
    before.keySet.foreach { d =>
      assert(after(d) == before(d), s"untouched dir $d was rewritten")
    }
    // and the table is still value-exact
    val got = t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(7L) == 777L && got(8L) == 80L && got.size == 64)
  }

  test("bucketed merges reproduce the unbucketed result key for key") {
    val sess = spark
    import sess.implicits._
    val t1 = mkBucketed("mt_buck_eq", 4)
    val init = (0L until 64L).map(k => (k, k * 10L)).toDF("k", "v")
    val t0 = MergeTarget.create(spark, SourceOps.staging("mt_flat_eq"), init)
    val batches = Seq(
      Seq((3L, 1000L), (17L, 1001L)),
      Seq((3L, 1002L), (64L, 1003L)), // 64 = brand-new key
      Seq((40L, 1004L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      val src = b.toDF("k", "v")
      assert(t1.merge(i.toLong)(upsert)(src))
      assert(t0.merge(i.toLong)(upsert)(src))
    }
    def rows(t: MergeTarget) =
      t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(t1) == rows(t0))
    assert(t1.version == t0.version)
  }

  test("bucketed time travel pins every committed snapshot exactly") {
    val sess = spark
    import sess.implicits._
    val t = mkBucketed("mt_buck_tt", 4)
    assert(t.merge(0L)(upsert)(Seq((1L, 111L)).toDF("k", "v")))
    assert(t.merge(1L)(upsert)(Seq((2L, 222L)).toDF("k", "v")))
    def at(v: Long) = t.readVersion(v).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(at(0L)(1L) == 10L && at(0L)(2L) == 20L)
    assert(at(1L)(1L) == 111L && at(1L)(2L) == 20L)
    assert(at(2L)(1L) == 111L && at(2L)(2L) == 222L)
    // vacuum keeps shared directories a retained snapshot still needs
    assert(t.vacuum(keep = 2) == Seq(0L))
    intercept[IllegalArgumentException](t.readVersion(0L))
    assert(at(1L)(1L) == 111L && at(2L)(2L) == 222L)
  }

  test("bucketed replayed batch ids are no-ops") {
    val sess = spark
    import sess.implicits._
    val t = mkBucketed("mt_buck_idem", 4)
    assert(t.merge(0L)(upsert)(Seq((5L, 555L)).toDF("k", "v")))
    val v1 = t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!t.merge(0L)(upsert)(Seq((5L, 999L)).toDF("k", "v")))
    assert(t.version == 1L)
    assert(t.read().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == v1)
  }

  test("TWO WRITERS interleaved: the loser fails LOUDLY at its flip, " +
      "the winner's commit stands, and a retry applies cleanly") {
    val sess = spark
    import sess.implicits._
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val root = SourceOps.staging("mt_race")
    val a = MergeTarget.create(spark, root, init)
    val b = MergeTarget.attach(spark, root) // second, independent writer
    // the exact lost-update interleaving: A reads the head, then —
    // inside A's merge, between its history read and its flip — B
    // commits. A filesystem rename can't PREVENT this; the contract
    // is that A detects it and aborts instead of clobbering B.
    val e = intercept[IllegalStateException] {
      a.merge(0L) { (target, source) =>
        assert(b.merge(0L)(upsert)(Seq((9L, 90L)).toDF("k", "v")),
          "the interleaved winner failed to commit")
        upsert(target, source)
      }(Seq((3L, 30L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("concurrent writer"),
      s"wrong error: ${e.getMessage}")
    // the table is CONSISTENT at the winner's commit — A's data never
    // reached the pointer
    val got = a.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (9L, 90L)),
      s"loser corrupted the table: $got")
    assert(a.version == 1L && a.lastBatchId == 0L)
    // the loser retries against the NEW head and lands
    assert(a.merge(1L)(upsert)(Seq((3L, 30L)).toDF("k", "v")))
    assert(a.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L), (9L, 90L), (3L, 30L)))
  }

  test("attach() rebuilds a writer from the pointer alone (schema, " +
      "buckets); reads over EMPTY bucket dirs return empty, not an " +
      "inference failure") {
    val sess = spark
    import sess.implicits._
    // 16 buckets over 2 keys: most bucket dirs are EMPTY from birth
    val init = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val t = MergeTarget.create(spark, SourceOps.staging("mt_empty"),
      init, "k", 16)
    val t2 = MergeTarget.attach(spark, SourceOps.staging("mt_empty"))
    assert(t2.nBuckets == 16)
    // the read plans with the pointer's schema: empty dirs contribute
    // empty frames instead of throwing 'Unable to infer schema'
    assert(t2.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L)))
    // a merge whose key hashes to a PREVIOUSLY-EMPTY bucket works too
    assert(t2.merge(0L)(upsert)(Seq((7L, 70L)).toDF("k", "v")))
    assert(t2.read().count() == 3L)
    // and a table created EMPTY reads back empty through the schema
    val e = MergeTarget.create(spark, SourceOps.staging("mt_empty0"),
      init.limit(0), "k", 4)
    assert(e.read().collect().isEmpty)
    assert(e.read().schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("vacuum reports ONLY versions whose directories it actually " +
      "deleted — shared-dir survivors are not overstated") {
    val sess = spark
    import sess.implicits._
    val t = mkBucketed("mt_vac_share", 4)
    // v1 touches one bucket; v2 and v3 are EMPTY commits (no rewrite:
    // every v1 dir is still shared by the retained head)
    assert(t.merge(0L)(upsert)(Seq((7L, 777L)).toDF("k", "v")))
    assert(t.merge(1L)(upsert)(spark.emptyDataset[(Long, Long)]
      .toDF("k", "v")))
    assert(t.merge(2L)(upsert)(spark.emptyDataset[(Long, Long)]
      .toDF("k", "v")))
    assert(t.version == 3L)
    // keep=2 retains v2,v3 whose dirs == v1's dirs == all shared;
    // only v0's replaced bucket dir is deletable -> dropped = [0]
    val dropped = t.vacuum(keep = 2)
    assert(dropped == Seq(0L),
      s"overstated vacuum: $dropped (v1 shares every dir with the head)")
    // v1 must still read exactly (nothing of it was deleted)
    assert(t.readVersion(1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap.apply(7L) == 777L)
    intercept[IllegalArgumentException](t.readVersion(0L))
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
