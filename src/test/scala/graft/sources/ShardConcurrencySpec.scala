package graft.sources

import java.nio.file.{Files, Paths}
import java.util.ConcurrentModificationException

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.shard.{ShardFormat, ShardOps}

/** OPTIMISTIC-CONCURRENCY commit for gshard (r15 verdict task #1):
  * `publishManifest` carries the generation the mutation PLANNED
  * against (`basedOn`) and fails loudly when the head moved — the
  * MergeTarget lost-race discipline, closing the engine's last
  * silent-data-loss path (two independent writers both reading gen N
  * used to last-writer-wins each other).
  *
  * The races are reconstructed DETERMINISTICALLY: writer A plans
  * (reads the head), writer B commits a full mutation, then A
  * publishes against its stale generation — exactly the interleaving
  * a wall-clock race produces, without the flakiness. In-JVM
  * same-table writers additionally serialize on
  * [[ShardFormat.tableLock]], so their read-modify-publish sections
  * can never interleave at all. */
class ShardConcurrencySpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"gshard_occ_$tag").toString

  private def rows(lo: Long, hi: Long) = {
    val sess = spark
    import sess.implicits._
    (lo until hi).map(i => (i, s"v$i", i * 10L)).toDF("id", "tag", "score")
  }

  private def tableState(d: String): (Long, Set[String], Set[(Long, String, Long)]) = {
    val m = ShardFormat.readManifest(d)
    val data = spark.read.format("gshard").load(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    (m.gen, m.entries.map(_.file).toSet, data)
  }

  test("append x append: the stale appender throws, the winner's " +
      "table survives byte-exact") {
    val d = tmp("appapp")
    ShardFormat.write(rows(0, 100), d, "id", 2) // gen 0
    // writer A plans: reads the head at gen 0 and builds its manifest
    val plannedA = ShardFormat.readManifest(d)
    // writer B commits first (independent append via the normal path)
    rows(100, 200).write.format("gshard").option("rangecol", "id")
      .mode("append").save(d)
    val winner = tableState(d)
    assert(winner._1 == 1L)
    // writer A publishes against its stale gen-0 read -> must THROW,
    // not destroy B's entries
    val freshA = ShardFormat.ShardEntry("part-zzz00000.gshard", 1L,
      Map("id" -> 999L), Map("id" -> 999L), Map.empty, Map.empty,
      Map("id" -> 0L, "tag" -> 0L, "score" -> 0L))
    val ex = intercept[ConcurrentModificationException] {
      ShardFormat.publishManifest(d,
        plannedA.copy(entries = plannedA.entries :+ freshA),
        basedOn = plannedA.gen)
    }
    assert(ex.getMessage.contains("concurrent commit"))
    assert(ex.getMessage.contains("generation 0"))
    // winner's commit byte-exact: same gen, same files, same rows
    assert(tableState(d) == winner)
  }

  test("append x upsert: a merge that planned before an append " +
      "committed fails at publish; the append survives") {
    val d = tmp("appups")
    ShardFormat.write(rows(0, 100), d, "id", 2) // gen 0
    val stale = ShardFormat.readManifest(d)
    // the interleaving writer: an upsert commits (gen 0 -> 1)
    ShardOps.upsert(spark, d, rows(50, 120), "id")
    val winner = tableState(d)
    assert(winner._1 == 1L)
    // the loser (planned at gen 0) publishes -> throws; this is the
    // exact publish ShardOps.upsert issues (basedOn = its head read)
    intercept[ConcurrentModificationException] {
      ShardFormat.publishManifest(d, stale.copy(entries = stale.entries),
        basedOn = stale.gen)
    }
    assert(tableState(d) == winner)
  }

  test("wall-clock race: two threads appending to one table both " +
      "succeed or exactly one fails loudly - rows are never lost " +
      "silently") {
    val d = tmp("threads")
    ShardFormat.write(rows(0, 100), d, "id", 2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Unit]]()
    val ths = Seq(100L, 200L).map { lo =>
      new Thread(() => {
        try {
          rows(lo, lo + 100).write.format("gshard")
            .option("rangecol", "id").mode("append").save(d)
          outcomes.add(Right(()))
        } catch { case t: Throwable => outcomes.add(Left(t)) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val oc = outcomes.asScala.toSeq
    assert(oc.size == 2)
    val got = spark.read.format("gshard").load(d)
      .agg(count(lit(1)), sum(col("id"))).head
    // every committed writer's rows are PRESENT (the in-JVM table
    // lock serializes local commits, so both should land); if one had
    // failed, it failed loudly - either way no silent loss
    val okWriters = oc.count(_.isRight)
    assert(got.getLong(0) == 100L + 100L * okWriters)
    assert(oc.forall {
      case Right(_) => true
      case Left(t) =>
        var c: Throwable = t
        while (c.getCause != null && !c.isInstanceOf[ConcurrentModificationException])
          c = c.getCause
        c.isInstanceOf[ConcurrentModificationException]
    })
  }

  test("concurrent cold consumers: ensureStaged runs the build " +
      "exactly once") {
    val d = tmp("staged")
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val ths = (0 until 4).map(_ => new Thread(() =>
      ShardFormat.ensureStaged(d) {
        built.incrementAndGet()
        ShardFormat.write(rows(0, 10), d, "id", 1)
      }))
    ths.foreach(_.start()); ths.foreach(_.join(60000))
    assert(built.get() == 1)
    assert(spark.read.format("gshard").load(d).count() == 10L)
  }

  test("stale ALTER TABLE fails after a concurrent mutation; the " +
      "mutation's schema survives") {
    val d = tmp("alter")
    ShardFormat.write(rows(0, 100), d, "id", 2)
    val stale = ShardFormat.readManifest(d)
    rows(100, 120).write.format("gshard").option("rangecol", "id")
      .mode("append").save(d)
    intercept[ConcurrentModificationException] {
      ShardFormat.publishManifest(d,
        stale.copy(schema = org.apache.spark.sql.types.StructType(
          stale.schema.fields :+ org.apache.spark.sql.types.StructField(
            "extra", org.apache.spark.sql.types.LongType))),
        basedOn = stale.gen)
    }
    assert(ShardFormat.readManifest(d).schema.fieldNames.toSeq ==
      Seq("id", "tag", "score"))
  }

  test("two concurrent upserts stage under DISTINCT file names; the " +
      "loser's commit fails without corrupting the winner's bytes") {
    val d = tmp("upsraces")
    ShardFormat.write(rows(0, 100), d, "id", 2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Long]]()
    val sess = spark
    import sess.implicits._
    val ths = Seq(5L, 6L).map { key =>
      new Thread(() => {
        try {
          ShardOps.upsert(spark, d,
            Seq((key, s"T$key", -key)).toDF("id", "tag", "score"), "id")
          outcomes.add(Right(key))
        } catch { case t: Throwable => outcomes.add(Left(t)) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val oc = outcomes.asScala.toSeq
    assert(oc.size == 2)
    val applied = oc.collect { case Right(k) => k }.toSet
    assert(applied.nonEmpty)
    oc.collect { case Left(t) => t }.foreach { t =>
      var c: Throwable = t
      while (c.getCause != null &&
        !c.isInstanceOf[java.util.ConcurrentModificationException])
        c = c.getCause
      assert(c.isInstanceOf[java.util.ConcurrentModificationException], t)
    }
    // the table equals base + exactly the SUCCESSFUL upserts — a torn
    // staged file would make zone maps disagree with bytes; re-read
    // everything and recount
    val got = spark.read.format("gshard").load(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = (0L until 100L).map(i =>
      if (applied(i)) (i, s"T$i", -i) else (i, s"v$i", i * 10L)).toSet
    assert(got == want)
    // manifest row counts agree with the data (no stats/bytes tear)
    val m = ShardFormat.readManifest(d)
    assert(m.entries.map(_.rows).sum == 100L)
  }

  test("upsertWithRetry: contended writers on disjoint keys ALL " +
      "converge (the OCC commit-retry loop)") {
    val d = tmp("retry")
    ShardFormat.write(rows(0, 100), d, "id", 2)
    val sess = spark
    import sess.implicits._
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ths = (0 until 4).map { i =>
      new Thread(() => {
        try ShardOps.upsertWithRetry(spark, d,
          Seq((i.toLong, s"R$i", -i.toLong)).toDF("id", "tag", "score"),
          "id")
        catch { case t: Throwable => failures.add(t) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join(180000))
    import scala.jdk.CollectionConverters._
    assert(failures.asScala.isEmpty,
      s"retry loop failed: ${failures.asScala.headOption}")
    val got = spark.read.format("gshard").load(d)
      .filter(col("id") < 4L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (0 until 4).map(i => (i.toLong, s"R$i")).toSet)
    assert(spark.read.format("gshard").load(d).count() == 100L)
  }

  test("vacuum's min_age guard spares young unreferenced files (an " +
      "in-flight writer's staging) and sweeps old ones") {
    val d = tmp("minage")
    ShardFormat.write(rows(0, 100), d, "id", 2)
    val young = "part-staged00000.gshard"
    val old = "part-oldorphan0.gshard"
    Files.copy(Paths.get(d, ShardFormat.readManifest(d).entries.head.file),
      Paths.get(d, young))
    Files.copy(Paths.get(d, young), Paths.get(d, old))
    Files.setLastModifiedTime(Paths.get(d, old),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600 * 1000L))
    val swept = ShardFormat.vacuum(d, keepVersions = 0,
      minAgeSeconds = 600L)
    assert(swept == Seq(old))
    assert(Files.exists(Paths.get(d, young)))
    // age 0 (the maintenance-window default) sweeps the rest
    assert(ShardFormat.vacuum(d, 0) == Seq(young))
  }

  test("the loser's orphaned data files are re-swept by vacuum") {
    val d = tmp("orphan")
    ShardFormat.write(rows(0, 100), d, "id", 2) // gen 0
    val stale = ShardFormat.readManifest(d)
    rows(100, 200).write.format("gshard").option("rangecol", "id")
      .mode("append").save(d) // gen 1
    // simulate the loser's staged-but-never-published data file
    val orphan = "part-loser00000.gshard"
    Files.copy(Paths.get(d, stale.entries.head.file), Paths.get(d, orphan))
    intercept[ConcurrentModificationException] {
      ShardFormat.publishManifest(d, stale, basedOn = stale.gen)
    }
    val swept = ShardFormat.vacuum(d, keepVersions = 0)
    assert(swept.contains(orphan))
    assert(!Files.exists(Paths.get(d, orphan)))
    // the table is unaffected
    assert(spark.read.format("gshard").load(d).count() == 200L)
  }

  // ── r17: the commit point is an ATOMIC exclusive create ──────────

  test("the commit-record CAS: exactly one creator of a generation " +
      "wins; the second exclusive create throws") {
    import graft.sources.shard.tests.FormatProbe
    val d = tmp("cas")
    ShardFormat.write(rows(0, 50), d, "id", 1) // gen 0 (record + pointer)
    val m = ShardFormat.readManifest(d)
    FormatProbe.forgeCommitRecord(d, m, 1L)
    intercept[ConcurrentModificationException] {
      FormatProbe.forgeCommitRecord(d, m, 1L)
    }
  }

  test("a foreign process's half-finished commit (record linked, " +
      "pointer not yet moved) is visible to readers and fails a " +
      "stale publish; the chain stays contiguous") {
    import graft.sources.shard.tests.FormatProbe
    val d = tmp("halfcommit")
    ShardFormat.write(rows(0, 50), d, "id", 1) // gen 0
    val m0 = ShardFormat.readManifest(d)
    // foreign process: committed gen 1 (its record is the commit)
    // but crashed before moving the derived head pointer
    FormatProbe.forgeCommitRecord(d,
      m0.copy(entries = m0.entries.filter(_ => false)), 1L)
    // readers reconcile forward off the records
    val head = ShardFormat.readManifest(d)
    assert(head.gen == 1L && head.entries.isEmpty)
    // a writer that planned against gen 0 must lose
    intercept[ConcurrentModificationException] {
      ShardFormat.publishManifest(d, m0, basedOn = 0L)
    }
    // re-planning against the reconciled head commits gen 2 and
    // repairs the pointer
    val pub = ShardFormat.publishManifest(d, m0, basedOn = 1L)
    assert(pub.gen == 2L)
    assert(FormatProbe.commitRecordGens(d) == Seq(0L, 1L, 2L))
    assert(ShardFormat.readManifest(d).gen == 2L)
    // pointer now agrees with the newest record (no reconcile needed)
    assert(spark.read.format("gshard").load(d).count() == 50L)
  }

  test("pointer lost entirely (crash after the very first record): " +
      "readers recover from the newest commit record") {
    val d = tmp("ptrloss")
    ShardFormat.write(rows(0, 30), d, "id", 1) // gen 0
    rows(30, 40).write.format("gshard").option("rangecol", "id")
      .mode("append").save(d) // gen 1
    Files.delete(Paths.get(d, "_manifest.gshard"))
    assert(ShardFormat.hasManifest(d))
    val m = ShardFormat.readManifest(d)
    assert(m.gen == 1L)
    assert(spark.read.format("gshard").load(d).count() == 40L)
  }

  test("TWO PROCESSES race 25 commits each through the real " +
      "protocol: every commit wins exactly one generation, no commit " +
      "is lost, the record chain is contiguous") {
    val d = tmp("raceproc")
    ShardFormat.write(rows(0, 10), d, "id", 1) // gen 0
    val base = ShardFormat.readManifest(d)
    val go = s"$d/.go"
    val n = 25
    def launch(tag: String): Process = {
      val pb = new ProcessBuilder(
        s"${System.getProperty("java.home")}/bin/java",
        "-cp", System.getProperty("java.class.path"),
        "graft.sources.shard.tests.ShardRaceMain", d, n.toString, tag, go)
      pb.redirectErrorStream(true)
      pb.redirectOutput(
        ProcessBuilder.Redirect.to(new java.io.File(s"$d/.$tag.log")))
      pb.start()
    }
    val (pa, pb) = (launch("wa"), launch("wb"))
    Thread.sleep(500) // both JVMs booting; release them together
    Files.createFile(Paths.get(go))
    assert(pa.waitFor(120, java.util.concurrent.TimeUnit.SECONDS) &&
      pb.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "race writers did not finish")
    assert(pa.exitValue() == 0 && pb.exitValue() == 0,
      s"writer failed:\n${new String(Files.readAllBytes(Paths.get(s"$d/.wa.log")))}" +
        s"\n${new String(Files.readAllBytes(Paths.get(s"$d/.wb.log")))}")
    val head = ShardFormat.readManifest(d)
    // 50 commits on top of gen 0: the head generation is exactly 50
    // (every publish won exactly one generation — the CAS can't
    // double-assign) and NO commit was lost (all 50 markers present)
    assert(head.gen == base.gen + 2L * n, s"head gen ${head.gen}")
    val markers = head.entries.map(_.file)
      .filter(f => f.contains("-wa-") || f.contains("-wb-"))
    assert(markers.size == 2 * n, s"lost commits: ${markers.size}")
    assert(markers.toSet.size == 2 * n)
    // the record chain is contiguous 0..50
    assert(graft.sources.shard.tests.FormatProbe.commitRecordGens(d) ==
      (0L to (base.gen + 2L * n)).toSeq)
  }
}
