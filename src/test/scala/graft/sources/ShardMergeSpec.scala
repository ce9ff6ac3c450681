package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.shard.{ShardFormat, ShardOps}

/** MERGE (upsert) through the gshard catalog + generational TIME
  * TRAVEL + vacuum retention — the mutation lifecycle the r14 verdict
  * ordered (items 3 & 4): matched keys update, unmatched insert,
  * untouched files stay physically untouched (metadata-first touched-
  * file discovery off the key zone maps), replay is idempotent via
  * the txn slots, every mutation archives a readable generation, and
  * vacuum reclaims bytes under retention with vacuumed versions
  * failing loudly. */
class ShardMergeSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"gshard_merge_$tag").toString

  private def base(n: Int) = {
    val sess = spark
    import sess.implicits._
    (0L until n.toLong).map(i => (i, s"v$i", i * 10L))
      .toDF("id", "tag", "score")
  }

  test("upsert: matched keys update, unmatched insert, untouched " +
      "files stay physically untouched") {
    val sess = spark
    import sess.implicits._
    val d = tmp("basic")
    ShardFormat.write(base(1000), d, "id", 8)
    val before = ShardFormat.readManifest(d)
    // updates: keys 990..1009 — 10 matched (one file's range), 10 new
    val updates = (990L until 1010L).map(i => (i, s"UPD$i", i * 100L))
      .toDF("id", "tag", "score")
    ShardOps.upsert(spark, d, updates, "id")
    val after = ShardFormat.readManifest(d)
    // untouched entries carried over verbatim (same file names)
    val touched = before.entries.filter(e =>
      e.zMax("id") >= 990L).map(_.file).toSet
    assert(touched.nonEmpty && touched.size < before.entries.size)
    assert(after.entries.map(_.file).toSet
      .intersect(before.entries.map(_.file).toSet) ==
      before.entries.map(_.file).toSet -- touched)
    // rows: merge semantics exact
    val got = spark.read.format("gshard").load(d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = ((0L until 990L).map(i => (i, s"v$i", i * 10L)) ++
      (990L until 1010L).map(i => (i, s"UPD$i", i * 100L))).toSet
    assert(got == want)
    // untouched files' BYTES untouched: still on disk, still named
    (before.entries.map(_.file).toSet -- touched).foreach(f =>
      assert(Files.exists(Paths.get(d, f)), f))
  }

  test("upsert replay is idempotent via the txn slot; duplicate and " +
      "NULL source keys reject") {
    val sess = spark
    import sess.implicits._
    val d = tmp("txn")
    ShardFormat.write(base(100), d, "id", 2)
    val u = Seq((5L, "X", 1L)).toDF("id", "tag", "score")
    ShardOps.upsert(spark, d, u, "id", txnId = 1, txnApp = Some("cdc"))
    val gen1 = ShardFormat.readManifest(d).gen
    // replay: same app, same txn — a no-op (no new generation)
    ShardOps.upsert(spark, d, u, "id", txnId = 1, txnApp = Some("cdc"))
    assert(ShardFormat.readManifest(d).gen == gen1)
    assert(spark.read.format("gshard").load(d)
      .filter(col("id") === 5L).head.getString(1) == "X")
    // next txn applies
    ShardOps.upsert(spark, d, Seq((5L, "Y", 2L)).toDF("id", "tag", "score"),
      "id", txnId = 2, txnApp = Some("cdc"))
    assert(spark.read.format("gshard").load(d)
      .filter(col("id") === 5L).head.getString(1) == "Y")
    // duplicate source keys reject loudly
    val dup = Seq((7L, "a", 1L), (7L, "b", 2L)).toDF("id", "tag", "score")
    val ex = intercept[IllegalArgumentException] {
      ShardOps.upsert(spark, d, dup, "id")
    }
    assert(ex.getMessage.contains("duplicate or NULL key"))
  }

  test("upsert over an INT-keyed table works (the key family the " +
      "require blesses must not crash in writeData)") {
    val sess = spark
    import sess.implicits._
    val d = tmp("intkey")
    val base = (0 until 100).map(i => (i, s"v$i")).toDF("id", "tag")
    base.write.format("gshard").option("rangecol", "id")
      .option("shards", 2).mode("overwrite").save(d)
    ShardOps.upsert(spark, d,
      Seq((5, "X"), (200, "NEW")).toDF("id", "tag"), "id")
    val got = spark.read.format("gshard").load(d).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got.size == 101)
    assert(got(5) == "X" && got(200) == "NEW" && got(6) == "v6")
  }

  test("time travel: every mutation archives a readable generation; " +
      "VERSION AS OF through SQL; vacuumed versions fail loudly; " +
      "writes to pinned versions reject") {
    val sess = spark
    import sess.implicits._
    val wh = tmp("tt_wh")
    spark.conf.set("spark.sql.catalog.gshard_tt",
      "graft.sources.shard.ShardCatalog")
    spark.conf.set("spark.sql.catalog.gshard_tt.warehouse", wh)
    base(50).createOrReplaceTempView("tt_src_a")
    base(50).withColumn("id", col("id") + 100L)
      .createOrReplaceTempView("tt_src_b")
    spark.sql("DROP TABLE IF EXISTS gshard_tt.main.t")
    spark.sql("CREATE TABLE gshard_tt.main.t AS SELECT * FROM tt_src_a")
    spark.sql("INSERT INTO gshard_tt.main.t SELECT * FROM tt_src_b")
    val d = s"$wh/main/t"
    val head = ShardFormat.readManifest(d)
    assert(head.gen == 2L) // gen0 empty create, gen1 CTAS data, gen2 append
    // SQL VERSION AS OF: the pre-append generation
    assert(spark.sql(
      "SELECT count(*) FROM gshard_tt.main.t VERSION AS OF 1")
      .head.getLong(0) == 50L)
    assert(spark.sql("SELECT count(*) FROM gshard_tt.main.t")
      .head.getLong(0) == 100L)
    // the path API equivalent
    assert(spark.read.format("gshard").option("versionAsOf", "1")
      .load(d).count() == 50L)
    // a version beyond head: not committed
    val exHi = intercept[Exception] {
      spark.sql("SELECT count(*) FROM gshard_tt.main.t VERSION AS OF 9")
        .collect()
    }
    assert(exHi.getMessage.contains("not committed"))
    // vacuum with retention 1: v0 drops, v1 survives
    ShardFormat.vacuum(d, keepVersions = 1)
    assert(spark.read.format("gshard").option("versionAsOf", "1")
      .load(d).count() == 50L)
    val exV = intercept[Exception] {
      spark.read.format("gshard").option("versionAsOf", "0").load(d).count()
    }
    assert(exV.getMessage.contains("vacuumed"))
    // pinned versions are read-only
    val exW = intercept[Exception] {
      spark.sql("DELETE FROM gshard_tt.main.t VERSION AS OF 1")
    }
    assert(exW.getMessage != null)
  }

  test("upsert over a VECTOR table: embedding rows update/insert " +
      "bit-exactly (MERGE composed with vector columns)") {
    val d = tmp("vec")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("emb",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))))
    def frame(ids: Seq[Long], scale: Float) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.map(i =>
          org.apache.spark.sql.Row(i,
            Array.tabulate(8)(j => (i * 8 + j) * scale))), 2), schema)
    ShardFormat.write(frame(0L until 100L, 0.5f), d, "id", 4)
    // update ids 90..99, insert 200..204, with a different scale
    ShardOps.upsert(spark, d,
      frame((90L until 100L) ++ (200L until 205L), 2.0f), "id")
    val got = spark.read.format("gshard").load(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.size == 105)
    assert(got(5L) == Seq.tabulate(8)(j => (5 * 8 + j) * 0.5f))
    assert(got(95L) == Seq.tabulate(8)(j => (95 * 8 + j) * 2.0f))
    assert(got(202L) == Seq.tabulate(8)(j => (202 * 8 + j) * 2.0f))
  }

  test("CALL vacuum from pure SQL: sweeps under retention and " +
      "reports (n_swept, n_retained); unknown procedures reject") {
    val sess = spark
    import sess.implicits._
    val wh = tmp("proc_wh")
    spark.conf.set("spark.sql.catalog.gshard_proc",
      "graft.sources.shard.ShardCatalog")
    spark.conf.set("spark.sql.catalog.gshard_proc.warehouse", wh)
    base(60).createOrReplaceTempView("proc_src_a")
    base(60).withColumn("id", col("id") + 100L)
      .createOrReplaceTempView("proc_src_b")
    spark.sql("DROP TABLE IF EXISTS gshard_proc.main.t")
    spark.sql("CREATE TABLE gshard_proc.main.t AS SELECT * FROM proc_src_a")
    spark.sql("INSERT INTO gshard_proc.main.t SELECT * FROM proc_src_b")
    spark.sql("DELETE FROM gshard_proc.main.t WHERE id >= 100")
    val d = s"$wh/main/t"
    assert(ShardFormat.archivedGens(d).size == 3) // v0 empty, v1, v2
    // keep 1: the newest archive (the pre-delete generation) still
    // references the deleted files — nothing sweeps yet, by design
    val r1 = spark.sql(
      "CALL gshard_proc.vacuum(table => 'main.t', keep_versions => 1)")
      .head
    assert(r1.getLong(0) == 0L)
    assert(r1.getLong(1) == 2L) // 1 archive + head
    assert(ShardFormat.archivedGens(d).size == 1)
    // keep 0: the pre-delete generation drops, its files sweep
    val r0 = spark.sql(
      "CALL gshard_proc.vacuum(table => 'main.t', keep_versions => 0)")
      .head
    assert(r0.getLong(0) >= 1L, "nothing swept")
    assert(r0.getLong(1) == 1L) // head only
    assert(spark.table("gshard_proc.main.t").count() == 60L)
    val ex = intercept[Exception] {
      spark.sql("CALL gshard_proc.nonsense()").collect()
    }
    assert(ex.getMessage != null)
  }

  test("upsert keeps a version readable: pre-merge generation reads " +
      "the pre-merge rows; vacuum(0) then sweeps the rewritten files") {
    val sess = spark
    import sess.implicits._
    val d = tmp("ttm")
    ShardFormat.write(base(200), d, "id", 4)
    val preGen = ShardFormat.readManifest(d).gen
    val u = Seq((0L, "Z", 999L), (500L, "NEW", 1L)).toDF("id", "tag", "score")
    ShardOps.upsert(spark, d, u, "id")
    // pre-merge generation: original row 0, no row 500
    val v0 = spark.read.format("gshard")
      .option("versionAsOf", preGen.toString).load(d)
    assert(v0.filter(col("id") === 0L).head.getString(1) == "v0")
    assert(v0.filter(col("id") === 500L).count() == 0L)
    // head: merged
    val h = spark.read.format("gshard").load(d)
    assert(h.filter(col("id") === 0L).head.getString(1) == "Z")
    assert(h.filter(col("id") === 500L).count() == 1L)
    // vacuum reclaims the replaced file's bytes
    val swept = ShardFormat.vacuum(d, 0)
    assert(swept.nonEmpty)
    assert(spark.read.format("gshard").load(d).count() == 201L)
  }

  test("STRING-keyed upsert: lexicographic zone maps bound the " +
      "touched set, untouched files stay physically identical, " +
      "replay is idempotent") {
    val sess = spark
    import sess.implicits._
    val d = tmp("strkey")
    // keys k0000..k0999 — zero-padded so lexicographic == numeric
    val base = (0 until 1000).map(i => (f"k$i%04d", i.toLong))
      .toDF("key", "score")
    base.write.format("gshard").option("rangecol", "key")
      .option("shards", 8).mode("overwrite").save(d)
    val before = ShardFormat.readManifest(d)
    assert(before.entries.forall(_.sMin.contains("key")),
      "string zone maps must fold at write")
    // updates hit only the TOP of the key space + one new key
    val upd = ((990 until 1000).map(i => (f"k$i%04d", -1L)) :+
      (("zz_new", 7L))).toDF("key", "score")
    ShardOps.upsert(spark, d, upd, "key", txnId = 1, txnApp = Some("s"))
    val after = ShardFormat.readManifest(d)
    // untouched files carried over verbatim (lexicographic bounding)
    val touched = before.entries.filter(e =>
      new String(ShardFormat.unb64(e.sMax("key")), "UTF-8") >= "k0990")
      .map(_.file).toSet
    assert(touched.nonEmpty && touched.size < before.entries.size)
    assert(after.entries.map(_.file).toSet
      .intersect(before.entries.map(_.file).toSet) ==
      before.entries.map(_.file).toSet -- touched)
    val got = spark.read.format("gshard").load(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 1001)
    assert(got("k0995") == -1L && got("zz_new") == 7L && got("k0100") == 100L)
    // replay no-ops on the txn slot
    val gen = after.gen
    ShardOps.upsert(spark, d, upd, "key", txnId = 1, txnApp = Some("s"))
    assert(ShardFormat.readManifest(d).gen == gen)
  }

  test("DATE- and DECIMAL-keyed upserts merge in the storage-long " +
      "domain (days / unscaled)") {
    val sess = spark
    import sess.implicits._
    val dd = tmp("datekey")
    val dbase = (0 until 200).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), i.toLong)).toDF("day", "n")
    dbase.write.format("gshard").option("rangecol", "day")
      .option("shards", 4).mode("overwrite").save(dd)
    val before = ShardFormat.readManifest(dd)
    ShardOps.upsert(spark, dd, Seq(
      (java.sql.Date.valueOf("2024-01-05"), -5L),
      (java.sql.Date.valueOf("2025-12-31"), 99L)).toDF("day", "n"), "day")
    val after = ShardFormat.readManifest(dd)
    // only the file holding 2024-01-05 rewrote
    assert(after.entries.map(_.file).toSet
      .intersect(before.entries.map(_.file).toSet).size ==
      before.entries.size - 1)
    val gotD = spark.read.format("gshard").load(dd).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(gotD.size == 201 && gotD("2024-01-05") == -5L &&
      gotD("2025-12-31") == 99L && gotD("2024-01-06") == 5L)

    val dc = tmp("deckey")
    val cbase = (0 until 100).map(i =>
      (BigDecimal(i) / 100, i.toLong)).toDF("price", "n")
      .select(col("price").cast("decimal(10,2)").as("price"), col("n"))
    cbase.write.format("gshard").option("rangecol", "price")
      .option("shards", 4).mode("overwrite").save(dc)
    ShardOps.upsert(spark, dc,
      Seq((BigDecimal("0.05"), -1L), (BigDecimal("9.99"), 42L))
        .toDF("price", "n")
        .select(col("price").cast("decimal(10,2)").as("price"), col("n")),
      "price")
    val gotC = spark.read.format("gshard").load(dc).collect()
      .map(r => r.getDecimal(0).toPlainString -> r.getLong(1)).toMap
    assert(gotC.size == 101 && gotC("0.05") == -1L && gotC("9.99") == 42L &&
      gotC("0.06") == 6L)
  }

  test("unsupported merge key types reject with a named error") {
    val sess = spark
    import sess.implicits._
    val d = tmp("badkey")
    val base = Seq((1.5, 1L), (2.5, 2L)).toDF("v", "n")
    base.write.format("gshard").option("rangecol", "n")
      .mode("overwrite").save(d)
    val ex = intercept[IllegalArgumentException] {
      ShardOps.upsert(spark, d, Seq((1.5, 9L)).toDF("v", "n"), "v")
    }
    assert(ex.getMessage.contains("merge key"))
  }
}
