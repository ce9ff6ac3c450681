package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** B18 — a minimal MERGE-capable, versioned, BUCKETED table over
  * parquet: the transactional-sink contract a production deploy gets
  * from Delta Lake / Iceberg, reduced to the properties the engine's
  * stateful lifecycles actually rely on — and TESTED here, because
  * neither format's jars are addable in this build environment
  * (offline resolver, zero egress), which had left "a Delta/Iceberg
  * MERGE target in production" as an untested scaladoc claim.
  *
  *  1. '''Atomic commit''' — a merge writes its output to FRESH
  *     per-bucket version directories, then flips a pointer file into
  *     place with an atomic same-directory rename (the last-pointer
  *     design of Delta's `_last_checkpoint` and the classic
  *     rename-commit): a reader resolves the pointer and sees the
  *     pre-merge or post-merge snapshot, never a partial write. A
  *     crash after the data write but before the flip leaves orphan
  *     version directories no reader ever resolves; the next merge
  *     overwrites them.
  *  2. '''Snapshot isolation for readers''' — [[read]] resolves the
  *     pointer once and returns a frame pinned to that version's
  *     directories; later commits create NEW directories, so the
  *     frame keeps returning its snapshot no matter how many merges
  *     land after it.
  *  3. '''Transactional idempotence per batch''' — the pointer
  *     records the last applied batch id (Delta's txnAppId/txnVersion
  *     pattern): `foreachBatch` replays a batch after a restart, and
  *     re-merging an already-committed id must be a no-op, not a
  *     double-application.
  *  4. '''Commit cost scales with the CHANGE''' — the table
  *     hash-buckets on a caller-named key column into `nBuckets`
  *     fixed subdirectories, each with its own version chain, and
  *     [[merge]] rewrites ONLY the buckets the batch touches (the
  *     pointer lists per-bucket versions; untouched buckets keep
  *     their directories byte-identical — still one atomic flip).
  *     At 100 TB this is the difference between "MERGE cost tracks
  *     the CDC day" and "every daily merge rewrites the dimension":
  *     with enough buckets, bytes written per commit ∝ touched
  *     buckets ∝ touched keys, the Delta/Iceberg data-skipping merge
  *     shape. Requires `mergeFn` to be KEY-LOCAL in the bucket
  *     column — rows of one key never affect another key's output,
  *     and keys absent from the source pass through unchanged (true
  *     of upserts and the SCD2 merge; both spec-pinned) — because
  *     untouched buckets are never even read.
  *
  * Pointer file `_latest` (whole file rewritten per commit, atomic
  * rename — history is one short line per version, metadata-scale):
  * {{{
  *   buckets <n> <bucketCol>
  *   schema <ddl>                                       (table schema)
  *   <version> <batchId> <bv_0> <bv_1> ... <bv_{n-1}>   (one per commit)
  * }}}
  * The LAST line is the head; line `v` (0-based after the header)
  * pins snapshot `v` for time travel. Layout: one bucket stores at
  * `root/v=N` (the unbucketed shape); `n > 1` at `root/b=<i>/v=<N>`.
  * The pointer CARRIES THE SCHEMA so every read plans with
  * `spark.read.schema(...)` — bucket version directories can be
  * legitimately EMPTY (a bucket the key space never hit, or one a
  * merge emptied), and schema inference over an all-empty read set
  * would otherwise throw instead of returning the empty frame.
  *
  * Single sequential writer by design — a filesystem rename cannot
  * express compare-and-swap, so concurrency is DETECTED, not
  * prevented: [[merge]] re-reads the pointer around the flip and a
  * writer that lost the race fails LOUDLY (the table stays at the
  * winner's commit) instead of silently clobbering it.
  */
final class MergeTarget private (val spark: SparkSession, root: Path,
    val nBuckets: Int, bucketCol: String,
    tableSchema: org.apache.spark.sql.types.StructType) {

  private def pointer: Path = root.resolve("_latest")
  private def bucketDir(b: Int): Path =
    if (nBuckets == 1) root else root.resolve(s"b=$b")
  private def versionDir(b: Int, v: Long): Path =
    bucketDir(b).resolve(s"v=$v")

  private def bucketExpr: Column =
    if (nBuckets == 1) lit(0) else pmod(hash(col(bucketCol)), lit(nBuckets))

  private def wipe(p: Path): Unit = if (Files.exists(p)) {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(q => Files.deleteIfExists(q))
  }

  /** All committed history lines: (version, batchId, per-bucket versions). */
  private def history: Seq[(Long, Long, IndexedSeq[Long])] = {
    val lines = new String(Files.readAllBytes(pointer),
      StandardCharsets.UTF_8).trim.split("\n").toIndexedSeq
    require(lines.head.startsWith("buckets "),
      s"bad pointer header: ${lines.head}")
    lines.drop(1).filterNot(_.startsWith("schema ")).map { l =>
      val p = l.trim.split(" ")
      (p(0).toLong, p(1).toLong, p.drop(2).map(_.toLong).toIndexedSeq)
    }
  }

  private def head: (Long, Long, IndexedSeq[Long]) = history.last

  def version: Long = head._1
  def lastBatchId: Long = head._2

  private def dirsOf(bvs: IndexedSeq[Long]): Seq[String] =
    bvs.zipWithIndex.map { case (bv, b) => versionDir(b, bv).toString }

  /** The current snapshot, pinned to its per-bucket version dirs.
    * EXPLICIT schema: empty bucket directories read as empty frames,
    * never as an inference failure. */
  def read(): DataFrame =
    spark.read.schema(tableSchema).parquet(dirsOf(head._3): _*)

  /** TIME TRAVEL: any committed snapshot by version number — bucket
    * versions are immutable directories, so an old read is just a
    * pinned multi-dir scan (the Delta `VERSION AS OF` shape). Orphan
    * directories beyond the history are uncommitted and unreachable;
    * vacuumed versions fail loudly rather than returning a partial
    * scan. */
  def readVersion(v: Long): DataFrame = {
    val h = history
    require(v >= 0 && v < h.length,
      s"version $v not committed (head is ${h.last._1})")
    val dirs = dirsOf(h(v.toInt)._3)
    require(dirs.forall(d => Files.exists(Paths.get(d))),
      s"version $v was vacuumed (retained: newest snapshots only)")
    spark.read.schema(tableSchema).parquet(dirs: _*)
  }

  /** RETENTION: drop bucket-version directories referenced ONLY by
    * versions older than the newest `keep` (the Delta VACUUM
    * contract): time travel to a dropped version then fails loudly
    * via [[readVersion]]'s existence check; directories a retained
    * snapshot still references are never touched (untouched buckets
    * SHARE directories across versions), and the head read is
    * unaffected. Returns the dropped versions. */
  def vacuum(keep: Int): Seq[Long] = {
    require(keep >= 1, s"must keep at least the head (keep=$keep)")
    val h = history
    val cutoff = h.length - keep
    val retained = h.drop(cutoff).flatMap(e => e._3.zipWithIndex.map {
      case (bv, b) => (b, bv) }).toSet
    // dirs this vacuum will ACTUALLY delete: pre-cutoff references
    // minus anything a retained snapshot still shares, minus anything
    // a previous vacuum already removed
    val deletable = (0 until cutoff)
      .flatMap(v => h(v)._3.zipWithIndex.map { case (bv, b) => (b, bv) })
      .toSet.diff(retained)
      .filter { case (b, bv) => Files.exists(versionDir(b, bv)) }
    // a version is REPORTED dropped only if this pass deletes at least
    // one of its directories (readVersion on it newly fails) — never
    // for versions whose dirs all survive via sharing, and never
    // re-reported for versions an earlier vacuum already dropped
    val dropped = (0 until cutoff).filter { v =>
      h(v)._3.zipWithIndex.exists { case (bv, b) => deletable((b, bv)) }
    }.map(_.toLong)
    deletable.foreach { case (b, bv) => wipe(versionDir(b, bv)) }
    dropped
  }

  /** The pointer must still read exactly as the history this merge
    * was based on — otherwise a concurrent writer committed in
    * between and THIS writer must abort before touching any slot the
    * winner's pointer names. */
  private def assertUnchanged(
      prior: Seq[(Long, Long, IndexedSeq[Long])]): Unit = {
    val now = new String(Files.readAllBytes(pointer),
      StandardCharsets.UTF_8)
    if (now != render(prior))
      throw new IllegalStateException(
        s"concurrent writer detected at $root: the pointer advanced " +
          s"past the snapshot this merge was based on (expected head " +
          s"${prior.last._1}); this commit is ABANDONED — the other " +
          "writer's commit stands")
  }

  private def render(lines: Seq[(Long, Long, IndexedSeq[Long])]): String = {
    val sb = new StringBuilder
    sb.append(s"buckets $nBuckets ${if (nBuckets == 1) "-" else bucketCol}\n")
    sb.append(s"schema ${tableSchema.toDDL}\n")
    lines.foreach { case (pv, pb, pbvs) =>
      sb.append(s"$pv $pb ${pbvs.mkString(" ")}\n") }
    sb.toString
  }

  /** Commit by atomic pointer rename: rewrite the (metadata-scale)
    * history with the new head line appended.
    *
    * LOST-RACE DETECTION (not prevention — the honest contract a
    * filesystem rename can give): the pointer is re-read immediately
    * before AND after the rename, and a mismatch raises a
    * concurrent-writer error. The loser of an interleaving fails
    * loudly with the winner's commit intact, instead of silently
    * clobbering it; true prevention needs the compare-and-swap the
    * production formats get from their log stores. */
  private def flip(v: Long, batchId: Long, bvs: IndexedSeq[Long],
      prior: Seq[(Long, Long, IndexedSeq[Long])]): Unit = {
    if (prior.nonEmpty) assertUnchanged(prior)
    val content = render(prior) + s"$v $batchId ${bvs.mkString(" ")}\n"
    val tmp = root.resolve(s"_latest.tmp.${SourceOps.runId}")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val after = new String(Files.readAllBytes(pointer),
      StandardCharsets.UTF_8)
    if (after != content)
      throw new IllegalStateException(
        s"concurrent writer detected at $root: another pointer landed " +
          s"over this commit (version $v, batch $batchId) — the table " +
          "reflects the LAST rename; treat this batch as not applied")
  }

  /** MERGE `source` into the table through `mergeFn(target, source)`,
    * rewriting only the buckets `source` touches. Returns true if the
    * batch was applied, false if `batchId` was already committed (the
    * replayed-micro-batch no-op).
    *
    * Bucketed cost shape, PER COMMIT: (1) ONE job stages the source
    * partitioned by bucket — the source lineage runs exactly once;
    * (2) the touched-bucket set falls out of the staged `__b=*`
    * directory listing for FREE (no separate distinct-collect probe
    * job, no persist); (3) ONE job merges the touched buckets'
    * snapshots with the staged source and writes the output
    * partitioned by bucket; (4) directory moves + the pointer flip.
    * Two jobs total, both proportional to the CHANGE. */
  def merge(batchId: Long)(
      mergeFn: (DataFrame, DataFrame) => DataFrame)(
      source: DataFrame): Boolean = {
    val h = history
    val (v, applied, bvs) = h.last
    if (batchId <= applied) return false
    val newBvs =
      if (nBuckets == 1) {
        // single bucket: stage the merge output, VERIFY the pointer
        // hasn't moved (a concurrent winner's committed version dir
        // must never be clobbered by the loser's data write), then
        // move into the next version slot; explicit schema — the
        // current version dir may be empty
        val target = spark.read.schema(tableSchema)
          .parquet(versionDir(0, bvs(0)).toString)
        val tmp = root.resolve(s"_stage.${SourceOps.runId}.$batchId")
        wipe(tmp)
        mergeFn(target, source).write.mode("overwrite").parquet(tmp.toString)
        assertUnchanged(h)
        val dst = versionDir(0, bvs(0) + 1)
        wipe(dst) // orphan from a pre-flip crash
        Files.move(tmp, dst)
        bvs.updated(0, bvs(0) + 1)
      } else {
        // STAGE FIRST: one job writes the source partitioned by
        // bucket. The repartition matters: partitionBy WITHOUT it has
        // every input task write one file per bucket it holds (tasks ×
        // buckets small files, and the next read pays the scheduling);
        // clustering by the bucket expr first lands ONE file per
        // touched bucket — the shuffle is proportional to the batch
        val srcTmp = root.resolve(s"_src.${SourceOps.runId}.$batchId")
        wipe(srcTmp)
        source.withColumn("__b", bucketExpr)
          .repartition(nBuckets, col("__b"))
          .write.partitionBy("__b").mode("overwrite").parquet(srcTmp.toString)
        // touched buckets = the staged partition directories (free)
        val touched: Seq[Int] = {
          import scala.jdk.CollectionConverters._
          Files.list(srcTmp).iterator().asScala
            .map(_.getFileName.toString)
            .filter(_.startsWith("__b="))
            .map(_.stripPrefix("__b=").toInt).toSeq.sorted
        }
        val next =
          if (touched.isEmpty) { // empty batch: commit, rewrite nothing
            wipe(srcTmp)
            bvs
          } else {
            // the touched buckets' CURRENT snapshots are the merge
            // target; untouched buckets are never read (mergeFn is
            // key-local and pass-through on keys absent from the
            // source). Both reads carry explicit schemas: target
            // version dirs can be legitimately empty, and the staged
            // leaf dirs are read without partition discovery.
            val target = spark.read.schema(tableSchema).parquet(
              touched.map(b => versionDir(b, bvs(b)).toString): _*)
            val stagedSrc = spark.read.schema(source.schema).parquet(
              touched.map(b => srcTmp.resolve(s"__b=$b").toString): _*)
            val merged = mergeFn(target, stagedSrc)
            // ONE job for all touched buckets: partition the merge
            // output by bucket, then move each bucket subdir into its
            // next version slot (a crash mid-move leaves only orphans
            // — the pointer still names the old dirs)
            val tmp = root.resolve(s"_stage.${SourceOps.runId}.$batchId")
            wipe(tmp)
            merged.withColumn("__b", bucketExpr)
              .repartition(nBuckets, col("__b")) // one file per bucket
              .write.partitionBy("__b").mode("overwrite")
              .parquet(tmp.toString)
            // VERIFY before touching any committed slot: a concurrent
            // winner's version dirs must never be clobbered by the
            // loser's moves (everything above only wrote staging)
            assertUnchanged(h)
            val nx = touched.foldLeft(bvs) { (acc, b) =>
              acc.updated(b, acc(b) + 1) }
            touched.foreach { b =>
              val dst = versionDir(b, nx(b))
              wipe(dst) // orphan from a pre-flip crash
              val src = tmp.resolve(s"__b=$b")
              if (Files.exists(src)) Files.move(src, dst)
              else Files.createDirectories(dst) // bucket merged to empty
            }
            wipe(tmp)
            wipe(srcTmp)
            nx
          }
        next
      }
    flip(v + 1, batchId, newBvs, h)
    true
  }
}

object MergeTarget {

  /** Attach a writer/reader to an EXISTING table from its pointer
    * alone — bucketing and the table schema both ride in the header,
    * so a second process (or the two-writer race spec) needs no
    * side-channel metadata. Does NOT wipe anything. */
  def attach(spark: SparkSession, root: String): MergeTarget = {
    val rootPath = Paths.get(root)
    val lines = new String(
      Files.readAllBytes(rootPath.resolve("_latest")),
      StandardCharsets.UTF_8).trim.split("\n").toIndexedSeq
    require(lines.head.startsWith("buckets "),
      s"bad pointer header: ${lines.head}")
    val hp = lines.head.split(" ")
    val n = hp(1).toInt
    val bcol = if (hp(2) == "-") null else hp(2)
    val ddl = lines.find(_.startsWith("schema "))
      .map(_.stripPrefix("schema "))
      .getOrElse(throw new IllegalStateException(
        s"$root: pointer predates the schema header — rewrite the table"))
    new MergeTarget(spark, rootPath, n, bcol,
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** Initialize an UNBUCKETED target at `root` with `initial` as
    * version 0 — the shape for metadata-scale dimensions where every
    * merge may legitimately rewrite the table. */
  def create(spark: SparkSession, root: String,
      initial: DataFrame): MergeTarget =
    create(spark, root, initial, bucketCol = null, nBuckets = 1)

  /** Initialize a target at `root` hash-bucketed on `bucketCol` into
    * `nBuckets` sub-tables, with `initial` as version 0 (no batch
    * applied yet). Wipes any previous table at the path. The initial
    * load is ONE partitioned write + directory moves, not a job per
    * bucket. */
  def create(spark: SparkSession, root: String, initial: DataFrame,
      bucketCol: String, nBuckets: Int): MergeTarget = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(nBuckets == 1 || bucketCol != null,
      "bucketed target needs a bucket column")
    import scala.jdk.CollectionConverters._
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      Files.walk(rootPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(rootPath)
    val t = new MergeTarget(spark, rootPath, nBuckets, bucketCol,
      initial.schema)
    if (nBuckets == 1) {
      initial.write.mode("overwrite").parquet(t.versionDir(0, 0L).toString)
    } else {
      val tmp = rootPath.resolve(s"_stage.${SourceOps.runId}.init")
      initial.withColumn("__b", t.bucketExpr)
        .repartition(nBuckets, col("__b")) // one file per bucket
        .write.partitionBy("__b").mode("overwrite").parquet(tmp.toString)
      (0 until nBuckets).foreach { b =>
        val dst = t.versionDir(b, 0L)
        Files.createDirectories(dst.getParent)
        val src = tmp.resolve(s"__b=$b")
        if (Files.exists(src)) Files.move(src, dst)
        else Files.createDirectories(dst) // key space missed the bucket
      }
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    t.flip(0L, -1L, IndexedSeq.fill(nBuckets)(0L), Seq.empty)
    t
  }
}
