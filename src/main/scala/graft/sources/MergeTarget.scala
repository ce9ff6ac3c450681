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
  *   <version> <batchId> <bv_0> <bv_1> ... <bv_{n-1}>   (one per commit)
  * }}}
  * The LAST line is the head; line `v` (0-based after the header)
  * pins snapshot `v` for time travel. Layout: one bucket stores at
  * `root/v=N` (the unbucketed shape); `n > 1` at `root/b=<i>/v=<N>`.
  *
  * Single sequential writer by design — exactly the streaming
  * `foreachBatch` caller's shape; concurrent writers need the
  * compare-and-swap the real formats provide, which a filesystem
  * rename cannot express portably.
  */
final class MergeTarget private (val spark: SparkSession, root: Path,
    val nBuckets: Int, bucketCol: String) {

  private def pointer: Path = root.resolve("_latest")
  private def bucketDir(b: Int): Path =
    if (nBuckets == 1) root else root.resolve(s"b=$b")
  private def versionDir(b: Int, v: Long): Path =
    bucketDir(b).resolve(s"v=$v")

  private def bucketExpr: Column =
    if (nBuckets == 1) lit(0) else pmod(hash(col(bucketCol)), lit(nBuckets))

  /** All committed history lines: (version, batchId, per-bucket versions). */
  private def history: Seq[(Long, Long, IndexedSeq[Long])] = {
    val lines = new String(Files.readAllBytes(pointer),
      StandardCharsets.UTF_8).trim.split("\n").toIndexedSeq
    require(lines.head.startsWith("buckets "),
      s"bad pointer header: ${lines.head}")
    lines.drop(1).map { l =>
      val p = l.trim.split(" ")
      (p(0).toLong, p(1).toLong, p.drop(2).map(_.toLong).toIndexedSeq)
    }
  }

  private def head: (Long, Long, IndexedSeq[Long]) = history.last

  def version: Long = head._1
  def lastBatchId: Long = head._2

  private def dirsOf(bvs: IndexedSeq[Long]): Seq[String] =
    bvs.zipWithIndex.map { case (bv, b) => versionDir(b, bv).toString }

  /** The current snapshot, pinned to its per-bucket version dirs. */
  def read(): DataFrame =
    spark.read.parquet(dirsOf(head._3): _*)

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
    spark.read.parquet(dirs: _*)
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
    import scala.jdk.CollectionConverters._
    val h = history
    val cutoff = h.length - keep
    val retained = h.drop(cutoff).flatMap(e => e._3.zipWithIndex.map {
      case (bv, b) => (b, bv) }).toSet
    val dropped = (0 until cutoff).filter { v =>
      val dirs = dirsOf(h(v)._3)
      dirs.forall(d => Files.exists(Paths.get(d)))
    }.map(_.toLong)
    (0 until cutoff).foreach { v =>
      h(v)._3.zipWithIndex.foreach { case (bv, b) =>
        if (!retained((b, bv)) && Files.exists(versionDir(b, bv)))
          Files.walk(versionDir(b, bv)).iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
      }
    }
    dropped
  }

  /** Commit by atomic pointer rename: rewrite the (metadata-scale)
    * history with the new head line appended. */
  private def flip(v: Long, batchId: Long, bvs: IndexedSeq[Long],
      prior: Seq[(Long, Long, IndexedSeq[Long])]): Unit = {
    val sb = new StringBuilder
    sb.append(s"buckets $nBuckets ${if (nBuckets == 1) "-" else bucketCol}\n")
    prior.foreach { case (pv, pb, pbvs) =>
      sb.append(s"$pv $pb ${pbvs.mkString(" ")}\n") }
    sb.append(s"$v $batchId ${bvs.mkString(" ")}\n")
    val tmp = root.resolve(s"_latest.tmp.${SourceOps.runId}")
    Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** MERGE `source` into the table through `mergeFn(target, source)`,
    * rewriting only the buckets `source` touches. Returns true if the
    * batch was applied, false if `batchId` was already committed (the
    * replayed-micro-batch no-op). */
  def merge(batchId: Long)(
      mergeFn: (DataFrame, DataFrame) => DataFrame)(
      source: DataFrame): Boolean = {
    val h = history
    val (v, applied, bvs) = h.last
    if (batchId <= applied) return false
    // the batch is consumed twice (bucket probe + the merge itself):
    // stage it once rather than re-running its lineage per pass
    val src = if (nBuckets == 1) source else source.persist()
    try mergeStaged(batchId, mergeFn, src, h, v, bvs)
    finally if (nBuckets > 1) src.unpersist()
  }

  private def mergeStaged(batchId: Long,
      mergeFn: (DataFrame, DataFrame) => DataFrame, source: DataFrame,
      h: Seq[(Long, Long, IndexedSeq[Long])], v: Long,
      bvs: IndexedSeq[Long]): Boolean = {
    val touched: Seq[Int] =
      if (nBuckets == 1) Seq(0)
      else source.select(bucketExpr.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
    val newBvs =
      if (touched.isEmpty) bvs // empty batch: commit, rewrite nothing
      else {
        // the touched buckets' CURRENT snapshots are the merge target;
        // untouched buckets are never read (mergeFn is key-local and
        // pass-through on keys absent from the source)
        val target = spark.read.parquet(
          touched.map(b => versionDir(b, bvs(b)).toString): _*)
        val merged = mergeFn(target, source)
        if (nBuckets == 1) {
          // single bucket: the unbucketed fast path (one write, no move)
          val dst = versionDir(0, bvs(0) + 1)
          merged.write.mode("overwrite").parquet(dst.toString)
          bvs.updated(0, bvs(0) + 1)
        } else {
          // ONE Spark job for all touched buckets: partition the merge
          // output by bucket into a staging dir, then move each bucket
          // subdir into its next version slot (a crash mid-move leaves
          // only orphans — the pointer still names the old dirs)
          import scala.jdk.CollectionConverters._
          val tmp = root.resolve(s"_stage.${SourceOps.runId}.$batchId")
          if (Files.exists(tmp))
            Files.walk(tmp).iterator().asScala.toSeq.reverse
              .foreach(p => Files.deleteIfExists(p))
          merged.withColumn("__b", bucketExpr)
            .write.partitionBy("__b").mode("overwrite").parquet(tmp.toString)
          val next = touched.foldLeft(bvs) { (acc, b) =>
            acc.updated(b, acc(b) + 1) }
          touched.foreach { b =>
            val dst = versionDir(b, next(b))
            if (Files.exists(dst)) // orphan from a pre-flip crash
              Files.walk(dst).iterator().asScala.toSeq.reverse
                .foreach(p => Files.deleteIfExists(p))
            val src = tmp.resolve(s"__b=$b")
            if (Files.exists(src)) Files.move(src, dst)
            else Files.createDirectories(dst) // bucket merged to empty
          }
          Files.walk(tmp).iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
          next
        }
      }
    flip(v + 1, batchId, newBvs, h)
    true
  }
}

object MergeTarget {

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
    val t = new MergeTarget(spark, rootPath, nBuckets, bucketCol)
    if (nBuckets == 1) {
      initial.write.mode("overwrite").parquet(t.versionDir(0, 0L).toString)
    } else {
      val tmp = rootPath.resolve(s"_stage.${SourceOps.runId}.init")
      initial.withColumn("__b", t.bucketExpr)
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
