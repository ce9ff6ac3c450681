package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** B18 — a minimal MERGE-capable, versioned table over parquet: the
  * transactional-sink contract a production deploy gets from Delta
  * Lake / Iceberg, reduced to the three properties the engine's
  * stateful lifecycles actually rely on — and TESTED here, because
  * neither format's jars are addable in this build environment
  * (offline resolver, zero egress), which had left "a Delta/Iceberg
  * MERGE target in production" as an untested scaladoc claim.
  *
  *  1. '''Atomic commit''' — a merge writes its full output to a
  *     fresh `v=N+1/` directory, then flips a one-line pointer file
  *     into place with an atomic same-directory rename (the
  *     last-pointer design of Delta's `_last_checkpoint` and the
  *     classic rename-commit): a reader resolves the pointer and
  *     sees the pre-merge or post-merge snapshot, never a partial
  *     write. A crash after the data write but before the flip
  *     leaves an orphan version directory that no reader ever
  *     resolves; the next merge overwrites it.
  *  2. '''Snapshot isolation for readers''' — [[read]] resolves the
  *     pointer once and returns a frame pinned to that version's
  *     directory; later commits create NEW directories, so the frame
  *     keeps returning its snapshot no matter how many merges land
  *     after it.
  *  3. '''Transactional idempotence per batch''' — the pointer
  *     records the last applied batch id (Delta's txnAppId/txnVersion
  *     pattern): `foreachBatch` replays a batch after a restart, and
  *     re-merging an already-committed id must be a no-op, not a
  *     double-application.
  *
  * Single sequential writer by design — exactly the streaming
  * `foreachBatch` caller's shape; concurrent writers need the
  * compare-and-swap the real formats provide, which a filesystem
  * rename cannot express portably.
  */
final class MergeTarget private (val spark: SparkSession, root: Path) {

  private def pointer: Path = root.resolve("_latest")
  private def versionDir(v: Long): Path = root.resolve(s"v=$v")

  /** (current version, last applied batch id) from the pointer file. */
  private def state: (Long, Long) = {
    val parts = new String(Files.readAllBytes(pointer),
      StandardCharsets.UTF_8).trim.split(" ")
    (parts(0).toLong, parts(1).toLong)
  }

  def version: Long = state._1
  def lastBatchId: Long = state._2

  /** The current snapshot, pinned to its version directory. */
  def read(): DataFrame = spark.read.parquet(versionDir(version).toString)

  /** TIME TRAVEL: any committed snapshot by version number — versions
    * are immutable directories, so an old read is just a pinned scan
    * (the Delta `VERSION AS OF` shape). Orphan directories beyond the
    * pointer are uncommitted and refused; vacuumed versions fail
    * loudly rather than returning a partial scan. */
  def readVersion(v: Long): DataFrame = {
    require(v >= 0 && v <= version,
      s"version $v not committed (head is $version)")
    require(Files.exists(versionDir(v)),
      s"version $v was vacuumed (retained: last versions up to $version)")
    spark.read.parquet(versionDir(v).toString)
  }

  /** RETENTION: drop all version directories older than the newest
    * `keep` (the Delta VACUUM contract): time travel to a dropped
    * version then fails loudly via [[readVersion]]'s existence check,
    * the pointer and the newest `keep` snapshots are never touched,
    * and the head read is unaffected. Returns the dropped versions. */
  def vacuum(keep: Int): Seq[Long] = {
    require(keep >= 1, s"must keep at least the head (keep=$keep)")
    import scala.jdk.CollectionConverters._
    val cutoff = version - keep + 1
    val dropped = (0L until cutoff).filter(v => Files.exists(versionDir(v)))
    dropped.foreach { v =>
      Files.walk(versionDir(v)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    dropped
  }

  /** Commit `(version, batchId)` by atomic pointer rename. */
  private def flip(v: Long, batchId: Long): Unit = {
    val tmp = root.resolve(s"_latest.tmp.${SourceOps.runId}")
    Files.write(tmp, s"$v $batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** MERGE `source` into the table through `mergeFn(target, source)`.
    * Returns true if the batch was applied, false if `batchId` was
    * already committed (the replayed-micro-batch no-op). */
  def merge(batchId: Long)(
      mergeFn: (DataFrame, DataFrame) => DataFrame)(
      source: DataFrame): Boolean = {
    val (v, applied) = state
    if (batchId <= applied) false
    else {
      // full output to a FRESH directory (overwrite clears any orphan
      // a pre-flip crash left behind); the source snapshot's dir is
      // never touched, so the lazy mergeFn reads a consistent input
      mergeFn(spark.read.parquet(versionDir(v).toString), source)
        .write.mode("overwrite").parquet(versionDir(v + 1).toString)
      flip(v + 1, batchId)
      true
    }
  }
}

object MergeTarget {

  /** Initialize a target at `root` with `initial` as version 0 (no
    * batch applied yet). Wipes any previous table at the path. */
  def create(spark: SparkSession, root: String,
      initial: DataFrame): MergeTarget = {
    import scala.jdk.CollectionConverters._
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      Files.walk(rootPath).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    Files.createDirectories(rootPath)
    val t = new MergeTarget(spark, rootPath)
    initial.write.mode("overwrite").parquet(t.versionDir(0L).toString)
    t.flip(0L, -1L)
    t
  }
}
