package graft.sources.shard.tests

import org.apache.spark.sql.sources.Filter

import graft.sources.shard.{ShardFormat, ShardTable}

/** Test-only handle onto the package-private [[ShardTable]] API —
  * lets specs outside the shard package probe the metadata-delete
  * decision procedure directly. */
class TableProbe(dir: String) {
  private val table =
    new ShardTable(dir, ShardFormat.readManifest(dir).schema)
  def canDeleteWhere(filters: Array[Filter]): Boolean =
    table.canDeleteWhere(filters)
}

/** Test-only handles onto `private[shard]` format internals. */
object FormatProbe {
  /** Replay the FIRST HALF of a foreign process's commit — the
    * exclusive-create of the next generation's commit record, WITHOUT
    * the head-pointer move — to drive the crash/interleave windows
    * from specs. */
  def forgeCommitRecord(dir: String,
      m: ShardFormat.Manifest, gen: Long): Unit =
    ShardFormat.linkCommitRecord(dir, m.copy(gen = gen))

  def commitRecordGens(dir: String): Seq[Long] =
    ShardFormat.commitRecordGens(dir)

  def maybeDeflate(raw: Array[Byte]): Option[Array[Byte]] =
    ShardFormat.maybeDeflate(raw)

  def inflate(comp: Array[Byte]): Array[Byte] =
    ShardFormat.inflate(comp)
}
