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
