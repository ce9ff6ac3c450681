package graft.sources.shard.tests

import java.nio.file.{Files, Paths}

import graft.sources.shard.ShardFormat

/** Forked-JVM writer for the CROSS-PROCESS commit race spec: performs
  * `n` appends against a gshard table's MANIFEST through the real
  * commit protocol ([[ShardFormat.publishManifest]]) with the
  * standard lost-race retry loop. Run as a plain `java -cp` main (no
  * SparkSession — manifest commits are pure filesystem protocol), two
  * instances concurrently: the per-process `tableLock` offers NO
  * cross-process protection, so every interleaving lands on the
  * exclusive-create commit record — the CAS under test.
  *
  * args: dir nCommits tag goFile
  * Spins until `goFile` exists (the two processes start together),
  * then commits entries named `part-<tag>-<i>.gshard`. Prints
  * `done <tag> <attempts>` on success; any failure exits nonzero. */
object ShardRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr, tag, goFile) = args
    val n = nStr.toInt
    while (!Files.exists(Paths.get(goFile))) Thread.sleep(5)
    var attempts = 0
    var i = 0
    while (i < n) {
      attempts += 1
      require(attempts < n * 200, s"gshard race writer $tag: livelock")
      val head = ShardFormat.readManifest(dir)
      val e = ShardFormat.ShardEntry(s"part-$tag-$i.gshard", 1L,
        Map("id" -> i.toLong), Map("id" -> i.toLong),
        nullCnt = Map("id" -> 0L))
      try {
        ShardFormat.publishManifest(dir,
          ShardFormat.Manifest(head.schema, head.entries :+ e,
            head.lastTxn, head.txns), basedOn = head.gen)
        i += 1
      } catch {
        case _: java.util.ConcurrentModificationException => () // re-plan
      }
    }
    println(s"done $tag $attempts")
  }
}
