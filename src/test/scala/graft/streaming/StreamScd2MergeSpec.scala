package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scale
import graft.sources.SourceOps

/** The streaming CDC fold must equal the batch merge AND must really
  * run as a sequence of per-day micro-batches — if maxFilesPerTrigger
  * were silently ignored, a single-batch drain would still match the
  * oracle (split-invariance) but would not be the daily-merge shape
  * the operator exists to demonstrate.
  */
class StreamScd2MergeSpec extends SparkSpec {

  private def dimSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("status"), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_days_observed"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4), r.getLong(5)))
      .toSet

  test("stream_scd2_merge equals the batch merge and replays >1 micro-batch") {
    val streamed = dimSet(Streaming.streamScd2Merge(tables))
    val batch = dimSet(Scale.qScd2Merge(tables))
    assert(streamed == batch)

    // the running dimension lives in the BUCKETED MergeTarget: each
    // of the 5 per-day micro-batches must have committed its own
    // version on top of the v=0 seed (if maxFilesPerTrigger were
    // ignored, one big batch would leave only versions 0 and 1), the
    // pointer's HEAD line must resolve to the final daily merge, and
    // the layout must be the 8-bucket one whose commit bytes scale
    // with the touched buckets
    val tag = s"${SourceOps.runId}_${SourceOps.dirTag(tables.dir)}_25"
    val root = new java.io.File(SourceOps.staging(s"stream_scd2_target_$tag"))
    val buckets = root.listFiles().map(_.getName)
      .filter(_.startsWith("b=")).sorted
    assert(buckets.toSeq == (0 until 8).map(b => s"b=$b"),
      s"expected 8 bucket dirs, got ${buckets.toSeq}")
    val allLines = new String(java.nio.file.Files.readAllBytes(
      root.toPath.resolve("_latest"))).trim.split("\n").toSeq
    assert(allLines.head == "buckets 8 user_id", allLines.head)
    // the pointer carries the table schema (empty-bucket reads plan
    // with it instead of failing inference)
    assert(allLines.exists(_.startsWith("schema ")),
      s"pointer lacks the schema header:\n${allLines.mkString("\n")}")
    val lines = allLines.filterNot(_.startsWith("schema "))
    assert(lines.size == 7, // header + seed + 5 daily commits
      s"expected 6 committed versions, got:\n${lines.mkString("\n")}")
    val head = lines.last.split(" ")
    assert(head(0) == "5" && head(1) == "4", // version 5, last batch id 4
      s"head line '${lines.last}' does not resolve to the final daily merge")
    // only TOUCHED buckets gained versions: each bucket's on-disk
    // version dirs are exactly the distinct versions its pointer
    // column went through (untouched days share the prior directory)
    val perBucket = lines.drop(1).map(_.split(" ").drop(2).map(_.toLong))
    (0 until 8).foreach { b =>
      val expect = perBucket.map(_(b)).distinct.sorted
      val onDisk = new java.io.File(root, s"b=$b").listFiles()
        .map(_.getName).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong).sorted.toSeq
      assert(onDisk == expect,
        s"bucket $b: dirs $onDisk != pointer history ${expect}")
    }
  }
}
