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

    // the running dimension lives in the MergeTarget: each of the 5
    // per-day micro-batches must have committed its own version on
    // top of the v=0 seed (if maxFilesPerTrigger were ignored, one
    // big batch would leave only v=0 and v=1), and the pointer must
    // resolve to the last of them
    val tag = s"${SourceOps.runId}_${SourceOps.dirTag(tables.dir)}_25"
    val root = new java.io.File(SourceOps.staging(s"stream_scd2_target_$tag"))
    val versions = root.listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    assert(versions.toSeq == (0L to 5L),
      s"expected v=0..v=5 (seed + 5 daily merges), got ${versions.toSeq}")
    val pointer = new String(java.nio.file.Files.readAllBytes(
      root.toPath.resolve("_latest"))).trim
    assert(pointer == "5 4", // version 5, last applied batch id 4
      s"pointer '$pointer' does not resolve to the final daily merge")
  }
}
