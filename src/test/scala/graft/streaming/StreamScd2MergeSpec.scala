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

    // the per-batch dimension versions written by the foreachBatch
    // fold: at least batches 0 and 1 must exist (5 increment days →
    // 5 sequential merges at one file per trigger)
    val tag = s"${SourceOps.runId}_${SourceOps.dirTag(tables.dir)}_25"
    (0 to 1).foreach { id =>
      val p = new java.io.File(SourceOps.staging(s"stream_scd2_${tag}_b$id"))
      assert(p.exists, s"micro-batch $id dimension version missing at $p")
    }
  }
}
