package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity

/** Online/offline serving equivalence for the IVF-PQ flagship: the
  * streamed per-micro-batch serve must return EXACTLY the batch
  * flagship's rows — same stored index, same probe/shortlist, so same
  * recall by construction (the recall ≥ flagship pin, as equality).
  * Also pins the driver-memory bound: the drained result is the
  * ranked top-k only (queries × k rows), never the scored candidate
  * set.
  */
class StreamAnnServeSpec extends SparkSpec {

  test("stream_ann_serve equals the batch ann_ivf_pq_topk rows exactly") {
    val streamed = Streaming.streamAnnServe(tables)
      .collect().map(_.toSeq).toSet
    val batch = Similarity.annIvfPqTopK(tables)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch serve diverged: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
    // bounded driver surface: queries × TopK rows, nothing candidate-sized
    assert(streamed.size <= Similarity.NumQueries * Similarity.TopK, streamed.size)
  }
}
