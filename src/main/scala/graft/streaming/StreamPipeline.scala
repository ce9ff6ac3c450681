package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.pipeline.{CloseReason, NeedCancel, PipelineConfig, ProcessError}

/** Structured-Streaming flavor of the pipeline contract
  * (SURVEY.md §2.1 P11): the same collect→process semantics expressed
  * as `readStream → foreachBatch`, with Spark's own micro-batch engine
  * playing the collector role and a [[StreamingQueryListener]] feeding
  * the batch/item metrics the reference exposes.
  *
  * `NeedCancel` thrown from the batch processor maps to
  * [[CloseReason.ProcessCancel]]; a drained availableNow source maps to
  * [[CloseReason.IdleTimeout]] (the reference's "no more data" end).
  */
final class StreamPipeline(config: PipelineConfig) {

  private val batchCount = new AtomicLong(0)
  private val itemCount = new AtomicLong(0)

  def batches: Long = batchCount.get()
  def items: Long = itemCount.get()

  /** Run `process` over every micro-batch of `source` until the
    * availableNow trigger drains it; returns the close reason and any
    * errors, mirroring `AsyncDataPipeline.perform`.
    */
  def run(source: DataFrame, process: (DataFrame, Long) => Unit): (CloseReason, Seq[Throwable]) = {
    val spark = source.sparkSession
    val reason = new AtomicReference[CloseReason](CloseReason.None)
    val errors = new AtomicReference[List[Throwable]](Nil)

    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batchCount.incrementAndGet()
        itemCount.addAndGet(e.progress.numInputRows)
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val query = source.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("update")
      .foreachBatch { (df: DataFrame, id: Long) =>
        try process(df, id)
        catch {
          case NeedCancel =>
            reason.set(CloseReason.ProcessCancel)
            errors.updateAndGet(ProcessError(NeedCancel, id) :: _)
            throw NeedCancel
          case e: Throwable =>
            errors.updateAndGet(ProcessError(e, id) :: _)
            throw e
        }
      }
      .start()

    try {
      query.awaitTermination()
      if (reason.get() == CloseReason.None) reason.set(CloseReason.IdleTimeout)
    } catch {
      case _: Throwable if reason.get() == CloseReason.ProcessCancel => // graceful sentinel stop
      case e: Throwable if errors.get().nonEmpty => // recorded process failure
      case e: Throwable => errors.updateAndGet(e :: _)
    } finally {
      spark.streams.removeListener(listener)
    }
    (reason.get(), errors.get().reverse)
  }
}
