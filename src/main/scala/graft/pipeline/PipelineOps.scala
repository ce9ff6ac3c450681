package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Pipeline-over-real-data operators (SURVEY.md §2.1 P10). */
object PipelineOps {

  /** `pipeline_ingest` — end-to-end [[AsyncDataPipeline]] run over the
    * events table: collect declares one distributed slice per call
    * (`event_id % nSlices`), process runs a distributed partial
    * aggregation and merges the (tiny, already-aggregated) result into
    * a driver-side accumulator; the slices-exhausted signal is the
    * reference's `NeedCancel` sentinel. The final output matches a
    * plain global aggregation, which is exactly what the DuckDB oracle
    * recomputes — proving batch-wise processing composes to the same
    * answer.
    *
    * Scale: each `process` is a map-side-combined aggregation of one
    * slice — the driver only ever sees per-event-type partials (a few
    * rows), never raw events.
    */
  def pipelineIngest(t: Tables): DataFrame = {
    val spark = t.spark
    val nSlices = 8
    val next = new AtomicInteger(0)
    val done = new AtomicInteger(0)
    val acc = mutable.Map.empty[String, (Long, Double)]

    // batch = (sliceId, plan); sliceId -1 marks an idle filler batch.
    // Cancelling drops still-queued batches (reference semantics:
    // async_data_pipeline.go:297-301 — ctx cancel stops the processor
    // immediately), so the collector only raises NeedCancel once the
    // processor has confirmed every real slice.
    val pipeline = new AsyncDataPipeline[(Int, DataFrame)](
      PipelineConfig(maxWorkers = 4),
      collectFunc = () => {
        val i = next.getAndIncrement()
        if (i < nSlices) {
          (i, t.events.filter(pmod(col("event_id"), lit(nSlices)) === i))
        } else if (done.get() >= nSlices) {
          throw NeedCancel
        } else {
          Thread.sleep(20)
          (-1, t.events.limit(0))
        }
      },
      processFunc = { case (i, df) =>
        if (i >= 0) {
          val partial = df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
            .collect() // aggregated partials only: O(#event_types) rows
          acc.synchronized {
            partial.foreach { r =>
              val k = r.getString(0)
              val (n0, s0) = acc.getOrElse(k, (0L, 0.0))
              acc(k) = (n0 + r.getLong(1), s0 + r.getDouble(2))
            }
          }
          done.incrementAndGet()
        }
      })

    val (reason, errs) = pipeline.perform()
    require(reason == CloseReason.CollectCancel,
      s"pipeline_ingest expected CollectCancel, got $reason (errors: $errs)")

    val rows = acc.toSeq.sortBy(_._1).map { case (k, (n, s)) =>
      Row(k, n, BigDecimal(s).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("event_type", StringType),
        StructField("n", LongType),
        StructField("sum_value", DoubleType))))
  }
}
