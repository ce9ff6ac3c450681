package graft.pipeline

import java.util.concurrent.{ArrayBlockingQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.concurrent.duration._
import scala.util.control.NoStackTrace

/** Sentinel signalling that the collect/process function wants the
  * pipeline to terminate gracefully (reference:
  * /root/reference/async_data_pipeline.go:14-16 `ErrNeedCancel`).
  */
object NeedCancel extends RuntimeException("need to cancel operation") with NoStackTrace

/** Invalid `maxWorkers` configuration (reference:
  * async_data_pipeline.go:18-20 `ErrInvalidMaxWorkers`). */
final class InvalidMaxWorkersException(msg: String)
  extends IllegalArgumentException(s"invalid MaxWorkers parameter: $msg")

/** Error wrapper for collect-side failures (reference:
  * async_data_pipeline.go:22-34 `CollectError`). */
final case class CollectError(cause: Throwable)
  extends RuntimeException(s"collect error: ${cause.getMessage}", cause)

/** Error wrapper for process-side failures, carrying the batch that
  * failed (reference: async_data_pipeline.go:36-48 `ProcessError`). */
final case class ProcessError[B](cause: Throwable, data: B)
  extends RuntimeException(s"process error: ${cause.getMessage}", cause)

/** Why the pipeline stopped (reference: async_data_pipeline.go:194-217
  * `CloseReason`). */
sealed abstract class CloseReason(val render: String) {
  override def toString: String = render
}
object CloseReason {
  case object None extends CloseReason("None")
  case object IdleTimeout extends CloseReason("Idle Timeout")
  case object CollectCancel extends CloseReason("Collection Cancelled")
  case object ProcessCancel extends CloseReason("Processing Cancelled")
}

/** Pipeline configuration (reference: async_data_pipeline.go:50-63).
  *
  * `maxWorkers` bounds in-flight batches (the channel capacity in the
  * reference; the queue capacity here). On Spark it additionally
  * documents the intended batch parallelism — inside a batch,
  * concurrency comes from partitions, not threads, so a cluster-side
  * deployment maps it to `spark.sql.shuffle.partitions` guidance.
  */
final case class PipelineConfig(
    maxWorkers: Int,
    idleTime: FiniteDuration = 1.second,
    collectTimeout: FiniteDuration = 5.seconds)

/** Generic asynchronous collect→process pipeline over typed batches —
  * the Spark-native re-expression of the reference engine
  * (/root/reference/async_data_pipeline.go:222-345 `Perform`).
  *
  * One collector thread repeatedly calls `collect` and enqueues batches
  * into a bounded queue (capacity `maxWorkers`); one processor thread
  * drains it. In the intended Spark deployment the batch type `B` is a
  * `Dataset`/`DataFrame` (see [[AsyncDataPipeline.ofDataset]]): collect
  * *declares* a distributed batch (cheap, lazy) and process runs a
  * distributed action on it, so the driver-side threads only
  * orchestrate — all heavy lifting stays on the cluster and the queue
  * holds plan handles, not data.
  *
  * Close semantics mirror the reference exactly:
  *  - `NeedCancel` thrown from collect → [[CloseReason.CollectCancel]]
  *  - `NeedCancel` thrown from process → [[CloseReason.ProcessCancel]]
  *  - no batch delivered for `idleTime` → [[CloseReason.IdleTimeout]]
  *  - enqueue blocked for `collectTimeout` → collect error, collector
  *    stops (reference: async_data_pipeline.go:276-288)
  * Non-sentinel exceptions are accumulated as [[CollectError]] /
  * [[ProcessError]] and stop the side that threw.
  */
final class AsyncDataPipeline[B](
    val config: PipelineConfig,
    collectFunc: () => B,
    processFunc: B => Unit,
    itemCount: B => Long = (_: B) => 1L) {

  {
    val maxAllowed = Runtime.getRuntime.availableProcessors() * 4
    if (config.maxWorkers <= 0)
      throw new InvalidMaxWorkersException("MaxWorkers must be greater than 0")
    if (config.maxWorkers > maxAllowed)
      throw new InvalidMaxWorkersException(
        s"MaxWorkers (${config.maxWorkers}) exceeds maximum allowed value ($maxAllowed)")
  }

  private val metrics = new MetricsState
  private val cancelled = new AtomicBoolean(false)
  @volatile private var closeReason: CloseReason = CloseReason.None
  private val errors = new scala.collection.mutable.ArrayBuffer[Throwable]
  private val errorLock = new Object

  private def addError(e: Throwable): Unit =
    errorLock.synchronized { errors += e }

  /** Snapshot of the live metrics (reference: `GetCurrentMetrics`). */
  def getCurrentMetrics: PipelineMetrics = metrics.snapshot

  /** Flat export of the current metrics (reference: `ExportMetrics`). */
  def exportMetrics: Map[String, Any] = {
    val m = getCurrentMetrics
    Map(
      "total_duration" -> m.totalDuration.toNanos / 1e9,
      "processing_duration" -> m.processingDuration.toNanos / 1e9,
      "idle_duration" -> m.idleDuration.toNanos / 1e9,
      "batch_count" -> m.batchCount,
      "item_count" -> m.itemCount,
      "idle_ratio" -> m.idleRatio)
  }

  /** Register a polled metrics callback (reference: `SubscribeMetrics`).
    * Intervals ≤ 0 default to one second, as in the reference. */
  def subscribeMetrics(
      callback: PipelineMetrics => Unit,
      interval: FiniteDuration = 1.second): MetricsSubscription = {
    val effective = if (interval <= Duration.Zero) 1.second else interval
    MetricsSubscription.start(effective, () => callback(getCurrentMetrics))
  }

  /** Cancel a subscription (reference: `UnsubscribeMetrics`). */
  def unsubscribeMetrics(sub: MetricsSubscription): Unit =
    if (sub != null) sub.stop()

  /** Request external cancellation (the reference's ctx cancel). */
  def cancel(): Unit = cancelled.set(true)

  /** Run the pipeline to completion; returns the close reason and all
    * accumulated errors (reference: async_data_pipeline.go:222-345).
    */
  def perform(): (CloseReason, Seq[Throwable]) = {
    metrics.start()
    val queue = new ArrayBlockingQueue[B](config.maxWorkers)
    val done = new CountDownLatch(2)

    val collector = new Thread(() => {
      try {
        var running = true
        while (running && !cancelled.get()) {
          val batch =
            try Right(collectFunc())
            catch { case e: Throwable => Left(e) }
          batch match {
            case Left(NeedCancel) =>
              closeReason = CloseReason.CollectCancel
              cancelled.set(true)
              addError(CollectError(NeedCancel))
              running = false
            case Left(e) =>
              addError(CollectError(e))
              running = false
            case Right(b) =>
              // bounded enqueue with the reference's send timeout
              var waited = 0L
              val stepMs = 10L
              var enqueued = false
              while (!enqueued && !cancelled.get() && running) {
                enqueued = queue.offer(b, stepMs, TimeUnit.MILLISECONDS)
                if (!enqueued) {
                  waited += stepMs
                  if (waited >= config.collectTimeout.toMillis) {
                    addError(CollectError(new RuntimeException(
                      s"collect timeout: ${config.collectTimeout}")))
                    running = false
                  }
                }
              }
              if (enqueued) metrics.recordBatch(itemCount(b))
          }
        }
      } finally done.countDown()
    }, "graft-pipeline-collector")

    val processor = new Thread(() => {
      try {
        var running = true
        while (running && !cancelled.get()) {
          val b = queue.poll(config.idleTime.toMillis, TimeUnit.MILLISECONDS)
          if (b == null) {
            if (!cancelled.get()) {
              closeReason = CloseReason.IdleTimeout
              cancelled.set(true)
            }
            running = false
          } else {
            metrics.recordArrival()
            val t0 = System.nanoTime()
            try {
              processFunc(b)
              metrics.recordProcessing(System.nanoTime() - t0)
            } catch {
              case NeedCancel =>
                closeReason = CloseReason.ProcessCancel
                cancelled.set(true)
                addError(ProcessError(NeedCancel, b))
                running = false
              case e: Throwable =>
                addError(ProcessError(e, b))
                running = false
            }
          }
        }
      } finally done.countDown()
    }, "graft-pipeline-processor")

    collector.setDaemon(true)
    processor.setDaemon(true)
    collector.start()
    processor.start()
    done.await()
    metrics.finish()
    (closeReason, errorLock.synchronized(errors.toSeq))
  }
}

object AsyncDataPipeline {

  /** Pipeline over in-memory `Seq` batches — the reference's exact
    * shape (`CollectFunc[T] = () => Seq[T]`). */
  def ofSeq[T](
      config: PipelineConfig,
      collect: () => Seq[T],
      process: Seq[T] => Unit): AsyncDataPipeline[Seq[T]] =
    new AsyncDataPipeline[Seq[T]](config, collect, process, b => b.length.toLong)

  /** Pipeline over distributed `Dataset` batches — the Spark-native
    * deployment: collect declares a lazy distributed batch, process
    * runs the action. `itemCount` defaults to 0 (counting would force
    * an extra job per batch); pass an estimator if item metrics matter.
    */
  def ofDataset[T](
      config: PipelineConfig,
      collect: () => org.apache.spark.sql.Dataset[T],
      process: org.apache.spark.sql.Dataset[T] => Unit,
      itemCount: org.apache.spark.sql.Dataset[T] => Long = (_: org.apache.spark.sql.Dataset[T]) => 0L)
      : AsyncDataPipeline[org.apache.spark.sql.Dataset[T]] =
    new AsyncDataPipeline(config, collect, process, itemCount)
}
