package graft.pipeline

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

import scala.concurrent.duration._

/** Immutable metrics snapshot (reference:
  * /root/reference/async_data_pipeline_metrics.go `PipelineMetrics`).
  */
final case class PipelineMetrics(
    totalDuration: FiniteDuration,
    processingDuration: FiniteDuration,
    idleDuration: FiniteDuration,
    batchCount: Long,
    itemCount: Long) {

  /** Fraction of wall-clock spent idle (reference: `GetIdleRatio`). */
  def idleRatio: Double =
    if (totalDuration <= Duration.Zero) 0.0
    else idleDuration.toNanos.toDouble / totalDuration.toNanos.toDouble
}

object PipelineMetrics {
  val zero: PipelineMetrics =
    PipelineMetrics(Duration.Zero, Duration.Zero, Duration.Zero, 0L, 0L)
}

/** Mutable, thread-safe metrics accumulator backing a running pipeline. */
private[pipeline] final class MetricsState {
  private var startNanos = 0L
  private var lastDataNanos = 0L
  private var totalNanos = 0L
  private var processingNanos = 0L
  private var idleNanos = 0L
  private var batches = 0L
  private var items = 0L
  private var running = false

  def start(): Unit = synchronized {
    startNanos = System.nanoTime()
    lastDataNanos = startNanos
    totalNanos = 0L; processingNanos = 0L; idleNanos = 0L
    batches = 0L; items = 0L
    running = true
  }

  def recordBatch(n: Long): Unit = synchronized {
    batches += 1
    items += n
  }

  /** Batch delivered to the processor: time since the previous delivery
    * counts as idle (reference: async_data_pipeline.go:305-310). */
  def recordArrival(): Unit = synchronized {
    val now = System.nanoTime()
    idleNanos += now - lastDataNanos
    lastDataNanos = now
  }

  def recordProcessing(nanos: Long): Unit = synchronized {
    processingNanos += nanos
  }

  def finish(): Unit = synchronized {
    totalNanos = System.nanoTime() - startNanos
    running = false
  }

  def snapshot: PipelineMetrics = synchronized {
    val total = if (running) System.nanoTime() - startNanos else totalNanos
    PipelineMetrics(total.nanos, processingNanos.nanos, idleNanos.nanos, batches, items)
  }
}

/** A live polled metrics subscription; `stop()` (or the pipeline's
  * `unsubscribeMetrics`) cancels it (reference:
  * async_data_pipeline_metrics.go `MetricsSubscription`).
  */
final class MetricsSubscription private (task: ScheduledFuture[_]) {
  def stop(): Unit = task.cancel(false)
  def isActive: Boolean = !task.isCancelled && !task.isDone
}

object MetricsSubscription {
  private lazy val scheduler = {
    val s = Executors.newScheduledThreadPool(1, r => {
      val t = new Thread(r, "graft-metrics-subscription")
      t.setDaemon(true)
      t
    })
    s
  }

  private[pipeline] def start(
      interval: FiniteDuration, tick: () => Unit): MetricsSubscription = {
    val fut = scheduler.scheduleAtFixedRate(
      () => tick(), interval.toMillis, interval.toMillis, TimeUnit.MILLISECONDS)
    new MetricsSubscription(fut)
  }
}
