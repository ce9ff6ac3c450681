package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-core semantics, mirroring the reference's own test file
  * (/root/reference/async_data_pipeline_test.go): normal flow, collect
  * error, process error, cancel sentinel, invalid config, metrics,
  * subscription, export.
  */
class AsyncDataPipelineSpec extends AnyFunSuite {

  private case class TestData(id: Int, value: String)

  private def config = PipelineConfig(
    maxWorkers = 4, idleTime = 300.millis, collectTimeout = 2.seconds)

  test("normal flow: one batch processed, then idle timeout") {
    val expected = Seq(TestData(1, "test"))
    val calls = new AtomicInteger(0)
    @volatile var processed: Seq[TestData] = Nil
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () =>
        if (calls.getAndIncrement() == 0) expected
        else { Thread.sleep(1000); Seq.empty },
      process = data => if (data.nonEmpty) processed = data)

    val (reason, errors) = p.perform()
    assert(errors.isEmpty || errors.forall(!_.isInstanceOf[ProcessError[_]]))
    assert(reason == CloseReason.IdleTimeout)
    assert(processed == expected)
  }

  test("collect error is wrapped as CollectError and accumulated") {
    val boom = new RuntimeException("collect boom")
    val p = AsyncDataPipeline.ofSeq[TestData](
      config, collect = () => throw boom, process = _ => ())
    val (_, errors) = p.perform()
    assert(errors.nonEmpty)
    val ce = errors.head
    assert(ce.isInstanceOf[CollectError])
    assert(ce.getCause eq boom)
  }

  test("process error is wrapped as ProcessError carrying the batch") {
    val boom = new RuntimeException("process boom")
    val batch = Seq(TestData(1, "x"))
    val p = AsyncDataPipeline.ofSeq[TestData](
      config, collect = () => batch, process = _ => throw boom)
    val (_, errors) = p.perform()
    assert(errors.nonEmpty)
    errors.collectFirst { case pe: ProcessError[_] => pe } match {
      case Some(pe) =>
        assert(pe.getCause eq boom)
        assert(pe.data == batch)
      case None => fail(s"expected a ProcessError, got $errors")
    }
  }

  test("NeedCancel from collect → CloseReason.CollectCancel") {
    val p = AsyncDataPipeline.ofSeq[TestData](
      config, collect = () => throw NeedCancel, process = _ => ())
    val (reason, _) = p.perform()
    assert(reason == CloseReason.CollectCancel)
  }

  test("NeedCancel from process → CloseReason.ProcessCancel") {
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () => Seq(TestData(1, "x")),
      process = _ => throw NeedCancel)
    val (reason, _) = p.perform()
    assert(reason == CloseReason.ProcessCancel)
  }

  test("maxWorkers <= 0 rejected") {
    assertThrows[InvalidMaxWorkersException] {
      AsyncDataPipeline.ofSeq[TestData](
        PipelineConfig(maxWorkers = -1), () => Seq.empty, _ => ())
    }
  }

  test("maxWorkers above cpu*4 rejected") {
    val tooMany = Runtime.getRuntime.availableProcessors() * 4 + 1
    assertThrows[InvalidMaxWorkersException] {
      AsyncDataPipeline.ofSeq[TestData](
        PipelineConfig(maxWorkers = tooMany), () => Seq.empty, _ => ())
    }
  }

  test("basic metrics: batch/item counts and durations") {
    val calls = new AtomicInteger(0)
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () =>
        if (calls.getAndIncrement() == 0) Seq(TestData(1, "test"))
        else { Thread.sleep(1000); Seq.empty },
      process = _ => Thread.sleep(100))
    p.perform()
    val m = p.getCurrentMetrics
    assert(m.batchCount >= 1)
    assert(m.itemCount >= 1)
    assert(m.processingDuration >= 100.millis)
    assert(m.totalDuration >= m.processingDuration)
  }

  test("idle ratio strictly between 0 and 1 after an idle tail") {
    val calls = new AtomicInteger(0)
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () =>
        if (calls.getAndIncrement() == 0) Seq(TestData(1, "test"))
        else { Thread.sleep(1000); Seq.empty },
      process = _ => ())
    p.perform()
    val ratio = p.getCurrentMetrics.idleRatio
    assert(ratio > 0.0 && ratio < 1.0, s"idle ratio $ratio out of range")
  }

  test("high load: 5 batches x 10 items all counted") {
    val batches = new AtomicInteger(0)
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () => {
        val b = batches.getAndIncrement()
        if (b < 5) (0 until 10).map(i => TestData(i, s"value_$i"))
        else { Thread.sleep(1000); Seq.empty }
      },
      process = _ => Thread.sleep(10))
    p.perform()
    val m = p.getCurrentMetrics
    assert(m.batchCount >= 5)
    assert(m.itemCount == 50)
    assert(m.processingDuration > Duration.Zero)
  }

  test("metrics subscription fires and can be unsubscribed") {
    val calls = new AtomicInteger(0)
    val ticks = new AtomicInteger(0)
    val p = AsyncDataPipeline.ofSeq[TestData](
      PipelineConfig(4, idleTime = 600.millis, collectTimeout = 2.seconds),
      collect = () =>
        if (calls.getAndIncrement() == 0) Seq(TestData(1, "test"))
        else { Thread.sleep(1000); Seq.empty },
      process = _ => Thread.sleep(100))
    val sub = p.subscribeMetrics(_ => ticks.incrementAndGet(), 100.millis)
    p.perform()
    p.unsubscribeMetrics(sub)
    assert(ticks.get() > 0, "metrics callback was not called")
    assert(!sub.isActive)
    val settled = ticks.get()
    Thread.sleep(300)
    assert(ticks.get() == settled, "callback fired after unsubscribe")
  }

  test("export metrics map shape") {
    val calls = new AtomicInteger(0)
    val p = AsyncDataPipeline.ofSeq[TestData](
      config,
      collect = () =>
        if (calls.getAndIncrement() == 0) Seq(TestData(1, "test"))
        else { Thread.sleep(1000); Seq.empty },
      process = _ => ())
    p.perform()
    val m = p.exportMetrics
    assert(m("batch_count").asInstanceOf[Long] >= 1L)
    assert(m("item_count").asInstanceOf[Long] >= 1L)
    val ratio = m("idle_ratio").asInstanceOf[Double]
    assert(ratio >= 0.0 && ratio <= 1.0)
    assert(m.keySet == Set("total_duration", "processing_duration",
      "idle_duration", "batch_count", "item_count", "idle_ratio"))
  }

  test("collect timeout when the processor can't keep up") {
    // batch1 is being processed (1s), batch2 fills the 1-slot queue,
    // batch3's enqueue times out after 200ms → CollectError; the
    // processor then drains and hits the idle timeout.
    val p = AsyncDataPipeline.ofSeq[TestData](
      PipelineConfig(maxWorkers = 1, idleTime = 500.millis, collectTimeout = 200.millis),
      collect = () => Seq(TestData(1, "x")),
      process = _ => Thread.sleep(1000))
    val (_, errors) = p.perform()
    val timeouts = errors.collect {
      case ce: CollectError if ce.getMessage.contains("collect timeout") => ce
    }
    assert(timeouts.nonEmpty, s"expected a collect-timeout error, got $errors")
  }
}
