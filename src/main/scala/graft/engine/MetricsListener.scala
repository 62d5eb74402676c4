package graft.engine

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-level totals for one engine run — the Spark-metrics half of the
  * reference's observability (its Micrometer counters,
  * `service/SourceSystemDataCheckerService.java:41-66`, count
  * new/changed/unchanged per batch; a distributed engine additionally needs
  * the COST of the batch, which only task metrics can give). */
final case class RunMetrics(
    tasks: Long,
    recordsRead: Long,
    bytesRead: Long,
    shuffleReadBytes: Long,
    shuffleWriteBytes: Long,
    executorRunTimeMs: Long,
    spilledBytes: Long)

/** SparkListener accumulating task metrics while attached. Thread-safe
  * (listener bus delivery + LongAdder); attach/detach via [[MetricsListener
  * .capture]] so a run's totals are isolated from concurrent jobs only to
  * the extent Spark scopes them — for per-run isolation the engine attaches
  * around its own appends (CheckpointedRunner). */
final class MetricsListener extends SparkListener {
  private val tasks = new LongAdder
  private val recordsRead = new LongAdder
  private val bytesRead = new LongAdder
  private val sRead = new LongAdder
  private val sWrite = new LongAdder
  private val runTime = new LongAdder
  private val spill = new LongAdder

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    val m = t.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      sRead.add(m.shuffleReadMetrics.totalBytesRead)
      sWrite.add(m.shuffleWriteMetrics.bytesWritten)
      runTime.add(m.executorRunTime)
      spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  def snapshot: RunMetrics = RunMetrics(
    tasks.sum(), recordsRead.sum(), bytesRead.sum(),
    sRead.sum(), sWrite.sum(), runTime.sum(), spill.sum())
}

object MetricsListener {
  /** Run `body` with a fresh listener attached; returns (result, totals).
    * The listener bus is drained before the snapshot so late task-end
    * events are counted. */
  def capture[T](spark: SparkSession)(body: => T): (T, RunMetrics) = {
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      org.apache.spark.graft.ListenerBusFlush.flush(spark.sparkContext)
      (r, l.snapshot)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
