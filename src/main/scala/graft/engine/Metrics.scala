package graft.engine

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/**
 * Per-partition throughput metrics (the north rule's "per-partition
 * lineage + metrics"): a SparkListener accumulating, per task (= per
 * partition attempt), records and runtime, so the benchmark can report
 * distribution-level evidence that work actually spread across
 * partitions rather than serializing on a hot key.
 */
final class TaskThroughputListener extends SparkListener {
  val tasks = new LongAdder
  val recordsRead = new LongAdder
  val shuffleRecordsRead = new LongAdder
  val runTimeMs = new LongAdder
  val cpuTimeMs = new LongAdder
  val gcTimeMs = new LongAdder
  val maxTaskMs = new AtomicLong(0L)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      tasks.increment()
      recordsRead.add(m.inputMetrics.recordsRead)
      shuffleRecordsRead.add(m.shuffleReadMetrics.recordsRead)
      val ms = m.executorRunTime
      runTimeMs.add(ms)
      cpuTimeMs.add(m.executorCpuTime / 1000000L)
      gcTimeMs.add(m.jvmGCTime)
      maxTaskMs.accumulateAndGet(ms, math.max(_, _))
    }
  }

  /** Straggler ratio: max task time / mean task time — ~1 means even
    * partitions, >>1 means skew (salting/AQE not doing its job). */
  def stragglerRatio: Double = {
    val n = tasks.sum()
    if (n == 0) 0.0 else maxTaskMs.get().toDouble / (runTimeMs.sum().toDouble / n)
  }

  def json: String =
    s"""{"tasks":${tasks.sum()},"records_read":${recordsRead.sum()},""" +
      s""""shuffle_records_read":${shuffleRecordsRead.sum()},""" +
      s""""task_runtime_ms":${runTimeMs.sum()},"cpu_time_ms":${cpuTimeMs.sum()},""" +
      s""""gc_time_ms":${gcTimeMs.sum()},"max_task_ms":${maxTaskMs.get()},""" +
      s""""straggler_ratio":${f"$stragglerRatio%.3f"}}"""
}
