package graft.runtime

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Job-level metrics via SparkListener (SURVEY.md §1.4: the reference's
  * status/runtime outcome channel becomes listener metrics + status columns).
  * Registered per FeatureJob run; snapshot dumped next to the manifest.
  */
final class GraftMetricsListener extends SparkListener {
  val tasks = new LongAdder
  val failedTasks = new LongAdder
  val recordsRead = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val shuffleBytesRead = new LongAdder
  val spillBytes = new LongAdder
  val cpuTimeNs = new LongAdder
  val runTimeMs = new LongAdder
  val peakExecutionMemory = new AtomicLong(0L)
  val stagesCompleted = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    if (taskEnd.reason != org.apache.spark.Success) failedTasks.increment()
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleBytesRead.add(m.shuffleReadMetrics.totalBytesRead)
      spillBytes.add(m.diskBytesSpilled + m.memoryBytesSpilled)
      cpuTimeNs.add(m.executorCpuTime)
      runTimeMs.add(m.executorRunTime)
      peakExecutionMemory.accumulateAndGet(m.peakExecutionMemory, math.max)
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    stagesCompleted.increment()

  def toJson: String =
    s"""{"tasks":${tasks.sum},"failedTasks":${failedTasks.sum},""" +
      s""""recordsRead":${recordsRead.sum},"shuffleBytesWritten":${shuffleBytesWritten.sum},""" +
      s""""shuffleBytesRead":${shuffleBytesRead.sum},"spillBytes":${spillBytes.sum},""" +
      s""""cpuTimeNs":${cpuTimeNs.sum},"executorRunTimeMs":${runTimeMs.sum},""" +
      s""""peakExecutionMemory":${peakExecutionMemory.get},"stagesCompleted":${stagesCompleted.sum}}"""
}
