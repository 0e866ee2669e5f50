package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.AtomicLong

/** Job-counters surface (reference `core:mapreduce/TaskCounter.java:
  * 28-47`): the MR built-ins map onto Spark task metrics, collected by a
  * SparkListener for the duration of a job and reported as a tiny frame.
  * User-defined counters are plain `LongAccumulator`s (see
  * `Pipe.safeMapCounted`).
  *
  * | MR counter               | Spark task metric                     |
  * |--------------------------|---------------------------------------|
  * | MAP_INPUT_RECORDS        | inputMetrics.recordsRead              |
  * | MAP_OUTPUT_RECORDS       | shuffleWriteMetrics.recordsWritten    |
  * | REDUCE_SHUFFLE_BYTES     | shuffleReadMetrics.totalBytesRead     |
  * | REDUCE_INPUT_RECORDS     | shuffleReadMetrics.recordsRead        |
  * | SPILLED_RECORDS          | memory+disk spill bytes (bytes, not   |
  * |                          | records, in Spark's model)            |
  * | CPU_MILLISECONDS         | executorCpuTime (ns → ms)             |
  * | GC_TIME_MILLIS           | jvmGCTime                             |
  */
object Counters {

  final class Recorder private[Counters] (spark: SparkSession) {
    private[Counters] val inputRecords = new AtomicLong
    private[Counters] val inputBytes = new AtomicLong
    private[Counters] val shuffleWriteRecords = new AtomicLong
    private[Counters] val shuffleReadBytes = new AtomicLong
    private[Counters] val shuffleReadRecords = new AtomicLong
    private[Counters] val outputRecords = new AtomicLong
    private[Counters] val spillBytes = new AtomicLong
    private[Counters] val cpuMillis = new AtomicLong
    private[Counters] val gcMillis = new AtomicLong
    private[Counters] val tasks = new AtomicLong

    private[Counters] val listener: SparkListener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          inputRecords.addAndGet(m.inputMetrics.recordsRead)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
          shuffleWriteRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleReadRecords.addAndGet(m.shuffleReadMetrics.recordsRead)
          outputRecords.addAndGet(m.outputMetrics.recordsWritten)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          cpuMillis.addAndGet(m.executorCpuTime / 1000000L)
          gcMillis.addAndGet(m.jvmGCTime)
        }
      }
    }

    def report(spark: SparkSession): DataFrame = {
      import spark.implicits._
      Seq(
        ("TASKS", tasks.get),
        ("MAP_INPUT_RECORDS", inputRecords.get),
        ("MAP_INPUT_BYTES", inputBytes.get),
        ("MAP_OUTPUT_RECORDS", shuffleWriteRecords.get),
        ("REDUCE_SHUFFLE_BYTES", shuffleReadBytes.get),
        ("REDUCE_INPUT_RECORDS", shuffleReadRecords.get),
        ("OUTPUT_RECORDS", outputRecords.get),
        ("SPILLED_BYTES", spillBytes.get),
        ("CPU_MILLISECONDS", cpuMillis.get),
        ("GC_TIME_MILLIS", gcMillis.get)
      ).toDF("counter", "value")
    }
  }

  /** Run `body` with task-metric collection; returns (result, report).
    * The listener bus is asynchronous (and its drain method is
    * private[spark]), so the report waits for the counters to go
    * quiescent: unchanged task count across consecutive polls.
    */
  def withReport[T](spark: SparkSession)(body: => T): (T, DataFrame) = {
    val rec = new Recorder(spark)
    spark.sparkContext.addSparkListener(rec.listener)
    try {
      val r = body
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1L
      var stable = 0
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val now = rec.tasks.get
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (r, rec.report(spark))
    } finally spark.sparkContext.removeSparkListener(rec.listener)
  }
}
