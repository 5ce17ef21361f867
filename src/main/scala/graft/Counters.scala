package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Counter surface ≅ the reference's TaskCounter service
  * (tez-api/src/main/java/org/apache/tez/common/counters/TaskCounter.java:25
  * — REDUCE_INPUT_GROUPS:34, SPILLED_RECORDS:57, SHUFFLE_BYTES:154):
  * aggregated task metrics from a SparkListener over a bracketed scope.
  */
object Counters {

  final case class Snapshot(
      tasks: Long,
      inputRecords: Long,
      inputBytes: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spilledBytes: Long,
      outputRecords: Long)

  /** Run `body` and return (result, aggregated task counters observed
    * during it). Listener-based — zero cost on the data path, works for
    * any query shape, exactly how the reference surfaces counters to
    * DAGClient.
    */
  def track[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val acc = new TaskAccumulator
    spark.sparkContext.addSparkListener(acc)
    try {
      val r = body
      // listener bus is async; drain before reading
      org.apache.spark.graftaccess.ListenerBusAccess.drain(spark.sparkContext)
      (r, acc.snapshot)
    } finally spark.sparkContext.removeSparkListener(acc)
  }

  private final class TaskAccumulator extends SparkListener {
    private val m = mutable.Map.empty[String, Long].withDefaultValue(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val tm = e.taskMetrics
      if (tm != null) {
        m("tasks") += 1
        m("inputRecords") += tm.inputMetrics.recordsRead
        m("inputBytes") += tm.inputMetrics.bytesRead
        m("shuffleReadBytes") += tm.shuffleReadMetrics.totalBytesRead
        m("shuffleWriteBytes") += tm.shuffleWriteMetrics.bytesWritten
        m("spilledBytes") += tm.diskBytesSpilled
        m("outputRecords") += tm.outputMetrics.recordsWritten
      }
    }
    def snapshot: Snapshot = synchronized {
      Snapshot(m("tasks"), m("inputRecords"), m("inputBytes"),
        m("shuffleReadBytes"), m("shuffleWriteBytes"), m("spilledBytes"),
        m("outputRecords"))
    }
  }
}
