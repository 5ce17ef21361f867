package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-sink vertex parity: the reference lets one vertex write several
  * sinks in a single pass (JoinDataGen writes stream + hash + expected
  * outputs at once, tez-examples/.../JoinDataGen.java:141-155). Spark has no
  * first-class multi-sink write (SURVEY §7.4), so the idiom is: materialize
  * once, write N times — the persist guarantees all sinks observe the same
  * snapshot even when the plan is nondeterministic upstream.
  */
object MultiSink {

  /** Write `df` to every sink exactly once from one materialization.
    * `sinks` maps sink name → writer action. Returns per-sink row count.
    */
  def writeAll(df: DataFrame, sinks: Seq[(String, DataFrame => Unit)],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Map[String, Long] = {
    val pinned = df.persist(level)
    try {
      val n = pinned.count() // materialize once before any sink reads
      sinks.map { case (name, write) => write(pinned); name -> n }.toMap
    } finally {
      pinned.unpersist(blocking = false)
      ()
    }
  }
}
