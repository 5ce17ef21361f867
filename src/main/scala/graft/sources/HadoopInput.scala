package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputFormat => NewInputFormat}
import org.apache.hadoop.mapreduce.lib.input.{TextInputFormat => NewTextInputFormat}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bring-your-own-InputFormat adapter — the Spark face of the reference's
  * MRInput, which adapts arbitrary mapred/mapreduce InputFormats as DAG
  * roots (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/input/
  * MRInput.java:84; both API generations are supported there via
  * MRInputLegacy/MRInput). Spark ships the same adapters as
  * `SparkContext.newAPIHadoopFile` / `hadoopFile`; these wrappers are the
  * engine's documented entry points plus the Text→DataFrame bridge the
  * WordCount-shaped examples need (tez-examples/.../WordCount.java:140-195
  * reads TextInputFormat).
  *
  * Split planning stays with the InputFormat itself (getSplits → one Spark
  * partition per split), so a custom format's locality/grouping behavior is
  * preserved — the same contract MRInput gives it.
  */
object HadoopInput {

  /** mapreduce-API (new) InputFormat → pair RDD. */
  def newApi[K, V, F <: NewInputFormat[K, V]](
      spark: SparkSession, path: String,
      fmt: Class[F], kClass: Class[K], vClass: Class[V]): RDD[(K, V)] =
    spark.sparkContext.newAPIHadoopFile(path, fmt, kClass, vClass)

  /** mapred-API (old) InputFormat → pair RDD (MRInputLegacy parity). */
  def oldApi[K, V](
      spark: SparkSession, path: String,
      fmt: Class[_ <: org.apache.hadoop.mapred.InputFormat[K, V]],
      kClass: Class[K], vClass: Class[V], minPartitions: Int = 2): RDD[(K, V)] =
    spark.sparkContext.hadoopFile(path, fmt, kClass, vClass, minPartitions)

  /** TextInputFormat lines as a one-column DataFrame. Hadoop record readers
    * REUSE the Writable instances, so the value must be copied (toString)
    * before rows escape the iterator.
    */
  def textLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    newApi(spark, path, classOf[NewTextInputFormat], classOf[LongWritable], classOf[Text])
      .map(_._2.toString)
      .toDF("value")
  }
}
