package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Secondary-sort / grouped-iteration parity.
  *
  * The reference implements secondary sort as: composite-key sort + partition
  * on the key prefix + a grouping comparator that makes the reducer see one
  * group per prefix while values stream in secondary order
  * (tez-tests/src/test/java/org/apache/tez/test/../examples/SecondarySort.java:60-229,
  * grouping semantics: tez-runtime-library/.../common/ValuesIterator.java:47-180).
  *
  * Spark-first form: `repartition(prefix) + sortWithinPartitions(prefix ++
  * secondary)` reproduces exactly the Tez physical layout (hash partition on
  * prefix, intra-partition total order), and a streaming group-boundary
  * iterator over `mapPartitions` is the ValuesIterator. At 100 TB this is a
  * single shuffle with no driver state and no per-group materialization —
  * groups stream through the iterator.
  */
object SecondarySort {

  /** Hash-partition by `partCols`, sort within partitions by
    * `partCols ++ sortCols`, exactly the reference's
    * FirstPartitioner + full-key sort (SecondarySort.java:136-148).
    */
  def sortedByGroup(df: DataFrame, partCols: Seq[String], sortCols: Seq[Column]): DataFrame =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions(partCols.map(col) ++ sortCols: _*)

  /** Stream group boundaries like ValuesIterator and keep the first row of
    * each group (the min row under the secondary order). Runs fully
    * distributed: one shuffle, O(1) state per partition.
    */
  def firstRowPerGroup(df: DataFrame, partCols: Seq[String], sortCols: Seq[Column]): DataFrame = {
    val sorted = sortedByGroup(df, partCols, sortCols)
    val keyIdx = partCols.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { rows: Iterator[Row] =>
      var lastKey: Seq[Any] = null
      rows.filter { r =>
        val k = keyIdx.map(r.get)
        if (lastKey != null && k == lastKey) false
        else { lastKey = k; true }
      }
    }(Encoders.row(sorted.schema))
  }

  /** Full grouped-iteration surface (KeyValuesReader parity): apply `f` to
    * each (group key, rows-in-secondary-order) without materializing the
    * group — `rows` is a lazy slice of the partition iterator.
    */
  def mapSortedGroups[T](
      df: DataFrame,
      partCols: Seq[String],
      sortCols: Seq[Column]
  )(f: (Seq[Any], Iterator[Row]) => Iterator[T])(implicit enc: org.apache.spark.sql.Encoder[T]) = {
    val sorted = sortedByGroup(df, partCols, sortCols)
    val keyIdx = partCols.map(sorted.schema.fieldIndex)
    sorted.mapPartitions { rows: Iterator[Row] =>
      new GroupedIterator(rows, r => keyIdx.map(r.get)).flatMap { case (k, group) => f(k, group) }
    }
  }

  /** Streams (key, group-iterator) pairs off a partition-sorted row iterator.
    * Mirrors ValuesIterator's moveToNext/hasMoreValues contract: the group
    * iterator is only valid until the next group is requested.
    */
  private[graft] final class GroupedIterator(rows: Iterator[Row], keyOf: Row => Seq[Any])
      extends Iterator[(Seq[Any], Iterator[Row])] {
    private val buf = rows.buffered
    private var current: Iterator[Row] = Iterator.empty
    // A group not fully consumed by the caller is drained before advancing,
    // so each outer next() always lands on a fresh group boundary.
    override def hasNext: Boolean = { while (current.hasNext) current.next(); buf.hasNext }
    override def next(): (Seq[Any], Iterator[Row]) = {
      while (current.hasNext) current.next()
      val key = keyOf(buf.head)
      current = new Iterator[Row] {
        override def hasNext: Boolean = buf.hasNext && keyOf(buf.head) == key
        override def next(): Row = buf.next()
      }
      (key, current)
    }
  }
}
