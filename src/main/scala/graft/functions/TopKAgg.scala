package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k binary heap keeping the k best
  * (score desc, id asc) pairs, with the WORST kept element at the root so
  * a new candidate evicts in O(log k). State is O(k) per group through
  * both partial and final aggregation — the scalable replacement for
  * `row_number().over(partitionBy(q))` top-k, which must shuffle and sort
  * the whole group (|group| rows) before discarding all but k.
  */
final class TopKHeap(val k: Int) {
  var size = 0
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))

  /** (s1,i1) ranks strictly below (s2,i2) in the final order. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  /** Kept pairs ordered best-first — identical to the rows a rank window
    * over (score desc, id asc) would keep with rnk ≤ k.
    */
  def sortedBestFirst: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(arr,
      (a: (Double, Long), b: (Double, Long)) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    arr
  }
}

/** topk_by_score(score, id, k) → array<struct<id:long, score:double>> of the
  * k best (score desc, id asc) pairs per group. Runs partial+final through
  * ObjectHashAggregate: shuffle volume is |groups|·k structs instead of the
  * rank-window's whole-group row shuffle, and no single task ever holds more
  * than O(k) state per group — a pathological hot query/key cannot blow an
  * executor the way a window sort over that key's full partition can.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, row: InternalRow): TopKHeap = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(b: TopKHeap): Any =
    new GenericArrayData(b.sortedBestFirst.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; h.insert(s, id); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
