package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items summary: at most `k` (item, count) slots.
  *
  * Guarantees (the classic MG bounds, preserved under merge by the
  * mergeable-summaries construction — Agarwal et al., PODS'12):
  * for every item with true frequency f over n processed rows, the stored
  * count ĉ satisfies  f − n/(k+1) ≤ ĉ ≤ f,  and any item with
  * f > n/(k+1) is guaranteed present. Pinned by FreqAggSpec.
  *
  * Why it exists beside the exact q106 form: ONE pass, O(k) state per
  * group through partial AND final aggregation — the vocabulary of a
  * 100 TB corpus never materializes. The exact top-k needs the full
  * token→count aggregate first (fine, but its shuffle carries |vocab|
  * rows); the sketch ships k slots per mapper, full stop.
  */
final class MgSummary(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var processed = 0L

  def offer(item: String): Unit = {
    processed += 1L
    // getOrDefault, NOT get: j.u.HashMap.get returns null for an absent
    // key, and relying on Scala unboxing null to 0L is a refactor trap
    val cur = counts.getOrDefault(item, 0L)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else decrementAll(1L)
  }

  /** Subtract `by` from every slot, dropping non-positive slots. The
    * decrement-all step is O(k) but amortized O(1) per offer (every
    * decrement cancels a previous increment).
    */
  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  /** Mergeable-MG merge: add the other summary's counts slot-wise, then
    * if more than k slots survive, subtract the (k+1)-th largest count
    * from every slot and drop non-positives — back to ≤ k slots with the
    * combined-stream error bound.
    */
  def merge(other: MgSummary): Unit = {
    processed += other.processed
    other.counts.forEach { (item, c) =>
      counts.put(item, counts.getOrDefault(item, 0L) + c)
    }
    if (counts.size > k) {
      val all = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { all(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(all)
      val cut = all(all.length - k - 1) // (k+1)-th largest
      decrementAll(cut)
    }
  }

  /** Slots ordered (count desc, item asc) — deterministic output. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    counts.forEach { (item, c) => arr(i) = (item, c); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}

/** approx_top_items(item, k) → array<struct<item:string, est:long>>: the
  * Misra-Gries frequent-items summary of a string column, ordered
  * (est desc, item asc). Runs partial+final through ObjectHashAggregate
  * with O(k) state per group at every stage.
  */
case class ApproxTopItems(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  require(k > 0, "approx_top_items needs k > 0")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)

  override def update(b: MgSummary, row: InternalRow): MgSummary = {
    val v = item.eval(row)
    if (v != null) b.offer(v.toString)
    b
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary = { a.merge(b); a }

  override def eval(b: MgSummary): Any =
    new GenericArrayData(b.sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    })

  override def serialize(b: MgSummary): Array[Byte] = {
    val items = b.sorted
    var bytes = 8 + 4
    items.foreach { case (s, _) =>
      bytes += 4 + s.getBytes(StandardCharsets.UTF_8).length + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(b.processed)
    bb.putInt(items.length)
    items.foreach { case (s, c) =>
      val sb = s.getBytes(StandardCharsets.UTF_8)
      bb.putInt(sb.length); bb.put(sb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val m = new MgSummary(k)
    m.processed = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len); bb.get(sb)
      m.counts.put(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopItems =
    copy(item = newChildren(0))
}
