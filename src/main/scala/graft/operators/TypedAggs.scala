package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators — the Spark form of the reference's Combiner extension
  * point (tez-runtime-library/.../common/combine/Combiner.java:39: user code
  * run over map output before the shuffle). An `Aggregator[IN, BUF, OUT]`
  * registered via `functions.udaf` gets partial (map-side) and final (reduce
  * -side) evaluation automatically — the combine happens without the user
  * managing sorted runs.
  */
object TypedAggs {

  /** Per-group top-k of (score, tag) pairs with a bounded buffer — the
    * typed-Aggregator face of the same idea as
    * [[graft.functions.TopKByScore]] (which is the recommended path for
    * numeric-id top-k on DataFrames): state is O(k) per group through both
    * partial and final phases, so one pathological group cannot blow a
    * task (a rank window must sort the whole group first). Per-row cost is
    * an O(k) worst-scan + insert, not a full buffer re-sort.
    */
  final class TopK(k: Int) extends Aggregator[(Double, String), List[(Double, String)], String] {
    // best = higher score, tie lower tag; worst is the reverse
    private def worseThan(a: (Double, String), b: (Double, String)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    override def zero: List[(Double, String)] = Nil
    override def reduce(b: List[(Double, String)], in: (Double, String)): List[(Double, String)] =
      if (b.lengthCompare(k) < 0) in :: b
      else {
        val worst = b.reduceLeft((x, y) => if (worseThan(x, y)) x else y)
        if (worseThan(in, worst)) b else in :: b.diff(List(worst))
      }
    override def merge(a: List[(Double, String)], b: List[(Double, String)]): List[(Double, String)] =
      b.foldLeft(a)(reduce)
    /** Tags of the top-k rows, best first, comma-joined. */
    override def finish(r: List[(Double, String)]): String =
      r.sortBy { case (s, t) => (-s, t) }.map(_._2).mkString(",")
    override def bufferEncoder: Encoder[List[(Double, String)]] =
      Encoders.kryo[List[(Double, String)]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Word-count combiner as a typed Aggregator (SumProcessor + Combiner
    * parity, tez-examples/.../WordCount.java:113-138): trivially a sum, but
    * expressed through the same extension surface the reference offers.
    */
  val sumCombiner: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, in: Long): Long = b + in
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
