package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stream = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
    Seq.fill(5)("c") ++ Seq("d")).toDF("k")

  test("countMin: one-sided guarantee holds; wide sketch is exact; absent key estimates 0") {
    try {
      val exact = Map("a" -> 50L, "b" -> 20L, "c" -> 5L, "d" -> 1L)
      // narrow sketch (collisions likely): est >= exact for every key
      val narrow = Sketches.countMin(stream, $"k", depth = 3, width = 2)
      val estN = Sketches.countMinEstimate(narrow,
          Seq("a", "b", "c", "d").toDF("k"), $"k", 3, 2)
        .as[(String, Long)].collect().toMap
      assert(exact.forall { case (k, c) => estN(k) >= c },
        s"one-sided bound violated: $estN vs $exact")
      // total mass bound: no estimate exceeds the stream length
      assert(estN.values.forall(_ <= 76L))
      // wide sketch: 4 distinct keys into 4x256 cells -> no collisions,
      // estimates are EXACT
      val wide = Sketches.countMin(stream, $"k", depth = 4, width = 256)
      val estW = Sketches.countMinEstimate(wide,
          Seq("a", "b", "c", "d", "zzz").toDF("k"), $"k", 4, 256)
        .as[(String, Long)].collect().toMap
      assert(exact.forall { case (k, c) => estW(k) == c }, estW.toString)
      // a key never inserted estimates 0 (its cells may collide, but at
      // this width they don't)
      assert(estW("zzz") == 0L)
    } finally graft.CacheScope.drain()
  }

  test("countMin is partition-count independent (order-free integer sums)") {
    try {
      val a = Sketches.countMin(stream.repartition(1), $"k", 3, 8)
        .as[(Long, Long, Long)].collect().toSet
      val b = Sketches.countMin(stream.repartition(13), $"k", 3, 8)
        .as[(Long, Long, Long)].collect().toSet
      assert(a == b && a.nonEmpty)
      // sketch mass per row equals the stream length exactly
      val mass = Sketches.countMin(stream, $"k", 3, 8)
        .groupBy($"row").agg(sum($"c")).as[(Long, Long)].collect().toMap
      assert(mass == Map(0L -> 76L, 1L -> 76L, 2L -> 76L))
    } finally graft.CacheScope.drain()
  }
}
