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

  test("compactCountMin: probe-identical fold (linearity), epoch swap, one consolidated batch; IfNeeded thresholds on batch count") {
    val dir = java.nio.file.Files.createTempDirectory("cm-compact").toString
    try {
      def probe() = Sketches.countMinEstimateAgainstStore(dir,
          Seq("a", "b", "c", "d", "zzz").toDF("k"), $"k")
        .as[(String, Long)].collect().toMap
      Sketches.writeCountMin(Seq.fill(30)("a").toDF("k"), $"k", 4, 256, dir)
      Sketches.ingestIntoCountMin(
        (Seq.fill(20)("a") ++ Seq.fill(20)("b")).toDF("k"), $"k", dir, 1L)
      Sketches.ingestIntoCountMin(
        (Seq.fill(5)("c") ++ Seq("d")).toDF("k"), $"k", dir, 2L)
      val before = probe()
      assert(before == Map("a" -> 50L, "b" -> 20L, "c" -> 5L,
        "d" -> 1L, "zzz" -> 0L))
      // under threshold: no-op
      assert(Sketches.compactCountMinIfNeeded(spark, dir, maxBatches = 5)
        .isEmpty)
      assert(Compaction.batchCount(spark, dir, "cells") == 3)
      // over threshold: compacts to ONE batch in the next epoch,
      // probe-identical (cell sums are associative integer sums)
      assert(Sketches.compactCountMinIfNeeded(spark, dir, maxBatches = 2)
        .contains(1))
      assert(Compaction.currentEpoch(spark, dir) == 1)
      assert(Compaction.batchCount(spark, dir, "cells") == 1)
      assert(probe() == before)
      // the old epoch's cells are physically gone
      assert(!new java.io.File(s"$dir/cells").exists())
      // post-compaction ingest lands in the NEW epoch and keeps summing
      Sketches.ingestIntoCountMin(Seq.fill(7)("b").toDF("k"), $"k", dir, 3L)
      assert(probe() == (before + ("b" -> 27L)))
      // second compaction folds again, still probe-identical
      Sketches.compactCountMin(spark, dir)
      assert(Compaction.currentEpoch(spark, dir) == 2)
      assert(probe() == (before + ("b" -> 27L)))
    } finally graft.CacheScope.drain()
  }

  test("compactCountMin cells are bit-identical to a one-shot sketch of the union") {
    val dir = java.nio.file.Files.createTempDirectory("cm-bits").toString
    try {
      Sketches.writeCountMin(Seq.fill(9)("x").toDF("k"), $"k", 3, 8, dir)
      Sketches.ingestIntoCountMin(
        (Seq.fill(4)("y") ++ Seq.fill(2)("x")).toDF("k"), $"k", dir, 1L)
      Sketches.compactCountMin(spark, dir)
      val folded = spark.read
        .parquet(s"${Compaction.epochPath(dir, "cells", 1)}/batch=0")
        .as[(Long, Long, Long)].collect().toSet
      val oneShot = Sketches.countMin(
          (Seq.fill(9)("x") ++ Seq.fill(4)("y") ++ Seq.fill(2)("x")).toDF("k"),
          $"k", 3, 8)
        .as[(Long, Long, Long)].collect().toSet
      assert(folded == oneShot && folded.nonEmpty)
    } finally graft.CacheScope.drain()
  }
}
