package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FreqAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val tokens = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(split(lower(col("text")), "\\s+")).as("token"))
    .filter(length(col("token")) > 0)

  test("approx_top_items honors the Misra-Gries bounds against exact counts") {
    val k = 10
    // many partitions → the partial+final merge path is exercised for real
    val summary = tokens.repartition(16)
      .agg(graft.functions.approx_top_items(col("token"), k).as("top"))
      .head().getSeq[Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.size <= k)
    val exact = tokens.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = n / (k + 1)
    // guarantee 1: every item with true frequency > n/(k+1) is present
    val must = exact.filter(_._2 > bound).keySet
    assert(must.subsetOf(summary.keySet),
      s"missing guaranteed-frequent items: ${(must -- summary.keySet).take(5)}")
    // guarantee 2: estimates never overcount and undercount by ≤ n/(k+1)
    summary.foreach { case (item, est) =>
      val f = exact.getOrElse(item, 0L)
      assert(est <= f, s"$item overcounted: $est > $f")
      assert(est >= f - bound, s"$item undercounted beyond the bound: $est < $f - $bound")
    }
  }

  test("approx_top_items output is deterministically ordered (est desc, item asc)") {
    val rows = tokens.agg(graft.functions.approx_top_items(col("token"), 8).as("top"))
      .head().getSeq[Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    assert(rows == expected)
  }

  test("MgSummary merge matches a single-stream summary's guarantees") {
    // split one stream across 4 summaries, merge pairwise in arbitrary
    // order — the merged summary must still satisfy the MG bounds for the
    // combined stream (the mergeable-summaries property)
    val items = (1 to 3000).map { i =>
      if (i % 3 == 0) "hot" else if (i % 7 == 0) "warm" else s"cold_$i"
    }
    val parts = items.grouped(750).toSeq
    val sums = parts.map { p => val m = new MgSummary(6); p.foreach(m.offer); m }
    val merged = new MgSummary(6)
    Seq(2, 0, 3, 1).foreach(i => merged.merge(sums(i)))
    val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val bound = items.size / 7 // n/(k+1)
    exact.filter(_._2 > bound).keys.foreach { hotItem =>
      assert(merged.counts.containsKey(hotItem), s"$hotItem missing after merge")
    }
    merged.sorted.foreach { case (item, est) =>
      val f = exact.getOrElse(item, 0L)
      assert(est <= f && est >= f - bound, s"$item: est $est vs true $f (bound $bound)")
    }
  }
}
