package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("semiJoin equals the plain left-semi join") {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.semiJoin(lineitem, "l_orderkey", dim, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    val plain = lineitem
      .join(dim, lineitem("l_orderkey") === dim("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("probe is a codegen'd might_contain against a subquery sketch") {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = BloomPrune.prune(lineitem, "l_orderkey", dim, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom sketch not delivered via subquery:\n$plan")
  }

  test("antiJoin equals the plain left-anti join, including NULL big keys") {
    import spark.implicits._
    val big = (Seq.tabulate(500)(i => Option(i.toLong)) ++ Seq(None, None))
      .toDF("k")
    val dim = spark.range(0, 100).select(($"id" * 3).as("j")) // 0,3,...,297
    val pruned = BloomPrune.antiJoin(big, "k", dim, "j")
      .as[Option[Long]].collect().toSeq.sorted
    val plain = big.join(dim, $"k" === $"j", "left_anti")
      .as[Option[Long]].collect().toSeq.sorted
    assert(pruned == plain && pruned.nonEmpty)
    assert(pruned.count(_.isEmpty) == 2) // NULL keys kept, like plain anti
  }

  test("antiJoin(persistBig) runs a non-scan upstream once: both branches read the cache") {
    // over an expensive upstream pipeline the two-branch shape would
    // evaluate it twice; persistBig caches it so each branch is an
    // InMemoryTableScan — the upstream computes once
    import spark.implicits._
    val upstream = spark.range(0, 500).toDF("k")
      .withColumn("payload", concat(lit("p"), col("k"))) // stand-in pipeline
    val dim = spark.range(0, 100).select(($"id" * 3).as("j"))
    try {
      val out = BloomPrune.antiJoin(upstream, "k", dim, "j", persistBig = true)
      val p = out.queryExecution.executedPlan.toString
      assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
      // and the result still equals the plain anti-join
      val got = out.select($"k").as[Long].collect().toSet
      val plain = upstream.join(dim, $"k" === $"j", "left_anti")
        .select($"k").as[Long].collect().toSet
      assert(got == plain && got.nonEmpty)
    } finally spark.catalog.clearCache()
  }

  test("prune admits a superset of true matches and drops most non-matches") {
    // keys 0..999 on the big side, dim covers 0..49: the bloom must keep
    // all 50 true keys and, at the default FPP, prune the vast majority
    // of the other 950
    import spark.implicits._
    val big = spark.range(0, 1000).toDF("k")
    val dim = spark.range(0, 50).toDF("j")
    val kept = BloomPrune.prune(big, "k", dim, "j").as[Long].collect().toSet
    assert((0L until 50L).forall(kept.contains))
    assert(kept.size < 200, s"bloom pruned almost nothing: ${kept.size} kept")
  }
}
