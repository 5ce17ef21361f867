package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSplit: deterministic, repartition-stable, ~weighted") {
    val df = spark.range(10000).toDF("id")
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sampling.hashSplit(df, col("id"), w)
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(df.repartition(17), col("id"), w)
      .as[(Long, String)].collect().toMap
    assert(a == b) // stable under partitioning
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 8000) < 300)
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
    // growing the dataset never reassigns existing rows
    val grown = Sampling.hashSplit(spark.range(20000).toDF("id"), col("id"), w)
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (id, s) => grown(id) == s })
  }

  test("saltedEquiJoin returns exactly the plain join's rows on skewed data") {
    // 90% of the big side sits on one key — the shape that melts a single
    // reducer in a plain shuffle join
    val big = spark.range(20000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(lit(3L))).as("k"),
        $"id".as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (3L, "hot"), (5L, "c")).toDF("k", "name")
    val plain = big.join(small, "k")
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Sampling.saltedEquiJoin(big, small, "k", salt = 8)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
    // and the salted plan's join key really is (k, __salt)
    val p = Sampling.saltedEquiJoin(big, small, "k", 8).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("__salt"), p)
  }

  test("bootstrapMeans: Poisson weights resample to ~n with means around the truth") {
    val n = 5000
    val df = spark.range(n).select($"id", ($"id" % 100).cast("double").as("v"))
    val out = Sampling.bootstrapMeans(df, $"id", $"v", replicates = 8,
        inputDecimals = 0)
      .as[(Int, Long, Double)].collect()
    assert(out.length == 8 && out.map(_._1).sorted.toSeq == (0 until 8))
    // Poisson(1) weights: each replicate's effective n concentrates at n
    // (sd ≈ √n ≈ 71); 6σ bounds make this deterministic in practice —
    // and the weights ARE deterministic given the hash, so this is a
    // regression pin, not a flaky statistical test
    out.foreach { case (_, ne, _) => assert(math.abs(ne - n) < 500, (ne, n)) }
    // true mean of v is 49.5; bootstrap means must cluster around it
    out.foreach { case (_, _, m) => assert(math.abs(m - 49.5) < 3.0, m) }
    // replicates differ (the hash really varies by r)
    assert(out.map(_._3).distinct.length > 1)
  }

  test("leakageFreeSplit: no cluster straddles splits; singletons = hashSplit") {
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val df = spark.range(1000).toDF("id")
    // ids < 500 form clusters of 5 (comp = lowest member id); the rest are
    // unlabeled and must fall back to their own id
    val labels = spark.range(500)
      .select($"id", ($"id" - ($"id" % 5)).as("comp"))
    val out = Sampling.leakageFreeSplit(df, col("id"), labels, w)
      .select($"id", $"cluster", $"split")
      .as[(Long, Long, String)].collect()
    // every cluster maps to exactly one split — BY CONSTRUCTION, but pin it
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(perCluster.values.forall(_ == 1))
    // clustered rows: assignment is hashSplit of the cluster label
    val byClusterId = Sampling.hashSplit(
        labels.select($"comp".as("id")).distinct(), col("id"), w)
      .as[(Long, String)].collect().toMap
    out.filter(_._1 < 500).foreach { case (id, c, s) =>
      assert(c == id - (id % 5) && s == byClusterId(c), (id, c, s))
    }
    // unlabeled rows: singleton cluster = own id, so split == plain hashSplit
    val plain = Sampling.hashSplit(df.filter($"id" >= 500), col("id"), w)
      .as[(Long, String)].collect().toMap
    out.filter(_._1 >= 500).foreach { case (id, c, s) =>
      assert(c == id && s == plain(id), (id, c, s))
    }
  }

  test("bootstrapMeans is partition-count independent (integer-cent sums)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(concat($"l_orderkey".cast("string"), lit(":"),
        $"l_linenumber".cast("string")).as("id"), $"l_extendedprice")
    def m(d: org.apache.spark.sql.DataFrame) =
      Sampling.bootstrapMeans(d, $"id", $"l_extendedprice", 4)
        .as[(Int, Long, Double)].collect().toSet
    assert(m(df.repartition(1)) == m(df.repartition(19)))
  }

  test("contrastiveBatches: same-cluster docs never share a batch while the cluster fits; overflow fails visible") {
    import org.apache.spark.sql.functions.col
    // clusters: {1,2,3} (comp 1), {10..15} (comp 10, size 6 > nBatches 4),
    // singletons 20, 21
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (13L, 10L), (14L, 10L), (15L, 10L))
      .toDF("id", "comp")
    val ids = (Seq(1L, 2L, 3L, 20L, 21L) ++ (10L to 15L)).toDF("doc_id")
    try {
      val got = Sampling.contrastiveBatches(ids, col("doc_id"), labels, 4)
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got.size == 11)
      assert(got.values.forall { case (_, b, _) => b >= 0 && b < 4 })
      // the fitting cluster: all three batches distinct, all safe
      val c1 = Seq(1L, 2L, 3L).map(got)
      assert(c1.map(_._2).distinct.size == 3 && c1.forall(_._3))
      // the oversized cluster: first 4 ranks distinct + safe, ranks 4-5
      // flagged unsafe (pigeonhole — no assignment can separate 6 into 4)
      val c10 = (10L to 15L).map(got)
      assert(c10.take(4).map(_._2).distinct.size == 4)
      assert(c10.take(4).forall(_._3) && c10.drop(4).forall(!_._3))
      // singletons: cluster = own id, always safe
      assert(got(20L)._1 == 20L && got(20L)._3 && got(21L)._3)
      // deterministic: a second run is identical
      val again = Sampling.contrastiveBatches(ids, col("doc_id"), labels, 4)
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(again == got)
    } finally graft.CacheScope.drain()
  }
}