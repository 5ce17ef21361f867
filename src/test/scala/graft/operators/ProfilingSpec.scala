package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val prices = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(col("l_extendedprice"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Double, Double, Long)] =
    df.as[(Long, Double, Double, Long)].collect().toSet

  test("equiDepth equals the single-window reference for any scan partition count") {
    val k = 10
    // reference: plain window cumsum over distinct values (the form whose
    // single global window the operator exists to avoid)
    val counts = prices.groupBy(col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val n = counts.agg(sum("c")).as[Long].head()
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = counts
      .withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("bucket", expr(s"CAST((cb * $k) DIV $n AS BIGINT)"))
      .groupBy("bucket")
      .agg(min("v").as("lo"), max("v").as("hi"), sum("c").as("cnt"))
    val refRows = rows(ref)
    for (parts <- Seq(1, 7, 32)) {
      val got = rows(Profiling.equiDepth(prices, col("l_extendedprice"), k, parts))
      assert(got == refRows, s"equiDepth($parts) diverged from the window reference")
    }
  }

  test("exactQuantiles matches the sort-based reference for any scan partition count") {
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    // reference: type-1 (lower-nearest) quantile straight off the sorted
    // values — the definition, computed the naive way
    val sorted = prices.orderBy("l_extendedprice")
      .as[Double].collect()
    val ref = probs.map { p =>
      p -> sorted(math.ceil(p * sorted.length).toLong.toInt - 1)
    }.toSet
    for (parts <- Seq(1, 5, 32)) {
      val got = Profiling.exactQuantiles(prices, col("l_extendedprice"), probs, parts)
        .as[(Double, Double)].collect().toSet
      assert(got == ref, s"exactQuantiles($parts) diverged: $got vs $ref")
    }
  }

  test("quantile rank guards the FP ceil: p=0.07 over 100 rows is rank 7, not 8") {
    // the double nearest 0.07 times 100 is 7.000000000000001 — a raw
    // ceil returns rank 8 (the wrong element); the 1e-6 slack pins the
    // intended decimal semantics. Regression for the round-5 review.
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = Profiling.exactQuantiles(df, col("v"), Seq(0.07), scanParts = 4)
      .as[(Double, Double)].collect().toSet
    assert(got == Set((0.07, 7.0)), s"got $got")
    val grouped = Profiling.groupedQuantiles(
      df.withColumn("g", lit("x")), col("g"), col("v"), Seq(0.07))
      .as[(String, Double, Double)].collect().toSet
    assert(grouped == Set(("x", 0.07, 7.0)), s"got $grouped")
  }

  test("groupedQuantiles matches the per-group sort-based reference, heavy ties included") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val probs = Seq(0.25, 0.5, 0.9)
    val byGroup = li.select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect().groupBy(_._1)
    val ref = byGroup.flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      probs.map(p => (g, p, sorted(math.ceil(p * sorted.length).toInt - 1)))
    }.toSet
    val got = Profiling.groupedQuantiles(li, col("l_returnflag"),
        col("l_quantity"), probs)
      .as[(String, Double, Double)].collect().toSet
    assert(got == ref && ref.nonEmpty)
  }

  test("quantile edge cases: tie across covering positions; vanishing probability") {
    // ties spanning floor(h) and ceil(h) on a NON-integral double: the
    // built-in short-circuits lowerKey == higherKey and returns 0.1
    // exactly; interpolating (1-f)*0.1 + f*0.1 would be off by 1 ulp
    val ties = Seq(("x", 0.1), ("x", 0.1), ("x", 0.1), ("x", 0.2)).toDF("g", "v")
    val builtin = ties.groupBy("g").agg(expr("percentile(v, 0.3)").as("p"))
      .as[(String, Double)].collect().head._2
    val ours = Profiling.groupedQuantilesCont(ties, col("g"), col("v"), Seq(0.3))
      .select(col("value")).as[Double].collect().head
    assert(ours == builtin && ours == 0.1)
    // p so small that p*n - 1e-6 <= 0: the rank clamps to 1 (the minimum)
    // instead of silently matching no row
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val tiny = Profiling.exactQuantiles(df, col("v"), Seq(1e-8), scanParts = 4)
      .as[(Double, Double)].collect().toSet
    assert(tiny == Set((1e-8, 1.0)), s"got $tiny")
  }

  test("groupedQuantilesCont is BIT-identical to Spark's exact percentile") {
    // the whole point of the operator: same values as the built-in, but
    // O(distinct-values) state instead of a buffered array per group
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"),
        graft.operators.TextOps.wsTokenCount(col("text")).cast("long").as("n_tok"))
    for (p <- Seq(0.1, 0.5, 0.9, 0.95)) {
      val builtin = docs.groupBy("lang")
        .agg(expr(s"percentile(n_tok, $p)").as("v"))
        .as[(String, Double)].collect().toMap
      val ours = Profiling.groupedQuantilesCont(docs, col("lang"), col("n_tok"), Seq(p))
        .select(col("group"), col("value"))
        .as[(String, Double)].collect().toMap
      assert(ours == builtin, s"p=$p: $ours vs $builtin")
    }
    // heavy ties: l_quantity has ~50 distinct values per group
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val b2 = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.37)").as("v"))
      .as[(String, Double)].collect().toMap
    val o2 = Profiling.groupedQuantilesCont(li, col("l_returnflag"),
        col("l_quantity"), Seq(0.37))
      .select(col("group"), col("value"))
      .as[(String, Double)].collect().toMap
    assert(o2 == b2)
  }

  test("equiDepth buckets cover all rows, are ordered, and are depth-balanced") {
    val k = 8
    val total = prices.count()
    val got = rows(Profiling.equiDepth(prices, col("l_extendedprice"), k))
      .toSeq.sortBy(_._1)
    assert(got.map(_._1) == (0L until k.toLong)) // every bucket present
    assert(got.map(_._4).sum == total)
    // ranges are disjoint and ascending
    got.sliding(2).foreach { case Seq(a, b) => assert(a._3 < b._2) case _ => }
    // depth balance: prices are near-unique, so each bucket is within one
    // value-multiplicity of the ideal n/k
    val ideal = total.toDouble / k
    got.foreach { case (b, _, _, cnt) =>
      assert(math.abs(cnt - ideal) <= ideal * 0.25 + 2,
        s"bucket $b depth $cnt vs ideal $ideal")
    }
  }

  test("columnProfile reports exact per-column null/distinct/min/max") {
    val df = Seq(
      (1L, Some(2.5), Some("a")),
      (2L, None, Some("b")),
      (3L, Some(7.5), None),
      (4L, Some(2.5), Some("a"))
    ).toDF("k", "x", "s")
    val got = Profiling.columnProfile(df, Seq("k", "x"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("k", "x", "s"))
    val k = got("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 4)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 4.0 && k.isNullAt(6))
    val x = got("x")
    assert(x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 2.5 && x.getDouble(5) == 7.5)
    val s = got("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("corrMatrix matches Spark's built-in corr to rounding tolerance") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val got = Profiling.corrMatrix(li, cols)
      .as[(String, String, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got.keySet == Set(("l_quantity", "l_extendedprice"),
      ("l_quantity", "l_discount"), ("l_extendedprice", "l_discount")))
    for (((a, b), c) <- got) {
      val ref = li.agg(corr(col(a), col(b))).as[Double].head()
      // built-in corr aggregates in doubles (order-dependent tail); the
      // decimal-moment form is exact — they agree to well inside 1e-3
      assert(math.abs(c - ref) < 1e-3, s"($a,$b): $c vs $ref")
      assert(c.abs <= 1.0)
    }
  }

  test("corrMatrix is partition-count independent (exact decimal moments)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice")
    def m(df: org.apache.spark.sql.DataFrame) =
      Profiling.corrMatrix(df, cols).as[(String, String, Double)].collect().toSet
    assert(m(li.repartition(1)) == m(li.repartition(17)))
  }

  test("weightedQuantiles equals row-count quantiles over the expanded multiset") {
    // the definition: a value with weight w counts w times. Expand a
    // small weighted set and compare against the sort-based reference.
    val data = Seq((10.0, 1L), (20.0, 5L), (30.0, 2L), (40.0, 1L), (50.0, 3L))
    val df = data.toDF("v", "w")
    val expanded = data.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val ref = probs.map(p =>
      p -> expanded(math.ceil(p * expanded.length).toInt - 1)).toMap
    try {
      for (parts <- Seq(1, 4, 32)) {
        val got = Profiling.weightedQuantiles(df, col("v"), col("w"), probs, parts)
          .as[(Double, Double)].collect().toMap
        assert(got == ref, s"parts=$parts: $got vs $ref")
      }
      // zero-weight rows contribute nothing
      val withZero = (data :+ (5.0, 0L)).toDF("v", "w")
      val gz = Profiling.weightedQuantiles(withZero, col("v"), col("w"), Seq(0.1))
        .as[(Double, Double)].collect().toMap
      assert(gz(0.1) == ref(0.1))
    } finally graft.CacheScope.drain()
  }

  test("groupedWeightedQuantiles equals per-group expanded-multiset quantiles; partition-invariant") {
    // per-group definition: within each group, a value with weight w
    // counts w times; compose the q117 grouping with the q138 weighting
    val data = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 5L), ("a", 30.0, 2L),
      ("b", 1.0, 3L), ("b", 2.0, 1L), ("b", 3.0, 4L), ("b", 4.0, 0L))
    val probs = Seq(0.1, 0.5, 0.9, 1.0)
    val ref = (for {
      (g, rows) <- data.groupBy(_._1).toSeq
      expanded = rows.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted
      p <- probs
    } yield (g, p) -> expanded(math.ceil(p * expanded.length).toInt - 1)).toMap
    for (parts <- Seq(1, 17)) {
      val got = Profiling.groupedWeightedQuantiles(
          data.toDF("g", "v", "w").repartition(parts),
          col("g"), col("v"), col("w"), probs)
        .as[(String, Double, Double)].collect()
        .map { case (g, p, v) => (g, p) -> v }.toMap
      assert(got == ref, s"parts=$parts: $got vs $ref")
    }
  }

  test("percentileRank is the mid-rank percentile, monotone, partition-independent") {
    val df = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 10.0).toDF("v")
    try {
      val got = Profiling.percentileRank(df, col("v"))
        .as[(Double, Double)].collect().toMap
      // n=6: 1.0 -> (0 + 1/2)/6; 2.0 -> (1 + 3/2)/6; 3.0 -> (4 + 1/2)/6;
      // 10.0 -> (5 + 1/2)/6
      assert(got == Map(1.0 -> 0.5 / 6, 2.0 -> 2.5 / 6, 3.0 -> 4.5 / 6,
        10.0 -> 5.5 / 6), got)
      val g17 = Profiling.percentileRank(df.repartition(17), col("v"))
        .as[(Double, Double)].collect().toMap
      assert(g17 == got)
    } finally graft.CacheScope.drain()
  }

  test("winsorize clamps exactly to the p-lo/p-hi exact quantiles") {
    try {
      val cuts = Profiling.exactQuantiles(prices, col("l_extendedprice"),
          Seq(0.05, 0.95)).as[(Double, Double)].collect().toMap
      val (lo, hi) = (cuts(0.05), cuts(0.95))
      val w = Profiling.winsorize(prices, col("l_extendedprice"), 0.05, 0.95, "w")
        .select(col("l_extendedprice"), col("w"))
        .as[(Double, Double)].collect()
      assert(w.forall { case (_, ww) => ww >= lo && ww <= hi })
      assert(w.forall { case (v, ww) =>
        ww == math.min(math.max(v, lo), hi) })
      // something actually clamps at both tails on near-unique prices
      assert(w.exists { case (v, ww) => v < ww } &&
        w.exists { case (v, ww) => v > ww })
    } finally graft.CacheScope.drain()
  }

  test("robustProfile equals the three individually-derived robust stat sets") {
    // the scan-sharing contract: one cum scan must reproduce EXACTLY what
    // exactQuantiles + winsorize-moments + the MAD pipeline produce when
    // each runs its own scan (same rank arithmetic, same DECIMAL moments)
    val probs = Seq(0.25, 0.5, 0.75, 0.9)
    try {
      val r = Profiling.robustProfile(prices, col("l_extendedprice"), probs,
        pLo = 0.05, pHi = 0.95)
        .as[(Seq[(Double, Double)], Long, Double, Double, Double, Double, Long)]
        .collect().head
      val (qArr, nRows, wMean, wStd, med, mad, nOut) = r
      // quantiles
      val qRef = Profiling.exactQuantiles(prices, col("l_extendedprice"), probs)
        .as[(Double, Double)].collect().sortBy(_._1).toSeq
      assert(qArr == qRef)
      // winsorized moments (independent derivation through winsorize)
      val wRef = Profiling.winsorize(prices, col("l_extendedprice"), 0.05, 0.95, "w")
        .agg(count(lit(1)).as("n"),
          sum(col("w").cast(org.apache.spark.sql.types.DecimalType(38, 2)))
            .cast("double").as("s"),
          sum((col("w") * col("w"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4)))
            .cast("double").as("ss"))
        .select(col("n"), round(col("s") / col("n"), 4),
          round(sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)), 4))
        .as[(Long, Double, Double)].collect().head
      assert((nRows, wMean, wStd) == wRef)
      // MAD screen (independent derivation)
      val medRef = Profiling.exactQuantiles(prices, col("l_extendedprice"), Seq(0.5))
        .as[(Double, Double)].collect().head._2
      assert(med == medRef)
      val dev = prices.select(abs(col("l_extendedprice") - lit(medRef)).as("ad"))
      val madRef = Profiling.exactQuantiles(dev, col("ad"), Seq(0.5))
        .as[(Double, Double)].collect().head._2
      assert(mad == madRef)
      val outRef = dev.filter(col("ad") > lit(4.4478) * lit(madRef)).count()
      assert(nOut == outRef)
    } finally graft.CacheScope.drain()
  }
}
