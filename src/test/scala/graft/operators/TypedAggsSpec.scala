package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TypedAggsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TopK aggregator matches the rank-window result with O(k) state") {
    val df = Seq(
      ("g1", 5.0, "e"), ("g1", 9.0, "a"), ("g1", 7.0, "b"), ("g1", 1.0, "z"),
      ("g2", 2.0, "x"), ("g2", 3.0, "y")).toDF("grp", "score", "tag")
    val topk = udaf(new TypedAggs.TopK(2))
    val viaAgg = df.groupBy("grp")
      .agg(topk($"score", $"tag").as("top"))
      .as[(String, String)].collect().toMap
    assert(viaAgg == Map("g1" -> "a,b", "g2" -> "y,x"))
  }

  test("sumCombiner via udaf performs partial aggregation (combiner parity)") {
    val words = Seq("a", "b", "a", "c", "a").toDF("word").withColumn("one", lit(1L))
    val sumU = udaf(TypedAggs.sumCombiner)
    val counts = words.groupBy("word").agg(sumU($"one").as("cnt"))
    assert(counts.as[(String, Long)].collect().toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    // partial+final HashAggregate = map-side combine in the plan
    val p = counts.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("Tables.registerViews exposes the catalog to spark.sql") {
    graft.Tables(spark, "/root/testdata/sf0.001").registerViews()
    val n = spark.sql("SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .as[Long].head()
    assert(n > 0)
  }
}
