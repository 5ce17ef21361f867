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
}
