package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SyntheticSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def load(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  test("plans the requested number of input partitions, rows exact") {
    val df = load(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    // deterministic content
    val r5 = df.filter($"k" === 5L).as[(Long, String, Double)].head()
    assert(r5 == SyntheticSource.row(5L))
  }

  test("composes with the relational engine like any other source") {
    val agg = load(10000, 4)
      .groupBy("cat").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(agg.count() == 8)
    assert(agg.agg(sum("n")).as[Long].head() == 10000L)
  }

  test("uneven division: last partition is short, no row lost") {
    val df = load(10, 3)
    assert(df.count() == 10)
    assert(df.select("k").as[Long].collect().toSet == (0L until 10L).toSet)
  }
}
