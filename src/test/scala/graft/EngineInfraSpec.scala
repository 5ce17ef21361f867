package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultiSink

class EngineInfraSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MultiSink: one materialization feeds N consistent sinks") {
    val dir = Files.createTempDirectory("multisink").toString
    // nondeterministic upstream (rand): both sinks must still agree
    val df = spark.range(100).select($"id", rand(42).as("r"))
    val counts = MultiSink.writeAll(df, Seq(
      "a" -> ((d: org.apache.spark.sql.DataFrame) => d.write.mode("overwrite").parquet(s"$dir/a")),
      "b" -> ((d: org.apache.spark.sql.DataFrame) => d.write.mode("overwrite").parquet(s"$dir/b"))))
    assert(counts == Map("a" -> 100L, "b" -> 100L))
    val a = spark.read.parquet(s"$dir/a").orderBy("id").as[(Long, Double)].collect().toSeq
    val b = spark.read.parquet(s"$dir/b").orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("Counters.track aggregates task metrics for the bracketed scope") {
    val (result, snap) = Counters.track(spark) {
      spark.range(10000).repartition(4).groupBy(($"id" % 10).as("k")).count().collect().length
    }
    assert(result == 10)
    assert(snap.tasks > 0)
    assert(snap.shuffleWriteBytes > 0 && snap.shuffleReadBytes > 0)
  }

  test("Fanout spreads a single-partition frame to defaultParallelism") {
    val one = spark.range(100).coalesce(1).toDF()
    assert(one.rdd.getNumPartitions == 1)
    assert(Fanout(one).rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }
}
