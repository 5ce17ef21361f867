package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("upsert updates matched keys, inserts new ones, passes the rest") {
    val updates = Seq((2L, "b2", 25.0), (9L, "z", 99.0)).toDF("k", "name", "bal")
    val out = Merge.upsert(base, updates, "k")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "z", 99.0)))
  }

  test("upsert with an empty batch is the identity") {
    val out = Merge.upsert(base, base.limit(0), "k")
      .as[(Long, String, Double)].collect().toSet
    assert(out == base.as[(Long, String, Double)].collect().toSet)
  }

  test("upsert rejects mismatched schemas") {
    intercept[IllegalArgumentException] {
      Merge.upsert(base, base.withColumnRenamed("bal", "amount"), "k")
    }
  }

  test("upsertHistory keeps the superseded row flagged non-current") {
    val updates = Seq((2L, "b2", 25.0)).toDF("k", "name", "bal")
    val out = Merge.upsertHistory(base, updates, "k")
      .as[(Long, String, Double, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "a", 10.0, true), (2L, "b2", 25.0, true), (2L, "b", 20.0, false),
      (3L, "c", 30.0, true)))
  }

  test("upsertHistory rejects inputs that already carry is_current") {
    // single-shot contract: re-applying to its own output would silently
    // overwrite the flag and re-mark historical rows as current
    val updates = Seq((2L, "b2", 25.0)).toDF("k", "name", "bal")
    val once = Merge.upsertHistory(base, updates, "k")
    intercept[IllegalArgumentException] {
      Merge.upsertHistory(once, updates.withColumn("is_current", lit(true)), "k")
    }
    // the documented iteration path works: filter to current rows, drop flag
    val iterated = Merge.upsertHistory(
      once.filter(col("is_current")).drop("is_current"),
      Seq((3L, "c2", 35.0)).toDF("k", "name", "bal"), "k")
    assert(iterated.filter(col("is_current")).count() == 3) // keys 1, 2', 3'
    assert(iterated.filter(!col("is_current")).count() == 1) // superseded 3
  }

  test("small batch onto large base broadcasts the batch (base unshuffled)") {
    val big = spark.range(0, 100000).select($"id".as("k"),
      concat(lit("n"), $"id").as("name"), ($"id" * 1.0).as("bal"))
    val batch = Seq((5L, "upd", 1.0)).toDF("k", "name", "bal")
    val plan = Merge.upsert(big, batch, "k").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast anti-join for tiny batch:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"base side should not shuffle for a tiny batch:\n$plan")
  }
}
