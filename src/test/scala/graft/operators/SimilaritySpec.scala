package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f))   // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine matches hand computation") {
    val c = vecs.filter($"vec_id" === 0L)
      .crossJoin(vecs.filter($"vec_id" === 1L).select($"embedding".as("b")))
      .select(round(Similarity.cosine($"embedding", $"b"), 6).as("c"))
      .as[Double].head()
    assert(c == math.rint(0.9 / math.sqrt(0.81 + 0.01) * 1e6) / 1e6)
  }

  test("bruteForceTopK ranks identical vector first, opposite last") {
    val queries = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = Similarity.bruteForceTopK(queries, vecs, 4)
      .orderBy("rnk").as[(Long, Long, Double, Long)].collect()
    assert(top.map(_._2).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(top.head._3 == 1.0 && top.last._3 == -1.0)
    assert(!top.exists(_._2 == 0L)) // self excluded
  }

  test("lshBucket: identical vectors share a bucket, opposite vectors differ") {
    val b = vecs.select($"vec_id", Similarity.lshBucket($"embedding", 4, 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) == b(4L))
    assert(b(0L) != b(3L)) // all 8 sign bits flip for the negated vector
  }

  test("lshTopK returns only same-bucket neighbours, exactly scored") {
    val queries = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val res = Similarity.lshTopK(queries, vecs, 4, 10, 8)
      .as[(Long, Long, Double, Long)].collect()
    assert(res.exists(_._2 == 4L) && res.forall(_._2 != 3L))
  }

  test("cosineNearDupPairs finds the identical pair with score 1.0") {
    val pairs = Similarity.cosineNearDupPairs(vecs, 4, 0.99, 8)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 4L && p._3 == 1.0))
  }

  test("semanticDedup drops the higher-id duplicate within a cell, keeps the rest") {
    // vec 4 is identical to vec 0 (cosine 1.0) -> same cell, 4 dropped;
    // 0 survives as the lower id; everything else is unique enough
    val kept = Similarity.semanticDedup(vecs, nCells = 2, threshold = 0.99)
      .as[Long].collect().toSet
    assert(!kept.contains(4L) && kept.contains(0L))
    assert(kept.size == vecs.count() - 1)
  }
}
