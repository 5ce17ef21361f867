package graft.operators


import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CogroupAndRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cogroup merges two grouped inputs per key (OrderedGroupedMergedKVInput parity)") {
    // SURVEY §2.6: the reference PQ-merges N sorted grouped inputs
    // (tez-runtime-library/.../input/OrderedGroupedMergedKVInput.java:48);
    // Spark's typed cogroup delivers both groups per key in one pass.
    val left = Seq((1, "a"), (1, "b"), (2, "c")).toDS().groupByKey(_._1)
    val right = Seq((1, 10), (3, 30)).toDS().groupByKey(_._1)
    val merged = left.cogroup(right) { (k, ls, rs) =>
      Iterator.single((k, ls.map(_._2).toSeq.sorted.mkString(","), rs.map(_._2).sum))
    }.collect().sortBy(_._1)
    assert(merged.toSeq == Seq((1, "a,b", 10), (2, "c", 0), (3, "", 30)))
  }

  test("ExecutorRegistry builds once per JVM and shares across tasks") {
    ExecutorRegistry.clear("spec:")
    // every task must observe the SAME cached instance (identity), proving
    // the build ran once per JVM and later tasks reused it
    val out = spark.range(0, 100, 1, numPartitions = 8).as[Long]
      .mapPartitions { it =>
        val decoder = ExecutorRegistry.cachedOrBuild("spec:decoder") {
          (x: Long) => x * 2
        }
        it.map(x => (System.identityHashCode(decoder), decoder(x)))
      }.collect()
    assert(out.map(_._2).sorted.toSeq == (0L until 100L).map(_ * 2))
    assert(out.map(_._1).distinct.length == 1, "all tasks must share one instance")
    ExecutorRegistry.clear("spec:")
  }
}
