package graft.plans

import org.apache.spark.Partitioner
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CUSTOM edge parity (SURVEY §2.2): the reference lets an
  * EdgeManagerPlugin/Partitioner route records arbitrarily
  * (tez-runtime-library/.../api/Partitioner.java:44); Spark's RDD layer
  * exposes the same contract. The DataFrame API intentionally offers only
  * hash/range (Catalyst owns placement), so arbitrary routing drops to RDD —
  * documented as the escape hatch, placement asserted exactly.
  */
class CustomPartitionerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rdd.partitionBy honors an arbitrary Partitioner (Tez HashPartitioner parity)") {
    // the reference's default: (hash & MAX_VALUE) % n (HashPartitioner.java:30-35)
    class TezHash(n: Int) extends Partitioner {
      override def numPartitions: Int = n
      override def getPartition(key: Any): Int =
        (key.hashCode() & Integer.MAX_VALUE) % n
    }
    val rdd = spark.sparkContext
      .parallelize(Seq(("a", 1), ("b", 2), ("c", 3), ("a", 4)), 4)
      .partitionBy(new TezHash(3))
    val placed = rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map { case (k, _) => (k, pid) }
    }.collect().toSet
    for ((k, pid) <- placed)
      assert(pid == (k.hashCode() & Integer.MAX_VALUE) % 3, s"key $k misplaced")
    assert(rdd.getNumPartitions == 3)
  }
}
