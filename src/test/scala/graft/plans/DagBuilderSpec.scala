package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DagBuilderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordcount DAG: source -> tokenizer -> scatter-gather -> summer") {
    val out = DagBuilder.create("wordcount")
      .addSource("lines")(Seq("a b a", "b c").toDF("line"))
      .addProcessor("tokenizer") { case Seq(lines) =>
        lines.select(explode(split(col("line"), " ")).as("word"))
      }
      .addProcessor("summer") { case Seq(words) =>
        words.groupBy("word").agg(count(lit(1)).as("cnt"))
      }
      .addEdge("lines", "tokenizer", Edge.oneToOne)
      .addEdge("tokenizer", "summer", Edge.scatterGatherSorted("word"))
      .output("summer")
    assert(out.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("hash-join DAG with a broadcast edge") {
    val out = DagBuilder.create("hashjoin")
      .addSource("facts")(Seq((1, 10.0), (2, 20.0), (1, 5.0)).toDF("k", "v"))
      .addSource("dim")(Seq((1, "one"), (2, "two")).toDF("k2", "name"))
      .addProcessor("joiner") { case Seq(facts, dim) =>
        facts.join(dim, col("k") === col("k2")).select(col("name"), col("v"))
      }
      .addEdge("facts", "joiner", Edge.scatterGather("k"))
      .addEdge("dim", "joiner", Edge.broadcastEdge)
      .output("joiner")
    assert(out.as[(String, Double)].collect().sortBy(r => (r._1, r._2)).toSeq ==
      Seq(("one", 5.0), ("one", 10.0), ("two", 20.0)))
  }

  test("vertex group union feeds a single aggregation") {
    val out = DagBuilder.create("union")
      .addSource("s1")(Seq(1, 2).toDF("x"))
      .addSource("s2")(Seq(2, 3).toDF("x"))
      .addProcessor("agg") { case Seq(in) => in.groupBy("x").agg(count(lit(1)).as("c")) }
      .addUnion(Seq("s1", "s2"), "agg")
      .output("agg")
    assert(out.as[(Int, Long)].collect().toMap == Map(1 -> 1L, 2 -> 2L, 3 -> 1L))
  }

  test("scatter-gather-sorted edge delivers per-partition sorted, co-located keys") {
    val df = Seq((3, "c"), (1, "a"), (2, "b"), (1, "z")).toDF("k", "v")
    val moved = Edge(Edge.ScatterGatherSorted(Seq("k"), Some(2)), df)
    val parts = moved.rdd.mapPartitions(it => Iterator.single(it.map(_.getInt(0)).toList)).collect()
    assert(parts.forall(p => p == p.sorted))
    assert(parts.count(_.contains(1)) == 1) // key co-location
  }

  test("Edge.Custom routes rows exactly where the reference formula says") {
    // placement parity with HashPartitioner.java:30-35:
    // (key.hashCode & Integer.MAX_VALUE) % numPartitions
    val n = 5
    val df = Seq.tabulate(100)(i => (s"key_$i", i)).toDF("k", "v")
    val moved = Edge(Edge.custom(new RefHashPartitioner(n))(r => r.getString(0)), df)
    assert(moved.rdd.getNumPartitions == n)
    val placement = moved.rdd
      .mapPartitionsWithIndex((p, it) => it.map(r => (r.getString(0), p)))
      .collect().toMap
    for ((k, p) <- placement)
      assert(p == (k.hashCode & Integer.MAX_VALUE) % n, s"key $k")
    // the movement only re-routes rows; content is unchanged
    assert(moved.as[(String, Int)].collect().toSet ==
      Seq.tabulate(100)(i => (s"key_$i", i)).toSet)
  }

  test("Edge.Custom composes inside a DAG (vertex-to-vertex movement)") {
    val out = DagBuilder.create("custom-edge")
      .addSource("src")(Seq.tabulate(20)(i => (i % 4, i)).toDF("k", "v"))
      .addProcessor("sum") { case Seq(in) =>
        // per-partition sums — correctness requires the custom movement
        // to have co-located every key
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("sum", org.apache.spark.sql.types.IntegerType)))
        in.sparkSession.createDataFrame(
          in.rdd.mapPartitions { it =>
            val m = scala.collection.mutable.Map.empty[Int, Int]
            it.foreach(r => m.updateWith(r.getInt(0))(v => Some(v.getOrElse(0) + r.getInt(1))))
            m.iterator.map { case (k, s) => org.apache.spark.sql.Row(k, s) }
          }, schema)
      }
      .addEdge("src", "sum", Edge.custom(new RefHashPartitioner(3))(_.getInt(0)))
      .output("sum")
    val expect = Seq.tabulate(20)(i => (i % 4, i)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(out.as[(Int, Int)].collect().toMap == expect)
  }

  test("pairedOneToOne zips the i-th partitions of two vertices (no shuffle)") {
    // two producers with aligned partitioning: task i of the consumer sees
    // exactly partition i of each (BroadcastAndOneToOneExample.java:171)
    val a = spark.range(0, 8, 1, numPartitions = 4).toDF("id")
    val b = spark.range(100, 108, 1, numPartitions = 4).toDF("id")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pair_sum", org.apache.spark.sql.types.LongType)))
    val out = DagBuilder.pairedOneToOne(a, b, schema) { (ia, ib) =>
      ia.zip(ib).map { case (x, y) => org.apache.spark.sql.Row(x.getLong(0) + y.getLong(0)) }
    }
    // range splits 2 ids per partition; i-th pairs with i-th → sums are exact
    assert(out.as[Long].collect().sorted.toSeq ==
      (0 until 8).map(i => i + 100L + i).sorted)
    assert(out.rdd.getNumPartitions == 4)
    val mismatched = spark.range(0, 8, 1, numPartitions = 2).toDF("id")
    assertThrows[IllegalArgumentException](
      DagBuilder.pairedOneToOne(a, mismatched, schema)((x, _) => x))
  }

  test("verify rejects cycles and unknown vertices") {
    val cyclic = DagBuilder.create("cycle")
      .addSource("a")(Seq(1).toDF("x"))
      .addProcessor("b") { case Seq(in) => in }
      .addProcessor("c") { case Seq(in) => in }
      .addEdge("b", "c", Edge.oneToOne)
      .addEdge("c", "b", Edge.oneToOne)
    assertThrows[IllegalArgumentException](cyclic.verify())
    val dangling = DagBuilder.create("dangling")
      .addSource("a")(Seq(1).toDF("x"))
      .addEdge("ghost", "a", Edge.oneToOne)
    assertThrows[IllegalArgumentException](dangling.verify())
  }
}
