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
