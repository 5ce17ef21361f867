package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SecondarySortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"),
    ("b", 9, "y9"), ("b", 7, "y7"),
    ("c", 5, "z5")
  ).toDF("k", "seq", "v")

  test("sortedByGroup keeps each group contiguous and internally ordered") {
    val out = SecondarySort.sortedByGroup(df, Seq("k"), Seq(col("seq")))
    val parts = out.rdd.mapPartitions { it =>
      Iterator.single(it.map(r => (r.getString(0), r.getInt(1))).toList)
    }.collect()
    for (p <- parts; (k, rows) <- p.groupBy(_._1)) {
      assert(rows.map(_._2) == rows.map(_._2).sorted, s"group $k not sorted in partition")
      // contiguity: the group's rows appear as one consecutive block
      val idx = p.zipWithIndex.filter(_._1._1 == k).map(_._2)
      assert(idx == (idx.head to idx.last).toList, s"group $k not contiguous")
    }
    // a group never spans partitions
    val owners = parts.toSeq.zipWithIndex.flatMap { case (p, i) => p.map(_._1).distinct.map(_ -> i) }
    assert(owners.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
  }

  test("firstRowPerGroup picks the min row under the secondary order") {
    val out = SecondarySort.firstRowPerGroup(df, Seq("k"), Seq(col("seq")))
      .select("k", "seq", "v").as[(String, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 1, "x1"), ("b", 7, "y7"), ("c", 5, "z5")))
  }

  test("mapSortedGroups streams each group exactly once, in secondary order") {
    implicit val enc = org.apache.spark.sql.Encoders.product[(String, String)]
    val out = SecondarySort.mapSortedGroups(df, Seq("k"), Seq(col("seq"))) { (key, rows) =>
      Iterator.single((key.head.toString, rows.map(_.getAs[String]("v")).mkString(",")))
    }.collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", "x1,x2,x3"), ("b", "y7,y9"), ("c", "z5")))
  }

  test("GroupedIterator drains unconsumed groups and handles empty input") {
    val rows = Seq(Row("a", 1), Row("a", 2), Row("b", 3)).iterator
    val gi = new SecondarySort.GroupedIterator(rows, r => Seq(r.getString(0)))
    val (k1, _) = gi.next() // don't consume the inner iterator
    assert(k1 == Seq("a"))
    val (k2, g2) = gi.next()
    assert(k2 == Seq("b") && g2.toList.map(_.getInt(1)) == List(3))
    assert(!gi.hasNext)
    assert(!new SecondarySort.GroupedIterator(Iterator.empty, _ => Seq()).hasNext)
  }
}
