package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfBackward matches the brute-force latest-at-or-before per row") {
    val left = Seq(
      (1L, 1, ts(100)), (2L, 1, ts(205)), (3L, 1, ts(300)),
      (4L, 2, ts(150)), (5L, 3, ts(500))
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (1, ts(90), 9.0), (1, ts(205), 20.5), (1, ts(250), 25.0),
      (2, ts(200), 99.0) // after left's only row for k=2 → null
    ).toDF("k", "rts", "v")
      .select($"k", $"rts", $"rts".as("rts_val"), $"v")

    val got = TemporalJoins.asOfBackward(left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map { case (id, t, v) => id -> ((t, v)) }.toMap

    assert(got(1L) == ((Some(ts(90)), Some(9.0))))   // 90 <= 100
    assert(got(2L) == ((Some(ts(205)), Some(20.5)))) // exact-ts match taken
    assert(got(3L) == ((Some(ts(250)), Some(25.0)))) // latest of {90,205,250}
    assert(got(4L) == ((None, None)))                // right row is later
    assert(got(5L) == ((None, None)))                // key has no right rows
  }

  test("pointInInterval equals the brute-force BETWEEN join across bin widths") {
    val points = (1 to 200)
      .map(i => (i.toLong, i % 5, ts(i * 37L % 3000)))
      .toDF("pid", "k", "pt")
    val intervals = (1 to 60)
      .map(j => (j.toLong, j % 5, ts(j * 50L), ts(j * 50L + 120)))
      .toDF("iid", "k", "s", "e")
    val expect = points.join(intervals, Seq("k"))
      .filter($"pt" >= $"s" && $"pt" <= $"e")
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty)
    for (bin <- Seq(7L, 60L, 120L, 1000L)) {
      val got = TemporalJoins.pointInInterval(points, intervals, "k", "pt", "s", "e", bin)
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      assert(got == expect, s"binSeconds=$bin")
    }
  }

  test("intervalOverlap equals the naive inequality join across bin sizes") {
    val left = (1 to 70)
      .map(i => (i.toLong, i % 4, ts(i * 40L), ts(i * 40L + 90)))
      .toDF("a_id", "k", "as", "ae")
    val right = (1 to 50)
      .map(j => (j.toLong, j % 4, ts(j * 55L), ts(j * 55L + 60)))
      .toDF("b_id", "k", "bs", "be")
    val expect = left.join(right, Seq("k"))
      .filter($"as" <= $"be" && $"bs" <= $"ae")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty)
    for (bin <- Seq(13L, 60L, 90L, 500L)) {
      val got = TemporalJoins.intervalOverlap(
        left, right, "k", "as", "ae", "bs", "be", bin)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == expect, s"binSeconds=$bin")
    }
  }

  test("asOfBackwardTolerance: stale matches become NULL, never the next row") {
    val left = Seq(
      (1L, 1, ts(100)), // match at 90 (10s old) — fresh at tol 30
      (2L, 1, ts(300)), // latest at-or-before is 205 (95s old) — STALE
      (3L, 2, ts(150))  // no right row at all
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (1, ts(90), 9.0), (1, ts(205), 20.5),
      (2, ts(200), 99.0)
    ).toDF("k", "rts", "v")
      .select($"k", $"rts", $"rts".as("rts_val"), $"v")
    val got = TemporalJoins.asOfBackwardTolerance(
        left, right, "k", "ts", "rts", Seq("rts_val", "v"), tolSeconds = 30L)
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map { case (id, t, v) => id -> ((t, v)) }.toMap
    assert(got(1L) == ((Some(ts(90)), Some(9.0))))
    assert(got(2L) == ((None, None))) // stale — NOT the (later) 205 row
    assert(got(3L) == ((None, None)))
    // tolerance 0 keeps only exact-timestamp matches
    val exact = TemporalJoins.asOfBackwardTolerance(
        left, right, "k", "ts", "rts", Seq("rts_val", "v"), tolSeconds = 0L)
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(exact.values.forall(_.isEmpty))
    // and a huge tolerance degenerates to plain asOfBackward
    val loose = TemporalJoins.asOfBackwardTolerance(
        left, right, "k", "ts", "rts", Seq("rts_val", "v"), tolSeconds = 10000L)
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    val plain = TemporalJoins.asOfBackward(
        left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    assert(loose == plain)
  }
}
