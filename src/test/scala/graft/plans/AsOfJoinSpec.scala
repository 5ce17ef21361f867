package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TemporalJoins

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("native as-of matches the brute-force latest-at-or-before per row") {
    val left = Seq(
      (1L, 1, ts(100)), (2L, 1, ts(205)), (3L, 1, ts(300)),
      (4L, 2, ts(150)), (5L, 3, ts(500))
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (1, ts(90), 9.0), (1, ts(205), 20.5), (1, ts(250), 25.0),
      (2, ts(200), 99.0)
    ).toDF("k", "rts", "v")
      .select($"k", $"rts", $"rts".as("rts_val"), $"v")

    val got = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map { case (id, t, v) => id -> ((t, v)) }.toMap

    assert(got(1L) == ((Some(ts(90)), Some(9.0))))
    assert(got(2L) == ((Some(ts(205)), Some(20.5))))
    assert(got(3L) == ((Some(ts(250)), Some(25.0))))
    assert(got(4L) == ((None, None)))
    assert(got(5L) == ((None, None)))
  }

  test("native as-of agrees with asOfBackward on randomized data incl. NULLs") {
    val rnd = new scala.util.Random(42)
    // ~5% NULL keys and NULL timestamps on BOTH sides, ~10% NULL right
    // vals: the two implementations must agree on join-predicate NULL
    // semantics (NULL key/ts never matches) and row-atomic NULL vals, not
    // just on the all-non-NULL happy path.
    def maybe[T](x: T): Option[T] = if (rnd.nextInt(20) == 0) None else Some(x)
    val left = (1 to 2000).map { i =>
      (i.toLong, maybe(rnd.nextInt(40)), maybe(ts(rnd.nextInt(10000).toLong)))
    }.toDF("event_id", "k", "ts").repartition(7)
    val right = (1 to 800).map { i =>
      (maybe(rnd.nextInt(50)), maybe(ts(rnd.nextInt(10000).toLong)),
        rnd.nextInt(1000) / 10.0)
    }.distinct.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
      // unique per (key, ts): keep max value like the q68 pre-aggregation
      (k, t, if (rnd.nextInt(10) == 0) Option.empty[Double] else Some(g.map(_._3).max))
    }.toSeq.toDF("k", "rts", "v")
      .select($"k", $"rts", $"rts".as("rts_val"), $"v").repartition(5)

    val a = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v").collect().map(_.toSeq).toSet
    val b = TemporalJoins.asOfBackward(left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("matched right row's NULL val stays NULL (row-atomic, no back-fill)") {
    // At ts=200 the matched purchase has v=NULL; per-column carry-forward
    // would back-fill 9.0 from the older row — both implementations must
    // return NULL instead.
    val left = Seq((1L, 1, ts(300))).toDF("event_id", "k", "ts")
    val right = Seq(
      (1, ts(100), Option(9.0)), (1, ts(200), Option.empty[Double])
    ).toDF("k", "rts", "v")
    val native = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    val rewrite = TemporalJoins.asOfBackward(left, right, "k", "ts", "rts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
    assert(native(1L).isEmpty)
    assert(rewrite(1L).isEmpty)
  }

  test("mismatched key/ts types are rejected, not silently reinterpreted") {
    val left = Seq((1L, 1, ts(100))).toDF("event_id", "k", "ts")
    val rightBadTs = Seq((1, 90L, 9.0)).toDF("k", "rts", "v") // long, not timestamp
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, rightBadTs, "k", "ts", "rts", Seq("v"))
    }
    assert(e1.getMessage.contains("timestamp types differ"))
    val rightBadKey = Seq(("1", ts(90), 9.0)).toDF("k", "rts", "v") // string key
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, rightBadKey, "k", "ts", "rts", Seq("v"))
    }
    assert(e2.getMessage.contains("key types differ"))
  }

  test("rightVals colliding with left columns (or duplicated) are rejected") {
    val left = Seq((1L, 1, ts(100))).toDF("event_id", "k", "ts")
    val right = Seq((1, ts(90), 9.0)).toDF("k", "rts", "event_id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("event_id"))
    }
    assert(e.getMessage.contains("collide"))
    val right2 = Seq((1, ts(90), 9.0)).toDF("k", "rts", "v")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, right2, "k", "ts", "rts", Seq("v", "v"))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("NULL keys and NULL timestamps never match") {
    val left = Seq(
      (1L, Option(1), Option(ts(100))),
      (2L, Option.empty[Int], Option(ts(100))),
      (3L, Option(1), Option.empty[Timestamp])
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (Option(1), Option(ts(50)), 5.0),
      (Option.empty[Int], Option(ts(40)), 4.0),
      (Option(1), Option.empty[Timestamp], 3.0)
    ).toDF("k", "rts", "v").select($"k", $"rts", $"v")

    val got = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("v"))
      .select("event_id", "v")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) == Some(5.0))  // only the non-null right row matches
    assert(got(2L) == None)
    assert(got(3L) == None)
  }

  test("plan is the merge operator — no nested loop, no window exchange") {
    val left = Seq((1L, 1, ts(100))).toDF("event_id", "k", "ts")
    val right = Seq((1, ts(90), 9.0)).toDF("k", "rts", "v")
    val df = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("self-derived sides (shared base relation) produce correct output") {
    // Both sides derive from the same DataFrame — expr-id collision is the
    // classic failure mode for hand-built logical plans; the re-alias in
    // asOfNative must keep them disjoint.
    val ev = Seq(
      (1L, 1, "click", ts(100), 0.0),
      (2L, 1, "purchase", ts(90), 9.0),
      (3L, 1, "click", ts(200), 0.0),
      (4L, 1, "purchase", ts(150), 15.0)
    ).toDF("event_id", "k", "etype", "ts", "value")
    val clicks = ev.filter($"etype" === "click").select($"event_id", $"k", $"ts")
    val purchases = ev.filter($"etype" === "purchase")
      .select($"k", $"ts".as("pts"), $"value".as("pvalue"))
    val got = AsOfJoin.asOfNative(clicks, purchases, "k", "ts", "pts", Seq("pvalue"))
      .select("event_id", "pvalue").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) == Some(9.0))
    assert(got(3L) == Some(15.0))
  }

  test("asOfForward agrees with a brute-force model on randomized data incl. NULLs") {
    val rnd = new scala.util.Random(7)
    def maybe[T](x: T): Option[T] = if (rnd.nextInt(20) == 0) None else Some(x)
    val leftRows = (1 to 1500).map { i =>
      (i.toLong, maybe(rnd.nextInt(30)), maybe(ts(rnd.nextInt(8000).toLong)))
    }
    val rightRows = (1 to 600).map { _ =>
      (maybe(rnd.nextInt(40)), maybe(ts(rnd.nextInt(8000).toLong)),
        rnd.nextInt(1000) / 10.0)
    }.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
      (k, t, g.map(_._3).max)
    }.toSeq
    val left = leftRows.toDF("event_id", "k", "ts").repartition(6)
    val right = rightRows.toDF("k", "rts", "v").repartition(4)

    val got = AsOfJoin.asOfForward(left, right, "k", "ts", "rts", Seq("v"))
      .select("event_id", "v")
      .as[(Long, Option[Double])].collect().toMap
    // brute force: earliest right at-or-after, NULL key/ts never matches
    val model = leftRows.map { case (id, k, t) =>
      id -> (for {
        kk <- k; tt <- t
        best <- rightRows
          .filter(r => r._1.contains(kk) && r._2.exists(!_.before(tt)))
          .sortBy(_._2.get.getTime).headOption
      } yield best._3)
    }.toMap
    assert(got == model)
  }

  test("AsOfJoinFilterPushdown: left-only filters sink below the join node") {
    // write the left side to parquet so the pushed predicate has a scan
    // to land in — the full chain is custom rule → below AsOfJoinNode →
    // Catalyst's own pushdown → PushedFilters in the file scan
    val dir = java.nio.file.Files.createTempDirectory("asofpd").toString
    (1 to 500).map(i => (i.toLong, i % 7, ts(i * 10L)))
      .toDF("event_id", "k", "ts").write.parquet(s"$dir/left")
    val left = spark.read.parquet(s"$dir/left")
    val right = Seq((1, ts(90), 9.0), (2, ts(50), 5.0))
      .toDF("k", "rts", "v")

    val joined = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("v"))
    val filtered = joined.filter($"event_id" <= 100)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the Filter must be INSIDE the join's left child, not above the node
    assert(optimized.indexOf("AsOfJoin") < optimized.indexOf("event_id#"),
      optimized)
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(event_id), LessThanOrEqual(event_id,100)]")
      || physical.contains("LessThanOrEqual(event_id,100)"), physical)
    // and a mixed predicate keeps its right-side half above the join
    val mixed = joined.filter($"event_id" <= 100 && $"v" > 1.0)
    assert(mixed.collect().map(_.getLong(0)).toSet ==
      joined.collect().filter(r => r.getLong(0) <= 100 &&
        Option(r.getAs[java.lang.Double]("v")).exists(_ > 1.0)).map(_.getLong(0)).toSet)
    // result identity: filter-above == filter-below
    val above = filtered.collect().map(_.toSeq).toSet
    val below = AsOfJoin.asOfNative(left.filter($"event_id" <= 100), right,
      "k", "ts", "rts", Seq("v")).collect().map(_.toSeq).toSet
    assert(above == below && above.size == 100)
  }

  test("AsOfJoinFilterPushdown: unused left columns are pruned from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("asofcp").toString
    (1 to 200).map(i => (i.toLong, i % 5, ts(i * 10L), "x" * 50))
      .toDF("event_id", "k", "ts", "fat_payload").write.parquet(s"$dir/left")
    val left = spark.read.parquet(s"$dir/left")
    val right = Seq((1, ts(90), 9.0)).toDF("k", "rts", "v")
    val q = AsOfJoin.asOfNative(left, right, "k", "ts", "rts", Seq("v"))
      .select("event_id", "v")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("fat_payload"), physical)
    assert(q.collect().length == 200)
  }

  test("asOfForward picks the EARLIEST right row at-or-after each left ts") {
    val left = Seq(
      (1L, 1, ts(100)), (2L, 1, ts(205)), (3L, 1, ts(300)),
      (4L, 2, ts(250)), (5L, 3, ts(500))
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (1, ts(90), 9.0), (1, ts(205), 20.5), (1, ts(250), 25.0),
      (2, ts(200), 99.0)
    ).toDF("k", "rts", "v")
      .select($"k", $"rts", $"rts".as("rts_val"), $"v")

    val got = AsOfJoin.asOfForward(left, right, "k", "ts", "rts", Seq("rts_val", "v"))
      .select("event_id", "rts_val", "v")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
      .map { case (id, t, v) => id -> ((t, v)) }.toMap

    assert(got(1L) == ((Some(ts(205)), Some(20.5)))) // not ts(90): it's before
    assert(got(2L) == ((Some(ts(205)), Some(20.5)))) // at-or-after includes ties
    assert(got(3L) == ((None, None)))                // nothing after 300 for k=1
    assert(got(4L) == ((None, None)))                // k=2's only row is before
    assert(got(5L) == ((None, None)))
  }
}
