package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Expectations._

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(0.02), "A", "en", 1L),
    (Some(2L), Some(0.08), "A", "en", 1L), // range violation; dup (2-tuple below)
    (None, Some(0.01), "X", "de", 2L),     // null id; bad flag
    (Some(4L), None, "N", "EN", 2L),       // null value ok for range; bad lang case
    (Some(4L), Some(0.03), "R", "fr", 3L)  // dup id with previous row
  ).toDF("id", "v", "flag", "lang", "g")

  test("every rule counts exactly its violations; NULL semantics as documented") {
    val out = check(df, Seq(
      NotNull("id"),
      InRange("v", 0.0, 0.05),
      AcceptedValues("flag", Seq("A", "N", "R")),
      MatchesRegex("lang", "^[a-z]{2}$"),
      Unique(Seq("id")),
      Unique(Seq("id", "g"))))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("not_null(id)") == ((1L, false)))
    assert(out("in_range(v)") == ((1L, false)))          // NULL v not counted
    assert(out("accepted_values(flag)") == ((1L, false)))
    assert(out("matches_regex(lang)") == ((1L, false)))  // 'EN' fails, NULL would not
    assert(out("unique(id)") == ((1L, false)))           // ids {1,2,null,4,4}: 5−4
    assert(out("unique(id,g)") == ((0L, true)))          // all tuples distinct
  }

  test("all rules evaluate in ONE pass over the input") {
    val out = check(df, Seq(
      NotNull("id"), InRange("v", 0.0, 0.05),
      AcceptedValues("flag", Seq("A")), Unique(Seq("id"))))
    out.collect()
    // a single leaf = a single scan: N rules never cost N passes
    assert(out.queryExecution.executedPlan.collectLeaves().size == 1,
      out.queryExecution.executedPlan.toString)
  }

  test("empty input: zero violations, every rule passes") {
    val empty = df.filter($"g" < 0)
    val out = check(empty, Seq(NotNull("id"), Unique(Seq("id"))))
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 2 && out.forall(r => r._2 == 0L && r._3))
  }

  test("ForeignKey: anti-join violation count, NULLs exempt, composes with agg rules") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(20L)), (3L, Option(99L)), // 99 dangles
      (4L, None), (5L, Option(99L))                            // NULL exempt
    ).toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val out = check(child,
      Seq(NotNull("fk"), ForeignKey("fk", "parent", "pk")),
      Map("parent" -> parent))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("not_null(fk)") == ((1L, false)))
    assert(out("foreign_key(fk -> parent.pk)") == ((2L, false))) // the two 99s
    // a contained FK passes (and an empty child trivially passes)
    val ok = check(child.filter($"fk".isin(10L, 20L)),
      Seq(ForeignKey("fk", "parent", "pk")), Map("parent" -> parent))
      .as[(String, Long, Boolean)].head()
    assert(ok == (("foreign_key(fk -> parent.pk)", 0L, true)))
    // a missing ref table fails loudly, never silently passes
    intercept[IllegalArgumentException] {
      check(child, Seq(ForeignKey("fk", "nope", "pk")))
    }
  }
}
