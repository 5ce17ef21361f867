package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative contract checks over a table,
  * compiled into ONE aggregation pass (the Great-Expectations-style gate a
  * pipeline runs before publishing a dataset).
  *
  * The reference has no data-quality surface (its validation is the
  * JoinValidate example DAG, tez-examples/.../JoinValidate.java:131-210 —
  * a bespoke anti-join); this generalizes that idea into a rule library.
  *
  * Scale design: every rule lowers to an aggregate expression over the
  * same scan — N rules cost ONE pass with partial aggregation, not N
  * passes. `Unique` lowers to `count(*) − count(DISTINCT struct(cols))`
  * inside the same aggregate (Catalyst plans the distinct via one Expand —
  * still a single scan). The result is rows-per-rule, derived from the
  * single aggregated row by an inline explode — no second job.
  *
  * Determinism: every output is an exact integer violation count and a
  * boolean — no float surface at all.
  */
object Expectations {

  /** One declarative check; `violates` is the per-row violation predicate
    * (null-safe: a NULL predicate counts per the rule's own definition).
    */
  sealed trait Rule { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** Column must lie in [lo, hi] (NULLs do not violate — compose with
    * [[NotNull]] to forbid them; a contract should say which it means).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col)"
  }

  /** Column must be one of `values` (NULLs do not violate). */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
    def name = s"accepted_values($col)"
  }

  /** String column must match the regex (NULLs do not violate). */
  final case class MatchesRegex(col: String, regex: String) extends Rule {
    def name = s"matches_regex($col)"
  }

  /** The column tuple must be unique across the table; violations = the
    * number of surplus rows (count − distinct count).
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  private def violationCount(r: Rule): Column = {
    // coalesce: sum over an EMPTY table is NULL — an empty dataset has
    // zero violations, not an unknown count
    def zsum(c: Column) = coalesce(sum(c), lit(0L))
    r match {
      case NotNull(c) =>
        zsum(when(col(c).isNull, 1L).otherwise(0L))
      case InRange(c, lo, hi) =>
        zsum(when(col(c).isNotNull &&
          (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
      case AcceptedValues(c, vs) =>
        zsum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
      case MatchesRegex(c, re) =>
        zsum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
      case Unique(cs) =>
        count(lit(1)) - count_distinct(struct(cs.map(col): _*))
    }
  }

  /** Evaluate all rules in one aggregation pass. Output: one row per rule
    * — (rule, violations, pass), ordered by rule name via the caller's
    * sort if needed (the driver gate sorts rows anyway).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggd = df.agg(
      violationCount(rules.head).as("v0"),
      rules.tail.zipWithIndex.map { case (r, i) =>
        violationCount(r).as(s"v${i + 1}") }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"v$i").cast("long").as("violations"))
    }
    aggd.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("pass"))
  }
}
