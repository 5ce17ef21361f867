package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — as-of and range —
  * implemented with the shapes that survive 100 TB instead of the
  * inequality-join nested loop Catalyst would otherwise plan.
  * (The reference has no temporal join either; its HashJoinExample family
  * is strictly equi-key. These extend §2.4's join matrix.)
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single right row
    * with the greatest `rightTs` ≤ `leftTs` on the same key (nulls when no
    * prior right row exists) — "latest state as of this moment".
    *
    * Implementation is the union/carry-forward pattern: tag both sides,
    * union, ONE hash exchange on `key` with a per-partition sort on
    * (ts, side), then a last-non-null running window fills each left row
    * from the most recent right row at-or-before it. Right rows sort
    * before left rows at equal ts, so an exact-timestamp match is taken
    * (ASOF `≤` semantics). Cost: |L|+|R| rows through one exchange+sort —
    * never the |L|·|R| BroadcastNestedLoop a naive `l.ts >= r.ts` join
    * plans, and no per-left-row probe. A pathologically hot key funnels
    * its rows into one sort task (same caveat as any keyed window) —
    * pre-split such keys by coarse time bucket if needed.
    *
    * NULL semantics match [[graft.plans.AsOfJoin.asOfNative]] (join-
    * predicate semantics): right rows with a NULL key or NULL ts are
    * filtered out, left rows with a NULL key or NULL ts get NULL vals, and
    * the matched right row's values are carried forward as ONE struct —
    * row-atomic, so a matched row's NULL val stays NULL instead of being
    * back-filled per-column from an older right row.
    *
    * `rightVals` must be functionally determined by (key, rightTs) —
    * pre-aggregate the right side otherwise (ties would be nondeterministic
    * in ANY as-of engine).
    */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val lCols = left.columns.toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => org.apache.spark.sql.types.StructField(v, rightTypes(v))))
    val lAligned = left.select(
      lCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(rvType).as("__rv")): _*)
    val rAligned = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        lCols.map(c => if (c == key) col(key)
          else lit(null).cast(leftTypes(c)).as(c)) ++
          Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
            struct(rightVals.map(col): _*).as("__rv")): _*)
    // NULL-ts left rows sort first within their key (nulls-first ascending),
    // so no right row precedes them and they fill with the NULL struct;
    // NULL-key left rows partition alone (right side filtered) — same.
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(lCols.map(col) ++
        rightVals.map(v => col("__rv").getField(v).as(v)): _*)
  }

  /** Backward as-of with a staleness tolerance (pandas merge_asof's
    * `tolerance`, which neither Spark nor DuckDB's ASOF has natively): the
    * latest right row at-or-before each left row COUNTS ONLY IF it is at
    * most `tolSeconds` old — a staler match yields NULLs, never "the next
    * one" (a quote too stale is no quote at all; silently matching a
    * week-old price is the bug this exists to prevent). Implemented as a
    * carried-timestamp post-filter over [[asOfBackward]], so it inherits
    * that operator's plan (one exchange, carry-forward window) and its
    * pinned semantics unchanged.
    */
  def asOfBackwardTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tolSeconds: Long): DataFrame = {
    require(tolSeconds >= 0, s"tolerance must be >= 0, got $tolSeconds")
    val tsCarry = "__asof_rts"
    require(!left.columns.contains(tsCarry) && !right.columns.contains(tsCarry),
      s"$tsCarry collides with an input column")
    val joined = asOfBackward(left, right.withColumn(tsCarry, col(rightTs)),
      key, leftTs, rightTs, rightVals :+ tsCarry)
    val fresh = col(tsCarry).isNotNull &&
      unix_micros(col(leftTs)) - unix_micros(col(tsCarry)) <=
        tolSeconds * 1000000L
    rightVals.foldLeft(joined) { (df, v) =>
      df.withColumn(v, when(fresh, col(v))) }
      .drop(tsCarry)
  }

  /** Point-in-interval range join on a shared key: every (point, interval)
    * pair with `start ≤ pt ≤ end`. Intervals are exploded onto the
    * fixed-width time-bin grid they overlap; points land in exactly one
    * bin; the equi-join on (key, bin) finds every candidate pair, and the
    * exact BETWEEN predicate keeps the true ones. Shuffle volume is
    * |points| + Σ⌈span/bin⌉ interval copies, hash-partitioned — never the
    * |L|·|R| nested-loop a raw inequality join plans. Pick `binSeconds`
    * near the typical interval span: shorter bins = more interval copies,
    * longer bins = more false candidates for the filter.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pt: String, start: String, end: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    val binUs = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binUs)
    val p = points.withColumn("__bin", binOf(col(pt)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(start)), binOf(col(end)))))
    p.join(i, Seq(key, "__bin"))
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("__bin")
  }

  /** Interval × interval overlap join on a key: every (left, right) pair
    * whose [start, end] ranges intersect. Same bin-grid reduction as
    * [[pointInInterval]] — both sides explode to their covered bins and
    * equi-join on (key, bin) — plus the CANONICAL-BIN trick: a pair
    * overlapping k bins would surface k times, so instead of a distinct
    * (an extra shuffle of the whole candidate set) the join keeps only
    * the collision in bin max(binOf(lStart), binOf(rStart)), which two
    * overlapping intervals share exactly once (it's ≥ both starts and,
    * when they overlap, ≤ both ends). The exact predicate then removes
    * same-bin false candidates. Shuffle volume is Σ⌈span/bin⌉ copies per
    * side; never |L|·|R|, never a distinct over candidates.
    *
    * Precondition: every interval must satisfy start ≤ end (Spark's
    * `sequence` rejects a descending range) — filter malformed rows first.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0)
    val binUs = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binUs)
    val l = left.withColumn("__bin",
      explode(sequence(binOf(col(lStart)), binOf(col(lEnd)))))
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(rStart)), binOf(col(rEnd)))))
    l.join(r, Seq(key, "__bin"))
      .filter(col("__bin") === greatest(binOf(col(lStart)), binOf(col(rStart))))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin")
  }
}
