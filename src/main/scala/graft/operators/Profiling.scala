package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Numeric profiling beyond fixed-width binning: exact equal-frequency
  * (equi-depth) histograms, computed distributed.
  *
  * Reference analogue: none — Tez ships no profiling operators (its
  * examples stop at wordcount-style aggregates, e.g.
  * tez-examples/src/main/java/org/apache/tez/examples/WordCount.java);
  * this is part of the engine's additive analytics surface beside q104's
  * equi-width form.
  */
object Profiling {

  /** Exact equi-depth histogram: `k` buckets of (near-)equal row count
    * over `value`'s global order, returned as one row per bucket with
    * exact bounds and counts.
    *
    * The naive form — `ntile(k) OVER (ORDER BY value)` — funnels the
    * ENTIRE table through one task (a global window has one partition):
    * the classic scale-killer. This implementation never materializes a
    * global sort of raw rows:
    *
    *  1. distinct-value counts: one partial+final hash aggregate
    *     (|distinct| rows survive, typically ≪ |rows|);
    *  2. exclusive prefix sum over value order via the distributed scan
    *     (same shape as Curation.packBinsScalable): range-partition the
    *     distinct values, one sequential local pass per partition, then
    *     cumulate ONE subtotal per partition — the only single-task
    *     window runs over `scanParts` rows;
    *  3. bucket = ⌊cum_before · k / n⌋ in exact integer arithmetic, then
    *     a partial+final aggregate on the bucket key.
    *
    * Every distinct value lands in exactly one bucket (standard
    * equi-depth semantics: a value's full multiplicity stays together,
    * so buckets deviate from n/k only by value multiplicity). The output
    * is a deterministic function of the value multiset — partition-count
    * independent, pinned by ProfilingSpec.
    */
  def equiDepth(df: DataFrame, value: Column, k: Int,
      scanParts: Int = 32): DataFrame = {
    require(k > 0 && scanParts > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val local = counts
      .repartitionByRange(scanParts, col("__v"))
      .sortWithinPartitions(col("__v"))
      .as[(Double, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var run = 0L
        it.map { case (v, c) => val excl = run; run += c; (v, c, pid, excl) }
      }
      .toDF("__v", "__c", "__pid", "__local")
    // per-partition subtotals: scanParts rows — the only single-task
    // window in the plan runs here
    val w = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subtotals = local.groupBy(col("__pid")).agg(sum(col("__c")).as("__ptot"))
    val n = subtotals.agg(sum(col("__ptot")).as("__n"))
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__ptot")).over(w), lit(0L)))
      .crossJoin(broadcast(n)) // 1 row onto scanParts rows
      .select(col("__pid"), col("__off"), col("__n"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("bucket", expr(s"CAST(((__local + __off) * $k) DIV __n AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        sum(col("__c")).as("cnt"))
  }
}
