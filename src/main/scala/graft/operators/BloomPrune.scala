package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, NamedExpression, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{ColumnBridge => CB}

/** Explicit runtime Bloom-filter join pruning.
  *
  * The 100 TB problem this solves: a semi/inner join whose big side is the
  * corpus shuffles EVERY big-side row to its join partition, even though
  * only a small fraction match the dim-side keys. Building a Bloom filter
  * over the small side (one distributed partial+merge aggregate producing a
  * fixed-size sketch) and probing it on the big side BEFORE the shuffle
  * turns "shuffle 100 TB" into "shuffle the survivors" — the same idea as
  * Spark's own `InjectRuntimeFilter`, made explicit and deterministic here
  * so the pruning is guaranteed rather than cost-model-dependent (Spark only
  * injects when creation-side stats pass thresholds; this operator is the
  * planner-independent form).
  *
  * Mechanics: the sketch is built by Catalyst's native
  * [[BloomFilterAggregate]] over `xxhash64(key)` and delivered to the probe
  * side as a scalar subquery — exactly the plan shape `InjectRuntimeFilter`
  * produces — so the probe predicate ([[BloomFilterMightContain]]) is
  * codegen'd and sits inside the scan's WholeStageCodegen span. No driver
  * collect: the sketch travels executor→executor via the subquery broadcast.
  *
  * The Bloom probe admits false positives, so it is always followed by the
  * exact join; results are therefore identical to the unpruned join (the
  * identity is pinned in BloomPruneSpec and, on the driver gate, by q86's
  * plain-SQL oracle).
  *
  * Reference analogue: Tez has no runtime filtering — a reduce-side join
  * shuffles the full big side (`tez-examples/.../JoinDataGen.java` shapes).
  * This operator is part of the "beyond the reference" scale surface.
  */
object BloomPrune {

  /** `big ⋉ small` (left semi) with a Bloom pre-filter on `big(bigKey)`.
    *
    * @param expectedItems sizing hint for the sketch (distinct small-side
    *   keys); the default 4M keys ≈ 4.7 MB sketch at the default FPP — a
    *   per-executor constant, independent of big-side size.
    */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 4000000L): DataFrame = {
    require(!big.columns.contains("__bp_key"), "__bp_key is reserved by semiJoin")
    val pruned = prune(big, bigKey, small, smallKey, expectedItems)
    val dim = small.select(col(smallKey).as("__bp_key"))
    pruned.join(dim, col(bigKey) === col("__bp_key"), "left_semi")
  }

  /** Just the probe stage: `big` filtered to rows whose `bigKey` *might* be
    * in `small(smallKey)` (superset of the exact match set). Compose with
    * any exact join downstream.
    */
  def prune(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 4000000L): DataFrame = {
    val build = small
      .select(CB.column(new BloomFilterAggregate(
          XxHash64(Seq(CB.expression(small(smallKey))), 42L), expectedItems)
        .toAggregateExpression()).as("bf"))
      .queryExecution.analyzed
    val probe = CB.column(BloomFilterMightContain(
      ScalarSubquery(build, Seq.empty, NamedExpression.newExprId, Seq.empty,
        None, None, None),
      XxHash64(Seq(CB.expression(big(bigKey))), 42L)))
    big.where(probe)
  }
}
