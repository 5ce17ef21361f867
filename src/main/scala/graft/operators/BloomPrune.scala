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

  /** `big ▷ small` (left anti) with a Bloom short-circuit: a Bloom "no" is
    * definitive, so rows whose key is definitely NOT in the small side keep
    * WITHOUT touching the join — only the "might match" sliver (true
    * matches + the few-percent false positives) goes through the exact
    * anti-join. Two complementary narrow filters over the scan (a filter
    * is cheap; the join shuffle is what's expensive) — at 100 TB this is
    * the decontamination/blocklist shape: the join-side volume shrinks
    * from |corpus| to |hits + ε|. NULL keys never match a join predicate,
    * so they are always kept, matching plain anti-join semantics (the
    * bloom branch handles this: xxhash64(NULL) is NULL and
    * might_contain(NULL) is NULL → NOT NULL is not true → NULL-key rows
    * route to the exact anti-join, which keeps them).
    *
    * DOUBLE-EVALUATION CAVEAT: the two branches each evaluate `big`
    * (definite-no scan ∪ might-match scan). Over a parquet scan this is
    * the right trade — two cheap codegen'd scans beat one full shuffle —
    * but over an EXPENSIVE UPSTREAM PIPELINE it doubles that pipeline's
    * cost. For such inputs pass `persistBig = true` (persists `big`
    * MEMORY_AND_DISK so the upstream runs once; both branches then read
    * the cached blocks — the persist is registered with
    * [[graft.CacheScope]], so `CacheScope.drain()` after materializing
    * the result releases it; `spark.catalog.clearCache()` works too), or
    * persist `big` yourself before calling.
    */
  def antiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 4000000L,
      persistBig: Boolean = false): DataFrame = {
    require(!big.columns.contains("__bp_key"), "__bp_key is reserved by antiJoin")
    val b = if (persistBig)
      graft.CacheScope.register(
        big.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else big
    val probe = probeColumn(b, bigKey, small, smallKey, expectedItems)
    val definiteKeep = b.where(!probe) // bloom "no" — exact by definition
    val dim = small.select(col(smallKey).as("__bp_key"))
    definiteKeep.unionByName(
      b.where(probe.isNull || probe)
        .join(dim, col(bigKey) === col("__bp_key"), "left_anti"))
  }

  /** Just the probe stage: `big` filtered to rows whose `bigKey` *might* be
    * in `small(smallKey)` (superset of the exact match set). Compose with
    * any exact join downstream.
    */
  def prune(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 4000000L): DataFrame =
    big.where(probeColumn(big, bigKey, small, smallKey, expectedItems))

  /** The raw `might_contain(<sketch subquery>, xxhash64(bigKey))` column —
    * three-valued: true (maybe present), false (definitely absent), null
    * (NULL key). Exposed so both the semi (keep true) and anti (keep
    * false, join the rest) shapes reuse one build.
    */
  def probeColumn(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 4000000L)
      : org.apache.spark.sql.Column = {
    val build = small
      .select(CB.column(new BloomFilterAggregate(
          XxHash64(Seq(CB.expression(small(smallKey))), 42L), expectedItems)
        .toAggregateExpression()).as("bf"))
      .queryExecution.analyzed
    CB.column(BloomFilterMightContain(
      ScalarSubquery(build, Seq.empty, NamedExpression.newExprId, Seq.empty,
        None, None, None),
      XxHash64(Seq(CB.expression(big(bigKey))), 42L)))
  }
}
