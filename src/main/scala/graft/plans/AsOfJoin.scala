package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Backward AS-OF join as a first-class Catalyst operator — the full
  * custom-operator ladder (logical node → planner strategy → physical
  * exec) registered through `SparkSessionExtensions`, for the one join
  * shape Spark's built-in operators cannot express without either a
  * BroadcastNestedLoop (`l.ts >= r.ts` inequality join) or the
  * union/carry-forward rewrite in
  * [[graft.operators.TemporalJoins.asOfBackward]].
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN` (and the reference's strict
  * equi-key join matrix extended with a temporal predicate): for every
  * left row, attach the single right row with the greatest `rightTs`
  * ≤ `leftTs` on the same key; nulls when no prior right row exists.
  * NULL keys and NULL timestamps never match (join-predicate semantics).
  *
  * Scale shape: both sides hash-clustered on the key and sorted by
  * (key, ts) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans exactly one
  * exchange + sort per side (reusing any compatible existing layout,
  * e.g. bucketed tables) — then a single forward merge pass per
  * partition: O(|L|+|R|) with O(1) state, never |L|·|R|. This is the
  * plan a dedicated temporal engine would pick, expressed as a native
  * Spark physical operator.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {

  // The merge exec reads BOTH sides' key/ts fields through the LEFT side's
  // data types; a mismatch (e.g. right ts as raw long vs left timestamp)
  // would silently reinterpret bytes instead of failing analysis. Catch it
  // at construction, like the analyzer's implicit-cast check would.
  require(leftKey.dataType.sql == rightKey.dataType.sql,
    s"as-of key types differ: left ${leftKey.dataType.sql} vs right " +
      s"${rightKey.dataType.sql} — cast one side before joining")
  require(leftTs.dataType.sql == rightTs.dataType.sql,
    s"as-of timestamp types differ: left ${leftTs.dataType.sql} vs right " +
      s"${rightTs.dataType.sql} — cast one side before joining")

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical merge as-of join. Children arrive co-partitioned on the key
  * and sorted by (key, ts); one buffered forward scan of the right side
  * per partition serves every left row in order.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && rKeyIdx >= 0 && lTsIdx >= 0 && rTsIdx >= 0,
      "as-of key/ts attributes must come from the respective child")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val rValIdx = rightVals.map(v => rOut.indexWhere(_.exprId == v.exprId)).toArray
    val nVals = rValIdx.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
        val keyRowL = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val keyRowR = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val tsRowL = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val tsRowR = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val matchVals = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nVals)
        val nullVals = InternalRow.fromSeq(Seq.fill(nVals)(null))
        val joined = new JoinedRow
        val toUnsafe = GenerateUnsafeProjection.generate(
          outputAttrs.map(a => org.apache.spark.sql.catalyst.expressions.BoundReference(
            (lOut ++ rightVals).indexWhere(_.exprId == a.exprId), a.dataType, a.nullable)))

        val rBuf = rIter.buffered
        // Latest consumed right row's key (boxed value) + projected vals;
        // valid only while the current left key equals matchKeyRow.
        var haveMatch = false
        val matchKeyRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

        def rightKeyVal(r: InternalRow): Any = r.get(rKeyIdx, keyType)
        def cmpKeys(a: InternalRow, b: InternalRow): Int = keyOrd.compare(a, b)

        lIter.map { l =>
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)) {
            // NULL key / NULL ts never matches (predicate semantics).
            joined(l, nullVals)
          } else {
            keyRowL.update(0, l.get(lKeyIdx, keyType))
            tsRowL.update(0, l.get(lTsIdx, tsType))
            // Advance right: drop rows with smaller key (or null key/ts),
            // consume equal-key rows with ts <= left ts, remembering last.
            var advance = true
            while (advance && rBuf.hasNext) {
              val r = rBuf.head
              if (r.isNullAt(rKeyIdx) || r.isNullAt(rTsIdx)) {
                rBuf.next()
              } else {
                keyRowR.update(0, rightKeyVal(r))
                val kc = cmpKeys(keyRowR, keyRowL)
                if (kc < 0) {
                  rBuf.next()
                } else if (kc == 0) {
                  tsRowR.update(0, r.get(rTsIdx, tsType))
                  if (tsOrd.compare(tsRowR, tsRowL) <= 0) {
                    var i = 0
                    while (i < nVals) {
                      matchVals.update(i, InternalRow.copyValue(
                        if (r.isNullAt(rValIdx(i))) null
                        else r.get(rValIdx(i), rightVals(i).dataType)))
                      i += 1
                    }
                    matchKeyRow.update(0, InternalRow.copyValue(rightKeyVal(r)))
                    haveMatch = true
                    rBuf.next()
                  } else advance = false
                } else advance = false
              }
            }
            val matched = haveMatch && cmpKeys(matchKeyRow, keyRowL) == 0
            joined(l, if (matched) matchVals else nullVals)
          }
        }.map(toUnsafe)
    }
  }
}

/** Planner rule: place [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.GraftFunctionExtensions]]) and idempotently added to live
  * sessions through `experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (`Rule[LogicalPlan]` — the last rung of the custom-
  * operator ladder): push left-side filters through [[AsOfJoinNode]].
  *
  * Catalyst's built-in `PushPredicateThroughJoin` only understands its own
  * join node, so without this rule a `result.filter(left_col = x)` above
  * an as-of join shuffles, sorts and merges the FULL inputs and filters
  * last. The as-of join emits every left row exactly once (left-outer
  * contract), so any deterministic predicate over left columns commutes
  * with the join exactly; pushing it below the node lets the standard
  * rules carry it all the way into the parquet scan (`PushedFilters`) and
  * shrinks the exchange+sort. Predicates touching right-side output
  * columns stay above (their values depend on the match).
  */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    // column pruning: a Project above the node keeps only some left
    // columns — narrow the left child to (referenced ∪ key ∪ ts) so the
    // scan never decodes the dropped columns. The node's output derives
    // from its children, so the copy() shrinks it automatically; reaches
    // a fixed point once nothing more can be dropped.
    case p @ Project(projList, j: AsOfJoinNode) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.leftTs))
      val keptLeft = j.left.output.filter(needed.contains)
      if (keptLeft.size == j.left.output.size) p
      else p.copy(child = j.copy(left = Project(keptLeft, j.left)))
  }
}

object AsOfJoin {

  /** Backward as-of join through the native operator. Contract:
    * `rightVals` names must not collide with left column names (enforced),
    * right rows must be unique per (key, rightTs), and key/ts types must
    * match across sides (enforced — the merge reads both sides through the
    * left types, so a silent mismatch would reinterpret bytes).
    *
    * NULL semantics are join-predicate semantics: a NULL key or NULL ts on
    * either side never matches, and a matched right row's values are taken
    * row-atomically (NULL vals stay NULL — never back-filled from an older
    * right row). [[graft.operators.TemporalJoins.asOfBackward]] implements
    * the same contract via the union/carry-forward rewrite; the randomized
    * agreement test in AsOfJoinSpec draws NULL keys, timestamps and vals.
    */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val dup = rightVals.diff(rightVals.distinct).distinct
    require(dup.isEmpty, s"duplicate rightVals names: ${dup.mkString(", ")}")
    val clash = rightVals.filter(left.columns.contains)
    require(clash.isEmpty,
      s"rightVals collide with left columns: ${clash.mkString(", ")} — " +
        "alias the right-side value columns before joining")
    val spark = left.sparkSession
    ColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    ColumnBridge.addOptimizerRule(spark, AsOfJoinFilterPushdown)
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so its expr-ids are disjoint from the
    // left's even when both derive from the same base relation (the
    // analyzer's relation dedup never sees this pre-resolved plan).
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)
    def attrOf(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      attrOf(lPlan.output, key), attrOf(rOut, key),
      attrOf(lPlan.output, leftTs), attrOf(rOut, rightTs),
      rightVals.map(attrOf(rOut, _)))
    ColumnBridge.ofRows(spark, node)
  }

  /** Forward as-of join (nearest right row at-or-AFTER each left ts) for
    * timestamp keys, by running [[asOfNative]] on negated epoch-micros:
    * backward's "max rts' ≤ ts'" under negation is exactly "min rts ≥ ts".
    * Same contract and NULL semantics as [[asOfNative]]; costs the same
    * one exchange + sort per side and two narrow column maps.
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    require(!left.columns.contains("__fwd_ts") && !right.columns.contains("__fwd_rts"),
      "__fwd_ts/__fwd_rts are reserved by asOfForward")
    val l = left.withColumn("__fwd_ts",
      org.apache.spark.sql.functions.expr(s"-unix_micros($leftTs)"))
    val r = right.withColumn("__fwd_rts",
      org.apache.spark.sql.functions.expr(s"-unix_micros($rightTs)"))
    asOfNative(l, r, key, "__fwd_ts", "__fwd_rts", rightVals).drop("__fwd_ts")
  }
}
