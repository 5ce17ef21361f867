package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert shapes, expressed as declarative joins so Catalyst owns
  * the physical strategy.
  *
  * Reference analogue: Tez pipelines rewrite outputs wholesale (MROutput
  * commits a fresh directory); there is no keyed-update operator. Any
  * warehouse-shaped user of the engine needs one, so it is part of the
  * additive surface.
  *
  * 100 TB posture: upsert is `updates ∪ (base ⋉̸ update-keys)` — an
  * anti-join on the KEY COLUMN ONLY plus a union. Unlike the textbook
  * full-outer-join-and-coalesce form (which can never broadcast — Spark
  * has no broadcast full-outer — so both sides always shuffle), the
  * anti-join broadcasts the batch's key set when the batch is small,
  * which is the production case: the 100 TB base is never shuffled at
  * all, and the union is a zero-cost plan node. For a batch past the
  * broadcast threshold, AQE falls back to a shuffled anti-join on the
  * key — still the minimum possible movement.
  */
object Merge {

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`
    * wholesale; unmatched update rows are inserted; all other base rows
    * pass through. Both inputs must carry identical schemas; `key` must
    * be unique per side (a duplicate-key batch is a data bug better
    * surfaced upstream than resolved arbitrarily here).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    updates.unionByName(
      base.join(updates.select(col(key)), Seq(key), "left_anti"))
  }

  /** SCD-2 style: like [[upsert]] but keeps the superseded base row tagged
    * `is_current = false` instead of dropping it (updated keys emit two
    * rows; inserts and untouched rows emit one, `is_current = true`).
    */
  def upsertHistory(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    // single-shot by contract: applied to its own prior output, withColumn
    // would silently overwrite is_current and re-flag historical rows as
    // current. To iterate, filter the previous output to is_current rows
    // and drop the flag before calling again.
    require(!base.columns.contains("is_current") &&
      !updates.columns.contains("is_current"),
      "upsertHistory inputs must not already carry is_current; " +
        "filter a prior output to is_current=true and drop the column first")
    val current = upsert(base, updates, key).withColumn("is_current", lit(true))
    val superseded = base.join(updates.select(col(key)), Seq(key), "left_semi")
      .withColumn("is_current", lit(false))
    current.unionByName(superseded)
  }
}
