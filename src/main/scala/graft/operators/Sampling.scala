package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset assembly ops for training pipelines: deterministic splits and
  * skew-safe joins. The reference has no notion of either (its unit of
  * routing is the hash-partitioned edge); these are LLM-pipeline
  * extensions in the spirit of SURVEY.md §7.2 step 6.
  */
object Sampling {

  /** Deterministic train/val/test assignment by content-stable hash:
    * bucket = first-28-md5-bits(id) mod 100, then range-mapped by the
    * cumulative weights. Properties that matter at 100 TB: stable under
    * re-partitioning, re-runs, and engine changes (md5 is engine-neutral —
    * the DuckDB oracle reproduces the exact assignment); adding data never
    * reassigns existing rows (per-row hash, no global count involved);
    * zero shuffle (pure narrow map).
    *
    * `weights` are integer percents summing to ≤ 100, e.g.
    * ("train",80),("val",10),("test",10).
    */
  def hashSplit(df: DataFrame, id: Column, weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum <= 100 && weights.nonEmpty, "weights are percents")
    val bucket = pmod(Dedup.SharedHash.hash28(id.cast("string")), lit(100))
    val cum = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.map(_._1).zip(cum).foldRight(lit(weights.last._1)) {
      case ((name, hi), els) => when(bucket < hi, name).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** SQL twin of [[hashSplit]]'s assignment for the oracle. */
  def hashSplitSql(idExpr: String, weights: Seq[(String, Int)]): String = {
    val bucket = s"(${Dedup.SharedHash.hash28Sql(s"CAST($idExpr AS VARCHAR)")} % 100)"
    val cum = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val cases = weights.map(_._1).zip(cum)
      .map { case (name, hi) => s"WHEN $bucket < $hi THEN '$name'" }.mkString(" ")
    s"CASE $cases ELSE '${weights.last._1}' END"
  }

  /** Weighted mixture sampling: keep each row with a per-source percentage
    * (the corpus-mixing step of a pre-train run: 100% of curated sources,
    * 10% of the raw crawl). Same engineering properties as [[hashSplit]]:
    * content-stable md5 bucket per row → deterministic across engines,
    * re-runs and repartitioning; zero shuffle (narrow filter); growing a
    * source never flips decisions for existing rows.
    *
    * `rates` maps source → keep-percent (0..100); unlisted sources use
    * `defaultRate`.
    */
  def mixtureSample(df: DataFrame, id: Column, source: Column,
      rates: Seq[(String, Int)], defaultRate: Int): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 100))
    val bucket = pmod(Dedup.SharedHash.hash28(id.cast("string")), lit(100))
    val rate = rates.foldRight(lit(defaultRate)) { case ((s, r), els) =>
      when(source === s, r).otherwise(els)
    }
    df.filter(bucket < rate)
  }

  /** SQL twin of [[mixtureSample]]'s keep predicate for the oracle. */
  def mixtureSampleSql(idExpr: String, sourceExpr: String,
      rates: Seq[(String, Int)], defaultRate: Int): String = {
    val bucket = s"(${Dedup.SharedHash.hash28Sql(s"CAST($idExpr AS VARCHAR)")} % 100)"
    val cases = rates.map { case (s, r) => s"WHEN $sourceExpr = '$s' THEN $r" }
      .mkString(" ")
    s"$bucket < (CASE $cases ELSE $defaultRate END)"
  }

  /** Salted equi-join for skewed keys — the manual fallback when AQE's
    * runtime skew splitting can't help (e.g. the skew is in a broadcast-
    * ineligible dimension or a non-AQE sink pins the plan). The big side
    * scatters each row into one of `salt` sub-keys; the small side is
    * replicated `salt` ways; the join key becomes (key, salt), so a hot
    * key's rows spread over `salt` reducers instead of one. Output rows
    * are IDENTICAL to the plain equi-join (pinned by SkewJoinSpec).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // any per-row spread works; id-hash is deterministic across retries
    val b = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Poisson(1) inverse-CDF thresholds over a [0, 10000) hash bucket:
    * P(W=w) ≈ e⁻¹/w! truncated at 7. Shared by the Scala and SQL sides
    * so both engines draw the identical weight for every (row, replicate).
    */
  private[operators] val PoissonCdf10k = Seq(3679, 7358, 9197, 9810, 9963, 9994, 9999)

  /** One-pass deterministic Poisson bootstrap of a mean: `replicates`
    * resamples of `df` where each row enters replicate r with weight
    * W ~ Poisson(1), drawn from a content-stable hash of (r, id) — the
    * standard streaming-bootstrap construction (per-row independent
    * weights instead of an exact-n resample, which is what makes ONE
    * pass possible). Returns (replicate, n_eff, mean); the spread of the
    * means IS the sampling distribution — percentiles of these rows give
    * the confidence interval with no second pass over the data.
    *
    * 100 TB posture: NO explode — all `replicates` weighted sums land in
    * ONE partial+final aggregate over ONE scan (2·R agg expressions of
    * O(1) state); the per-replicate melt happens on the single result
    * row. Determinism: weights are integers from md5 (engine-neutral),
    * value sums run in exact integer cents (DECIMAL(38,0) — the q124
    * fast path), so every engine computes the identical means.
    * `inputDecimals` bounds `value`'s fractional digits (cents scaling
    * must be exact).
    */
  def bootstrapMeans(df: DataFrame, id: Column, value: Column,
      replicates: Int, inputDecimals: Int = 2): DataFrame = {
    require(replicates >= 2)
    val scale = math.pow(10, inputDecimals)
    def w(r: Int): Column = {
      val h = pmod(Dedup.SharedHash.hash28(
        concat(lit(s"bs$r:"), id.cast("string"))), lit(10000))
      PoissonCdf10k.zipWithIndex.foldRight(lit(7): Column) {
        case ((t, i), els) => when(h < t, lit(i)).otherwise(els)
      }
    }
    val cents = round(value * scale, 0).cast("long")
    val aggs = (0 until replicates).flatMap { r =>
      Seq(sum(w(r)).cast("long").as(s"__n_$r"),
        sum((w(r) * cents)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as(s"__s_$r"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val slots = (0 until replicates).map { r =>
      struct(lit(r).as("replicate"), col(s"__n_$r").as("n_eff"),
        round(col(s"__s_$r") / col(s"__n_$r") / lit(scale), 4).as("mean"))
    }
    wide.select(explode(array(slots: _*)).as("p")).select(col("p.*"))
  }

  /** SQL twin of one replicate's Poisson weight for the oracle. */
  def bootstrapWeightSql(idExpr: String, r: Int): String = {
    val h = s"(${Dedup.SharedHash.hash28Sql(s"'bs$r:' || CAST($idExpr AS VARCHAR)")} % 10000)"
    val cases = PoissonCdf10k.zipWithIndex
      .map { case (t, i) => s"WHEN $h < $t THEN $i" }.mkString(" ")
    s"(CASE $cases ELSE 7 END)"
  }

  /** Leakage-free train/val/test split: the [[hashSplit]] assignment keyed
    * on the NEAR-DUP CLUSTER label instead of the row id, so every member
    * of a duplicate cluster lands on the same side — the split any
    * train/eval protocol actually needs (a per-row split leaks train
    * near-duplicates into the eval set, inflating every metric; see the
    * decontamination literature, e.g. Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better", public paper).
    *
    * `labels` is (id, comp) — e.g. [[Dedup.connectedComponents]] over
    * MinHash-LSH pairs, comp = min member id. Unlabeled rows are their own
    * singleton cluster (coalesce to id). Same engineering properties as
    * [[hashSplit]]: content-stable md5-of-comp bucket → deterministic
    * across engines/re-runs/repartitioning, and the assignment is a pure
    * function of comp, so "no cluster straddles splits" holds BY
    * CONSTRUCTION — no verification join needed. Cost on top of the
    * clustering itself: one equi-join (labels ⋈ rows) + a narrow map.
    */
  def leakageFreeSplit(df: DataFrame, id: Column, labels: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    val lab = labels.select(col("id").as("__lid"), col("comp").as("__comp"))
    val joined = df.withColumn("__id", id)
      .join(lab, col("__id") === col("__lid"), "left")
      .withColumn("cluster", coalesce(col("__comp"), col("__id")))
      .drop("__lid", "__comp", "__id")
    hashSplit(joined, col("cluster"), weights)
  }

  /** Leakage-safe CONTRASTIVE batch composition — in-batch-negative
    * training (DPR/CLIP-style) treats every other example in a batch as
    * a negative, so two near-duplicates sharing a batch become FALSE
    * negatives (the within-batch twin of [[leakageFreeSplit]]'s
    * train/eval leak). Each row gets a deterministic batch id such that
    * no two members of the same near-dup cluster share one, as long as
    * the cluster fits: rank r within the cluster (by id), batch =
    * (hash(cluster) + r) mod nBatches — the hash offset spreads each
    * cluster's members over a DIFFERENT batch window so small clusters
    * don't all collide on batches 0..m. A cluster larger than nBatches
    * cannot be fully separated by ANY assignment (pigeonhole); its
    * overflow rows (r ≥ nBatches) report `safe = false` so the caller
    * can drop or re-shard them — fail-visible, never silent.
    *
    * 100 TB posture: one left join onto the cluster labels + a
    * rank window PARTITIONED BY CLUSTER — bounded by the largest
    * cluster, which post-dedup pipelines keep small by construction
    * (the mass-dup cluster was collapsed by exact dedup upstream); the
    * batch arithmetic is a narrow map.
    *
    * @param labels (id, comp) cluster assignment, e.g.
    *               [[Dedup.connectedComponents]]; unlabeled rows are
    *               singleton clusters of themselves
    * @return (id, cluster, batch, safe)
    */
  def contrastiveBatches(df: DataFrame, id: Column, labels: DataFrame,
      nBatches: Int): DataFrame = {
    require(nBatches >= 1)
    val lab = labels.select(col("id").as("__lid"), col("comp").as("__comp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("id"))
    df.select(id.cast("long").as("id"))
      .join(lab, col("id") === col("__lid"), "left")
      .select(col("id"), coalesce(col("__comp"), col("id")).as("cluster"))
      .withColumn("__r", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("cluster"),
        pmod(Dedup.SharedHash.hash28(col("cluster").cast("string"))
          + col("__r"), lit(nBatches.toLong)).as("batch"),
        (col("__r") < nBatches).as("safe"))
  }
}
