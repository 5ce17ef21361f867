package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist

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
    require(k > 0)
    cumCounts(df, value, scanParts)
      .withColumn("bucket", expr(s"CAST((__cum * $k) DIV __n AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        sum(col("__c")).as("cnt"))
  }

  /** Exact quantiles at arbitrary probabilities WITHOUT a global sort and
    * WITHOUT collecting per-group value arrays (Spark's built-in exact
    * `percentile` buffers every value of a group in one aggregation
    * buffer — an executor-OOM at corpus scale). Same distributed scan as
    * [[equiDepth]]; each probability then selects the unique distinct
    * value whose cumulative range covers rank ⌈p·n⌉ via a broadcast join
    * of |probs| rows. Lower-nearest (type-1 / "disc") quantile semantics:
    * the returned value is an element of the data.
    */
  def exactQuantiles(df: DataFrame, value: Column, probs: Seq[Double],
      scanParts: Int = 32): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    quantilesFromCum(cumCounts(df, value, scanParts), probs)
  }

  /** Rank selection over an already-built [[cumCounts]] frame — split out
    * so [[robustProfile]] can select many probability sets from ONE scan.
    */
  private def quantilesFromCum(cum: DataFrame, probs: Seq[Double]): DataFrame = {
    val spark = cum.sparkSession
    import spark.implicits._
    cum.join(broadcast(probs.toDF("prob")),
        col("__cum") < rankOf(col("prob"), col("__n")) &&
          rankOf(col("prob"), col("__n")) <= col("__cum") + col("__c"))
      .select(col("prob"), col("__v").as("value"))
  }

  /** Interpolated (type-7) per-group quantiles — the SAME values as
    * Spark's exact `percentile` / DuckDB's `quantile_cont`, WITHOUT
    * buffering every group value in one aggregation buffer (`percentile`
    * holds the whole group; a billion-row group is an executor OOM). The
    * distinct-value running-window machinery of [[groupedQuantiles]]
    * selects the two covering elements of h = p·(n−1) (0-indexed) and
    * interpolates v_lo + (h−⌊h⌋)·(v_hi−v_lo) — exactly the built-in's
    * formula, pinned value-identical in ProfilingSpec. Use this as the
    * drop-in scale path wherever `percentile(col, p)` appears per group.
    */
  def groupedQuantilesCont(df: DataFrame, grp: Column, value: Column,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val cum = groupedCumCounts(df, grp, value)
    val ps = broadcast(probs.toDF("prob"))
    // 0-indexed position h; the element at position k is the distinct
    // value with __cum <= k < __cum + __c. No FP slack here: the oracle
    // replays the identical double expression, and at near-integral h the
    // interpolation weight collapses to ~0/~1 — continuous, not a cliff.
    val h = col("prob") * (col("__n") - 1)
    def covering(k: Column): Column = col("__cum") <= k && k < col("__cum") + col("__c")
    // ONE join tags each covering row lo and/or hi (≤ 2 rows per
    // (group, prob)); a conditional aggregate folds them — the cum
    // pipeline runs once, no self-join of two re-derivations
    val h2 = col("prob") * (col("__n") - 1)
    cum.join(ps,
        covering(floor(h).cast("long")) || covering(ceil(h).cast("long")))
      .groupBy(col("group"), col("prob"))
      .agg(
        max(when(covering(floor(h2).cast("long")), col("__v"))).as("__vlo"),
        max(when(covering(ceil(h2).cast("long")), col("__v"))).as("__vhi"),
        max(col("__n")).as("__n"))
      .select(col("group"), col("prob"), {
        // Spark Percentile.getPercentile's exact arithmetic shape —
        // (higher−pos)·vlo + (pos−lower)·vhi — INCLUDING both
        // short-circuits: integral position AND lowerKey == higherKey
        // (without the latter, ties spanning both covering positions
        // interpolate (1−f)·v + f·v, which is off by 1 ulp for
        // non-integral v — the built-in returns v exactly)
        val hh = col("prob") * (col("__n") - 1)
        when(floor(hh) === ceil(hh) || col("__vlo") === col("__vhi"),
          col("__vlo"))
          .otherwise((ceil(hh) - hh) * col("__vlo")
            + (hh - floor(hh)) * col("__vhi")).as("value")
      })
  }

  /** Target rank ⌈p·n⌉ with the FP-ceil guard: p·n that is mathematically
    * integral can land just ABOVE the integer in doubles (0.07·100 =
    * 7.000000000000001), and a raw ceil would then return rank+1 — the
    * wrong element. The 1e-6 slack (same guard as
    * Dedup.ngramJaccardPairsPrefix's prefix length) absorbs it; fractional
    * parts below 1e-6 cannot arise from meaningful probabilities. Clamped
    * to ≥ 1 so a vanishing p·n (p ≤ 1e-6/n) returns the minimum instead
    * of silently matching no row.
    */
  private def rankOf(prob: Column, n: Column): Column =
    greatest(lit(1L), ceil(prob * n - lit(1e-6)).cast("long"))

  /** Per-GROUP exact quantiles without per-group value buffering.
    * Spark's exact `percentile` holds every value of a group in one
    * aggregation buffer; here a group's state is its DISTINCT-value
    * counts flowing through a per-group running window (O(1) window
    * state, groups processed in parallel). Right when there are many
    * groups of moderate distinct-value cardinality — for ONE giant group
    * use [[exactQuantiles]], whose distributed scan has no per-group
    * funnel. Type-1 (lower-nearest) semantics, as [[exactQuantiles]].
    */
  def groupedQuantiles(df: DataFrame, grp: Column, value: Column,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val cum = groupedCumCounts(df, grp, value)
    cum.join(broadcast(probs.toDF("prob")),
        col("__cum") < rankOf(col("prob"), col("__n")) &&
          rankOf(col("prob"), col("__n")) <= col("__cum") + col("__c"))
      .select(col("group"), col("prob"), col("__v").as("value"))
  }

  /** Per-GROUP weighted quantiles — [[groupedQuantiles]] over the weight
    * measure of [[weightedQuantiles]] (the q117 × q138 composition): for
    * each group, the value at the smallest rank whose cumulative WEIGHT
    * within the group reaches p·W_group (type-1 semantics). This is the
    * number mixture packing actually reads per source: "the p50 document
    * length BY TOKEN MASS, per source" — each source's token budget is
    * spent per token, so its packing percentiles must be token-weighted,
    * and sources differ enough that the global q138 number misleads.
    * Weights must be non-negative integers (exact cumulative sums).
    * Scale shape is exactly [[groupedQuantiles]]'s: the window state is
    * O(1) per group, groups in parallel, never a buffered value array.
    */
  def groupedWeightedQuantiles(df: DataFrame, grp: Column, value: Column,
      weight: Column, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val cum = groupedCumWeights(df, grp, value, weight)
    cum.join(broadcast(probs.toDF("prob")),
        col("__cum") < rankOf(col("prob"), col("__n")) &&
          rankOf(col("prob"), col("__n")) <= col("__cum") + col("__c"))
      .select(col("group"), col("prob"), col("__v").as("value"))
  }

  /** Per-group distinct-value counts with the exclusive per-group prefix
    * sum `__cum` and group total `__n` — the shared scaffolding of the
    * grouped quantile forms. All-deterministic (hash partition by group +
    * windows), so unlike [[cumCounts]] no persist is needed.
    */
  private def groupedCumCounts(df: DataFrame, grp: Column,
      value: Column): DataFrame =
    groupedCumWeights(df, grp, value, lit(1L))

  /** [[groupedCumCounts]] over an integer weight measure: per-group
    * distinct-value WEIGHT sums with the exclusive per-group prefix sum
    * and group total.
    */
  private def groupedCumWeights(df: DataFrame, grp: Column,
      value: Column, weight: Column): DataFrame = {
    val counts = df
      .select(grp.as("group"), value.cast("double").as("__v"),
        weight.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull && col("__w") >= 0)
      .groupBy(col("group"), col("__v")).agg(sum(col("__w")).as("__c"))
    val run = Window.partitionBy(col("group")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy(col("group"))
    counts
      .withColumn("__cum", coalesce(sum(col("__c")).over(run), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(tot))
  }

  /** Distinct-value counts with the exclusive global prefix sum `__cum`
    * and grand total `__n` — steps 1–2 of the scalable profiling ops.
    *
    * The returned frame is persisted (correctness — see the inline
    * comment) and registered with [[graft.CacheScope]]: callers that
    * profile many columns in one long-lived session run
    * `CacheScope.drain()` once the derived output is materialized (the
    * same contract as `BloomPrune.antiJoin(persistBig = true)`; Bench and
    * Verify drain after every query).
    */
  private def cumCounts(df: DataFrame, value: Column,
      scanParts: Int): DataFrame =
    cumWeights(df, value, lit(1L), scanParts)

  /** Per-column data-quality profile — the schema-drift / null-rate scan
    * every ingestion pipeline runs before trusting a new drop: one row
    * per profiled column with row count, null count, exact distinct
    * count, and min/max (numeric columns surface them as doubles,
    * string columns as strings — typed slots, so no cross-engine number
    * formatting ever enters the compare).
    *
    * ONE aggregate over ONE scan: Catalyst plans the multi-column
    * count(DISTINCT …) via a single Expand (×|cols| row multiplier)
    * feeding partial+final aggregates — the standard exact plan; the
    * row-multiplier is the price of exactness (the cheap alternative is
    * approx_count_distinct, one pass, no Expand). The 1-row wide result
    * is then melted to per-column rows by a narrow explode of literal
    * structs — the melt happens on ONE row, never on the data.
    */
  def columnProfile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require((numericCols ++ stringCols).nonEmpty)
    val aggs = numericCols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))
    } ++ stringCols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).as(s"__ms_$c"),
        max(col(c)).as(s"__xs_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val slots = numericCols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ stringCols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"__ms_$c").as("min_str"), col(s"__xs_$c").as("max_str"))
    }
    wide.select(explode(array(slots: _*)).as("p")).select(col("p.*"))
  }

  /** Pairwise Pearson correlation matrix over fixed-decimal numeric
    * columns — the feature-redundancy scan run before fitting anything on
    * tabular data. Returns the upper triangle (col_a < col_b) with
    * `corr` rounded to 4 digits.
    *
    * ONE partial+final aggregate over ONE scan computes every moment
    * (n, Σx, Σx², Σxy); the |cols|² combine happens on a single row.
    * Cross-engine determinism: Pearson correlation is invariant under
    * linear rescaling of each variable, so every value is first scaled
    * to an exact INTEGER (×10^inputDecimals — "cents"; inputs carry at
    * most `inputDecimals` fractional digits, so the round() is exact)
    * and the moments are exact integer sums in DECIMAL(38,0) — order-
    * independent, no rescale needed downstream. The integer route
    * matters for speed too: a double→DECIMAL(38,s) cast goes through a
    * per-row string-based BigDecimal conversion (measured 3.3 s for this
    * matrix at sf0.1), while long→decimal stays on the compact-long fast
    * path (~6×  faster, same exactness). Spark's built-in `corr`
    * aggregates in doubles — correct statistically, but its partial-sum
    * order would make a hash-compare oracle flaky; integer moments make
    * the matrix exactly reproducible. Capacity: the SUM side (DECIMAL 38,0)
    * holds 1e14-cent products × 1e12 rows = 1e26 with room to spare, but
    * the PER-ROW product is computed in LONG for the compact-long fast
    * path, so the binding ceiling is |cents| ≤ ⌊√(2⁶³−1)⌋ ≈ 3.037e9
    * per value (|value| ≤ ~3e7 at inputDecimals = 2). That bound is
    * ENFORCED, not assumed: the same single aggregate also computes each
    * column's max |cents|, and any pair whose per-row product could have
    * overflowed raises an error instead of returning a silently wrong
    * corr. Callers with wider-magnitude columns should pre-scale (corr is
    * invariant under per-column linear rescaling, so dividing a huge
    * column by 10^k first changes nothing).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      inputDecimals: Int = 2): DataFrame = {
    require(cols.size >= 2)
    // ⌊√(2⁶³−1)⌋: if both factors' |cents| stay ≤ this, the long product
    // cannot overflow (3037000500² > 2⁶³−1)
    val MaxSafeCents = 3037000499L
    def cents(c: String): Column = round(col(c) * math.pow(10, inputDecimals), 0)
      .cast("long").as(s"__c_$c")
    def dsum(c: Column): Column =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("double")
    val scaled = df.select(cols.map(cents): _*)
    val moments =
      cols.map(c => dsum(col(s"__c_$c")).as(s"__s_$c")) ++
        cols.map(c => dsum(col(s"__c_$c") * col(s"__c_$c")).as(s"__ss_$c")) ++
        cols.map(c => max(abs(col(s"__c_$c"))).as(s"__ma_$c")) ++
        cols.combinations(2).toSeq.map { case Seq(a, b) =>
          dsum(col(s"__c_$a") * col(s"__c_$b")).as(s"__sp_${a}_$b") }
    val wide = scaled.agg(count(lit(1)).as("__n"), moments: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      val n = col("__n").cast("double")
      val cov = n * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      val va = n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val vb = n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      val safe = greatest(col(s"__ma_$a"), col(s"__ma_$b")) <= lit(MaxSafeCents)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(safe, round(cov / sqrt(va) / sqrt(vb), 4))
          .otherwise(raise_error(lit(
            s"corrMatrix: |${a}*${b}| cents exceed the long product range — " +
              "pre-scale the wide column (corr is rescale-invariant)")))
          .as("corr"))
    }
    wide.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }

  /** Exact WEIGHTED quantiles: the value at the smallest rank whose
    * cumulative WEIGHT reaches p·W (type-1 semantics over the weight
    * measure). The classic use is token-weighted document-length
    * percentiles — "the p50 document BY TOKEN MASS", which differs from
    * the row-count p50 whenever length and weight correlate (always, for
    * corpora). Same distributed prefix-sum scan as [[exactQuantiles]]
    * with `sum(weight)` in place of `count(*)`; weights must be
    * non-negative integers (exact cumulative sums — fractional weights
    * should be pre-scaled to a fixed grid).
    */
  def weightedQuantiles(df: DataFrame, value: Column, weight: Column,
      probs: Seq[Double], scanParts: Int = 32): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val cum = cumWeights(df, value, weight, scanParts)
    cum.join(broadcast(probs.toDF("prob")),
        col("__cum") < rankOf(col("prob"), col("__n")) &&
          rankOf(col("prob"), col("__n")) <= col("__cum") + col("__c"))
      .select(col("prob"), col("__v").as("value"))
  }

  /** Percentile-rank transform: every distinct value mapped to its
    * mid-rank percentile (cum_before + multiplicity/2) / n — the
    * quantile-normalization / rank-feature step of tabular ML
    * preprocessing. One pass over the distinct-value scan; joining the
    * result back to the raw rows is a broadcast or shuffle join on the
    * value, so the raw table is never globally sorted.
    */
  def percentileRank(df: DataFrame, value: Column,
      scanParts: Int = 32): DataFrame =
    cumCounts(df, value, scanParts)
      .select(col("__v").as("value"),
        ((col("__cum").cast("double") + col("__c").cast("double") / 2)
          / col("__n")).as("pct_rank"))

  /** [[cumCounts]] over an integer weight measure instead of row counts:
    * distinct-value WEIGHT sums with the exclusive prefix sum and grand
    * total. Shares the persist-for-correctness contract.
    */
  private def cumWeights(df: DataFrame, value: Column, weight: Column,
      scanParts: Int): DataFrame = {
    require(scanParts > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: RangePartitioner's boundary sampling is its own job over
    // the exchange's child, so unpersisted the aggregate's final stage
    // runs twice per call (sampling + shuffle map) — guide §1.2
    val counts = df
      .select(value.cast("double").as("__v"), weight.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull && col("__w") >= 0)
      .groupBy(col("__v")).agg(sum(col("__w")).as("__c"))
      .persistScoped()
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
      // persist is CORRECTNESS here, not just cost: three consumers read
      // this frame (rows, per-partition subtotals, grand total), and an
      // unpersisted plan evaluates the repartitionByRange three times —
      // RangePartitioner samples boundaries with an RDD-id-dependent seed,
      // so independent evaluations can place a value in DIFFERENT
      // partitions, misaligning __local against the offsets computed by
      // the other branch (reproduced at sf0.01: per-partition-local cums)
      .persistScoped()
    val w = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subtotals = local.groupBy(col("__pid")).agg(sum(col("__c")).as("__ptot"))
    val n = subtotals.agg(sum(col("__ptot")).as("__n"))
    val offsets = subtotals
      .withColumn("__off", coalesce(sum(col("__ptot")).over(w), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("__pid"), col("__off"), col("__n"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__cum", col("__local") + col("__off"))
      .select(col("__v"), col("__c"), col("__cum"), col("__n"))
  }

  /** `value` winsorized (clamped) to its own exact [pLo, pHi] quantiles —
    * the outlier-trim step before moment statistics on heavy-tailed
    * data. The cutoffs come from [[exactQuantiles]] (distributed
    * prefix-sum scan — no global sort, no value buffering), pivot to ONE
    * row, and broadcast back onto a narrow clamp projection: at 100 TB
    * the second pass is a pure scan. Returns `df` plus `outCol`.
    */
  def winsorize(df: DataFrame, value: Column, pLo: Double, pHi: Double,
      outCol: String): DataFrame = {
    require(pLo < pHi)
    val cuts = exactQuantiles(df, value, Seq(pLo, pHi))
      .agg(
        min(when(col("prob") === pLo, col("value"))).as("__lo"),
        max(when(col("prob") === pHi, col("value"))).as("__hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(outCol, least(greatest(value, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Shared-scan robust profile of one numeric column: exact quantiles,
    * winsorized moments, and the MAD outlier screen — everything q115 +
    * q126 + q136 compute — derived from ONE distinct-value prefix-sum
    * scan instead of three. Run separately, each of those re-derives its
    * own [[cumCounts]] of the SAME column (the scan dominates their
    * cost); here one persisted cum frame feeds every rank selection
    * (quantiles at `probs`, the pLo/pHi winsorize cutoffs, the MAD
    * median), and the raw values take only the irreducible extra passes —
    * one clamp-and-moments aggregate, one |v − med| deviation scan (a
    * DIFFERENT value set, so it needs its own small scan), one outlier
    * count. Output is ONE row: `quantiles` as a prob-sorted
    * array<struct<prob,value>> plus n_rows / w_mean / w_std (winsorized,
    * exact-DECIMAL moments — `inputDecimals` is the value grid, as
    * [[corrMatrix]]) / med / mad / n_outliers (|v − med| > madK·MAD;
    * 4.4478 = 3·1.4826 ≈ 3σ under normality).
    *
    * 100 TB posture: identical per-pass shape to the individual
    * operators — no global sort, no value buffering, 1-row broadcasts
    * between stages; this entry point only removes the repeated scans.
    */
  def robustProfile(df: DataFrame, value: Column, probs: Seq[Double],
      pLo: Double = 0.01, pHi: Double = 0.99, madK: Double = 4.4478,
      inputDecimals: Int = 2, scanParts: Int = 32): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    require(pLo < pHi)
    import org.apache.spark.sql.types.DecimalType
    // three raw passes read this frame (clamp moments, deviations,
    // outlier count) — persist, or each re-runs the upstream plan
    val vdf = df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull).persistScoped()
    val qs = quantilesFromCum(cumCounts(vdf, col("__v"), scanParts),
        (probs ++ Seq(pLo, pHi, 0.5)).distinct)
      .persistScoped() // |probs|+3 rows; feeds the quantile array + cuts
    val quantRow = qs.filter(col("prob").isin(probs: _*))
      .agg(array_sort(collect_list(struct(col("prob"), col("value"))))
        .as("quantiles"))
    val cuts = qs.agg(
      min(when(col("prob") === pLo, col("value"))).as("__lo"),
      max(when(col("prob") === pHi, col("value"))).as("__hi"),
      min(when(col("prob") === 0.5, col("value"))).as("med"))
    // exact moments on the integer grid (the corrMatrix discipline): the
    // winsorized values sit on the 10^-inputDecimals grid, so ×10^d is an
    // exact integer and the sums run on the compact-long→decimal fast
    // path — the per-row double→DECIMAL(38,s) cast goes through a
    // string-based BigDecimal conversion (measured 2.5× slower for this
    // pass at sf0.1). One exact decimal division + ONE double rounding at
    // the end is bit-identical to the old decimal-cast sums (both round
    // the same exact rational once). Like corrMatrix, the long-product
    // range is ENFORCED: |cents| > ⌊√(2⁶³−1)⌋ raises instead of silently
    // overflowing the per-row square.
    val MaxSafeCents = 3037000499L
    val grid = math.pow(10, inputDecimals)
    val centsCol = round(col("w") * grid, 0).cast("long")
    val moments = vdf.crossJoin(broadcast(cuts))
      .select(least(greatest(col("__v"), col("__lo")), col("__hi")).as("w"),
        col("med"))
      .select(centsCol.as("__c"), col("med"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__c").cast(DecimalType(38, 0))).as("__sc"),
        sum((col("__c") * col("__c")).cast(DecimalType(38, 0))).as("__ssc"),
        max(abs(col("__c"))).as("__ma"),
        min(col("med")).as("med"))
      .select(col("n_rows"),
        when(col("__ma") <= MaxSafeCents,
          (col("__sc") / lit(grid.toLong)).cast("double"))
          .otherwise(raise_error(lit(
            "robustProfile: |value| exceeds the long-cents product range — " +
              "pre-scale the column (moments are grid-exact)")))
          .as("__s"),
        (col("__ssc") / lit((grid * grid).toLong)).cast("double").as("__ss"),
        col("med"))
      .select(col("n_rows"),
        round(col("__s") / col("n_rows"), 4).as("w_mean"),
        round(sqrt((col("__ss") - col("__s") * col("__s") / col("n_rows"))
          / (col("n_rows") - 1)), 4).as("w_std"),
        col("med"))
      .persistScoped() // 1 row; med feeds the deviation scan twice
    val dev = vdf.crossJoin(broadcast(moments.select(col("med").as("__m"))))
      .select(abs(col("__v") - col("__m")).as("__ad"))
    val mad1 = quantilesFromCum(cumCounts(dev, col("__ad"), scanParts), Seq(0.5))
      .agg(min(col("value")).as("mad")).persistScoped()
    val outliers = dev.crossJoin(broadcast(mad1))
      .agg(sum(when(col("__ad") > lit(madK) * col("mad"), 1L).otherwise(0L))
        .as("n_outliers"), min(col("mad")).as("mad"))
    quantRow.crossJoin(moments).crossJoin(outliers)
      .select(col("quantiles"), col("n_rows"), col("w_mean"), col("w_std"),
        col("med"), col("mad"), col("n_outliers"))
  }
}
