package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{Engine, SparkEntry}

/** Regenerates PLANS.md: formatted physical plans of headline queries with
  * scale commentary. Run: sbt "runMain graft.tools.PlanDump"
  */
object PlanDump {
  private val notes = Map(
    "q01_group_agg" -> "Partial+final HashAggregate around one hash exchange = the reference's Combiner, automatic. Decimal sums stay in codegen.",
    "q04_broadcast_hash_join" -> "Dimension side broadcast (no fact shuffle) — the HashJoinExample broadcast variant, chosen automatically by size.",
    "q05_shuffled_hash_join" -> "Both sides hash-partitioned on the key, ShuffledHashJoin per the hint; AQE can still re-plan on runtime stats.",
    "q06_sort_merge_join" -> "Exchange + sort on both sides, SortMergeJoin — the SortMergeJoinExample shape with spill-safe merge.",
    "q12_topk" -> "TakeOrderedAndProject: per-partition top-k then driver merge of k·partitions rows — strictly better than the reference's single-reducer funnel.",
    "q18_filter_project" -> "Predicate reaches the scan (PushedFilters) and ReadSchema carries only 4 of 5 columns — nothing the filter drops is ever decoded.",
    "q19_multijoin_revenue" -> "Six-table join: dims broadcast, facts shuffled once each, join order from Catalyst cost model + AQE.",
    "q31_dedup_minhash_lsh" -> "Narrow md5+native-kernel signature (zero shuffle), explode-by-band, band-key equi-join, distinct, then verify join against the cached shingled corpus.",
    "q33_dedup_ngram_jaccard" -> "Lossless prefix filtering: df aggregation + per-doc (df,s)-ordered prefix, prefix-index self-join with size filter, then the one-pass sorted-merge verify kernel. No Σdf² stop-shingle stage.",
    "q35_ann_cosine_topk" -> "Query set broadcast against the corpus scan (BroadcastNestedLoopJoin over the sampled probes), native cosine kernel, then the bounded TopKByScore aggregate (partial+final ObjectHashAggregate — NO rank window, no whole-group sort).",
    "q56_repetition_signals" -> "Pure narrow map: split + repetition_signals native kernel + project. Zero exchanges.",
    "q57_text_scan" -> "TextInputFormat via the HadoopInput adapter (one partition per split) -> parse -> partial+final aggregate.",
    "q58_csv_scan" -> "CSV file source with explicit schema; scan shows the csv format with the 5-column ReadSchema, then partial+final aggregate.",
    "q61_dedup_corpus" -> "Exact-dedup via partial-min hash aggregate + semi-join (window-free — a hot md5 group costs O(1) combiner state), MinHash-LSH pair generation over survivors, anti-join drop — all distributed, no driver union-find.",
    "q68_asof_join" -> "As-of via union + carry-forward: ONE exchange on the key, per-partition sort, running last-non-null window. No BroadcastNestedLoopJoin anywhere in the plan. Deliberately kept on the composed-rewrite path (vs q82's native AsOfJoinExec): the two queries pin BOTH as-of strategies — the rewrite any Spark user can express, and the custom operator — so a regression in either is caught independently.",
    "q69_range_join" -> "Range join as a (key, time-bin) equi-join over exploded interval bins + exact BETWEEN filter — a hash join, not a nested loop.",
    "q70_domain_cap" -> "Per-domain top-k via the bounded TopKByScore aggregate: partial+final ObjectHashAggregate, |domains|·k shuffle rows, NO Window — a hot domain never funnels through one task's sort.",
    "q71_decontaminate" -> "Benchmark shingles deduped then BroadcastExchange; corpus side is a narrow shingle kernel + BroadcastHashJoin + partial+final count — the raw corpus never shuffles.",
    "q72_token_pack" -> "Per-source running window (hash exchange on source + partition sort), then partial+final aggregate on (source, bin). No global total-order sort.",
    "q74_dedup_incremental" -> "Cross-corpus band-key hash join (batch x existing) for candidates; exact-dup md5 join and the sorted-merge Jaccard verify run only on collisions.",
    "q76_semantic_dedup" -> "IVF-cell assignment via broadcast centroids + bounded top-k aggregate, persisted once, then an in-cell equi self-join with the cosine verify — no cross product, no window.",
    "q77_unpivot" -> "Wide->long melt as ONE narrow Expand (3x row multiplier, no shuffle) with the l_orderkey filter pushed to the scan.",
    "q78_lead_lag" -> "lag/lead deltas: one hash exchange on user_id + per-partition sort feeding a single Window — no global ordering.",
    "q79_quality_cutoff" -> "Per-language p90 cutoff via groupedQuantilesCont: distinct-value counts + per-group running windows (O(1) window state) pick and interpolate the two covering elements — bit-identical to the built-in percentile WITHOUT its buffer-every-value aggregation state; cutoff table broadcasts back into a narrow filter.",
    "q80_doc_chunking" -> "Sliding-window chunking: scan -> narrow split/sequence/explode/slice/md5 — zero exchanges end to end.",
    "q82_asof_native" -> "The custom operator ladder: AsOfJoinExec with requiredChildDistribution/Ordering — one exchange + sort per side, O(|L|+|R|) merge. No window, no nested loop.",
    "q84_duplicate_passages" -> "Native md5_windows kernel (narrow, codegen'd) -> explode of 32-char hashes only -> ONE hash aggregate with partial combine. No window, no self-join; a 10^9-copy boilerplate passage costs O(1) combiner state.",
    "q86_bloom_semi_join" -> "BloomFilterAggregate sketch built as a scalar subquery over the dim side; might_contain probe sits inside the big side's scan stage (WholeStageCodegen), so the semi-join shuffle carries only probable matches. Exact join removes false positives.",
    "q87_merge_upsert" -> "MERGE as updates UNION (base broadcast-anti-join update keys): the base never shuffles — no SortMergeJoin anywhere; the batch's key column is the only broadcast payload.",
    "q93_zorder_key" -> "Pure narrow map: scan -> native z_value16 Morton kernel -> project. Zero exchanges; the layout rewrite (Compaction.zOrderParquet) adds one range shuffle at write time only.",
    "q95_curation_pipeline" -> "Filters feed the exact-dedup partial aggregate, LSH banding runs on survivors only, the domain cap's bounded top-k sees only deduped rows — every stage shrinks the data before the next shuffle.",
    "q91_funnel" -> "Three stage aggregates chained by user_id equi-joins with range predicates — window-free sequence analytics; each stage's input shrinks.",
    "q97_gap_fill" -> "Dense (user, day) grid: the 30-row day dimension broadcasts into a narrow multiplier (the only BroadcastNestedLoopJoin is that 30-row explode), sparse counts partial-aggregate, left join fills zeros.",
    "q100_corpus_report" -> "One grouping-sets pass: single Expand (x3) + partial+final aggregate with exact percentiles — per-lang, per-source and global stats in one scan.",
    "q103_ann_multiprobe" -> "Multi-probe sign-LSH: planes+1 probe rows per QUERY (tiny side) exploded before the bucket equi-join; corpus bucketed once; bounded TopKByScore ranking — no window, no cross product.",
    "q105_semantic_dedup_capped" -> "The production SemDeDup path: exact-collapse hash aggregate, ONE setup count sizes the quantizer, broadcast centroids + bounded top-k assignment, over-cap cells re-quantized via a cell-key hash join, residue salted — the in-cell self-join's pair count is bounded no matter the corpus size or skew.",
    "q106_heavy_hitters" -> "Exact global top-K tokens: explode -> partial+final hash aggregate on token -> TakeOrderedAndProject (each mapper ships at most K rows). No global sort, no window.",
    "q107_weighted_sample" -> "Deterministic weighted Bernoulli sampling: scan -> codegen'd salted-hash threshold filter -> project. Zero exchanges; the decision is content-stable across runs, partitionings and engines.",
    "q108_ewma" -> "EWMA over a BOUNDED 16-row frame: one hash exchange on user_id + partition sort feeding a single Window whose per-row state is 16 doubles — never a whole group in one buffer.",
    "q109_anomaly_zscore" -> "Two passes sharing the user_id exchange: exact-DECIMAL moment aggregate, then join+filter with the z expression in codegen. No window.",
    "q110_cdc_apply" -> "Changelog -> snapshot via single-pass struct-max per key (partial+final, O(1) state): last op wins, deletes filtered after the aggregate. No window, no join.",
    "q111_bigram_transitions" -> "Per-user lead() in key partitions (no global sort), then two partial+final aggregates on bounded keys (|types|² rows) joined for the per-source normalizer.",
    "q112_equidepth_histogram" -> "Equal-frequency histogram WITHOUT ntile-over-global-sort: distinct-value counts, range-partitioned local prefix scans, subtotal cumulation over scanParts rows only (the lone single-task window), integer bucket ids, bucket aggregate.",
    "q113_containment_dedup" -> "Asymmetric containment: df aggregation orders each probe's shingles rarest-first, only probe PREFIXES join the full inverted index (|B| >= t|A| size filter in codegen), then the native sorted-merge verify divides by |A| alone.",
    "q114_incremental_agg" -> "Materialized-view refresh: base and delta partial aggregates union and re-aggregate (sum-of-sums) — the raw base is never rescanned; avg derives from exact DECIMAL partials at the end.",
    "q115_exact_quantiles" -> "Exact global quantiles with NO global sort and NO per-group value buffering: q112's persisted prefix-sum scan + a broadcast join of |probs| rows selecting each rank's covering value.",
    "q116_triangle_count" -> "Triangles on the near-dup graph, DEGREE-ORDERED (round 6): one endpoint-degree aggregate over the undirected edge set, each edge directed from its lower-(degree, id) endpoint, then the same wedge + closure hash joins keyed on (src, dst) + count. Out-degree of every node is bounded by sqrt(2|E|), so the wedge join's fanout can no longer approach |cluster|² on a low-id hub in a dense near-dup cluster (the round-5 id-oriented form's scale flaw). PlanShapeSpec pins that both joins key on the orientation columns and never on the raw id order; the oracle replays the identical orientation.",
    "q117_grouped_quantiles" -> "Per-group exact quantiles: distinct-value counts through per-group running windows (O(1) state, groups in parallel) + the |probs|-row broadcast rank join — never a buffered value array per group.",
    "q118_decontaminate_containment" -> "Cross-corpus containment: eval-probe prefixes (rarest-first) join the train corpus's full inverted index with the |C| >= t|A| codegen'd filter; exact sorted-merge verify divides by |probe| only. Round 7: the probe side carries explicit broadcast hints end to end (smallProbe contract), so every join is a BroadcastHashJoin and the corpus index/arrays NEVER shuffle — pinned in PlanShapeSpec. Catches eval items pasted inside long pages that overlap-share detectors miss.",
    "q119_lang_drift" -> "KL(source || corpus) from three bounded-key aggregates + broadcast joins; the divergence folds lang-sorted (deterministic float order), one round at the end — the raw corpus is scanned once (counts persisted).",
    "q120_source_overlap" -> "Distinct (source, opening-fingerprint) aggregate persisted once, digest self-join with source< ordering, pair aggregate — the raw text never joins; output bounded by the source-pair triangle.",
    "q121_approx_heavy_hitters" -> "The Misra-Gries guarantee on the gate: the one-pass O(k)-state sketch (ObjectHashAggregate partial+final) left-joins the exact token counts; output rows are the guaranteed-heavy tokens with the bound check — deterministic iff the MG bounds hold, which is exactly what the pure-SQL oracle's hash equality asserts.",
    "q122_pagerank" -> "Fixed-point PageRank: per iteration ONE hash join (edges x ranks on source id) + ONE partial+final BIGINT-sum aggregate on destination id — O(|E|) shuffle rows of two longs, integer sums are order-independent so ranks are bit-identical in any engine and across any partitioning.",
    "q124_corr_matrix" -> "Every moment (n, Sx, Sxx, Sxy for all pairs) in ONE partial+final aggregate over ONE scan; exact DECIMAL sums (2-dp inputs, 4-dp products) make the matrix bit-reproducible; the pair combine + explode runs on a single row.",
    "q126_winsorized_stats" -> "Exact [p01,p99] cutoffs from the persisted prefix-sum scan pivot to ONE broadcast row; the clamp is a pure narrow projection feeding per-flag DECIMAL moment aggregates — two scans total, no global sort.",
    "q127_bigram_pmi" -> "Bigrams via a narrow transform over the word array (no self-join), vocab-sized count aggregates, two hash joins to attach unigram counts, 1-row broadcasts for the normalizers, TakeOrderedAndProject top-k.",
    "q130_lm_quality_score" -> "Corpus-fit char-bigram LM: model = two vocab-sized aggregates; per-doc cross-entropy joins doc-distinct bigram counts against the model, then folds each doc's terms in sorted order (deterministic double sum, array bounded by the doc's <=500 distinct bigrams).",
    "q131_fuzzy_dedup_editdist" -> "PassJoin edit-distance self-join: identical keys collapse first (exact-before-fuzzy), every string emits its k+1 segments (index) and O(k^2) geometry-matched substrings (probe); ONE equi-join on (len, segment-index, segment), codegen'd levenshtein only on collisions; both-sides-short pairs (bounded |alphabet|^k set) go through a direct broadcast path. Lossless by the PassJoin pigeonhole, spec-pinned against brute force on curated AND seeded-random fixtures.",
    "q132_bootstrap_ci" -> "One-pass Poisson bootstrap: R resamples as 2R O(1)-state agg expressions in ONE partial+final aggregate over ONE scan (pinned: the only Generate sits ABOVE the aggregate); hash-drawn integer weights + exact cent sums make every mean bit-reproducible.",
    "q135_cluster_representatives" -> "Representative per near-dup cluster: the CC label pipeline (LSH pairs -> hybrid min-label/alt-star) feeds ONE struct-max aggregate keyed by component — no window, no extra wide join (pinned); a 10^9-member boilerplate cluster costs its combiner one struct.",
    "q137_grouped_regression" -> "Per-group OLS: five cent-scaled integer moments in one partial+final aggregate; slope/intercept/r2 derive on the aggregated rows from exact numbers — bit-reproducible where built-in regr_slope's double partial-sum order is not.",
    "q139_percentile_rank" -> "Quantile-normalization map: distinct-value counts -> range-partitioned local prefix scans -> subtotal cumulation over scanParts rows (the lone single-task window) -> mid-rank percentile per distinct value. The raw table is never globally sorted; rejoining the map is a plain hash join.",
    "q142_tfidf_cosine_pairs" -> "Lexical similarity: bigram tf-idf weights, per-doc top-K truncation by (weight, term) total order (the stop-term guard — common terms never enter the inverted index), term equi-join, per-pair sorted-fold dot products. No cross product; candidates bounded by K * df over rare terms only.",
    "q144_grouped_weighted_quantiles" -> "Per-source token-mass percentiles: per-group distinct-value WEIGHT sums through per-group running windows (O(1) state, groups in parallel) + the |probs|-row broadcast rank join — a source's cost is its distinct value count, never its row count.",
    "q145_ann_stored_index" -> "Stored IVF probe: query batch scored against the TINY stored centroids (broadcast, bounded top-k), then the cell-partitioned inverted lists join the broadcast probes — the lists scan's PartitionFilters carry a dynamicpruning expression, so only probed cell DIRECTORIES are opened. Probe cost proportional to the batch; pinned in PlanShapeSpec.",
    "q146_ann_index_append" -> "Incremental ANN ingestion probe: identical probe plan to q145 over a build+append index — the batch was assigned against the FROZEN stored centroids and appended to the cell partitions, so ingestion cost is proportional to the batch and the probe plan (and result — q44's oracle) is unchanged.",
    "q147_approx_quantile_guarantee" -> "GK sketch on the gate: percentile_approx (ONE pass, O(A log n) state) produces the probe values; exact rank counts come from one conditional aggregate over a broadcast of the 4 probe rows; the rank-band check is exact long arithmetic. Deterministic iff the sketch honors its n/A guarantee — which is what the pure-SQL TRUE oracle's hash equality asserts.",
    "q148_novelty_attribution" -> "First-owner election per shingle (hash aggregate, partial min) + ONE equi-join of the exploded shingles against the owner table + per-doc conditional count — all integer/string, AQE-splittable on hot shingles; no float determinism surface anywhere.",
    "q149_kcore_exact" -> "Exact k-core fixpoint: the plan below is the FINAL degree aggregate over the converged edge set's localCheckpoint — by design. Each peel round ran as its own round-sized job (degree agg + two semi-joins + one scalar convergence count) with lineage truncated per round; a single unrolled plan would replay rounds 1..N-1 inside round N.",
    "q150_robust_profile" -> "Shared-scan robust profile: ONE persisted distinct-value prefix-sum scan feeds every rank selection (quantile array, winsorize cutoffs, MAD median); the raw values take only the clamp-moments pass, the |v-med| deviation scan, and the outlier count. 1-row frames broadcast between stages; no global sort, no value buffering.",
    "q151_semantic_dedup_multicell" -> "Top-2-cell semantic dedup: assignment via broadcast centroids + bounded top-2 aggregate (persisted once), then the same in-cell equi self-join + cosine verify as q76 — candidate rows 2x, pair bound 4x, still no cross product and no window; the distinct'ed drop set absorbs pairs colliding in both shared cells.",
    "q152_bm25_retrieval" -> "BM25 more-like-this: the tiny query-term frame (seeds x 3 bigrams, with df attached) BROADCASTS into one pass over the persisted tf table — only rows matching a query term are ever scored (cost Σ df(query term), not corpus size); dl rides on each tf row so no corpus-wide length join exists; per-(seed, doc) sorted-fold aggregate then the bounded TopKByScore top-k (|Q|·k shuffle rows, no rank window).",
    "q153_sorted_neighborhood_dedup" -> "Multi-pass sorted-neighborhood blocking: per pass, range partition + per-partition rank scan (distributed scan — no global-order window; the one WindowExec runs over the |partitions|-row offsets table), then ONE equi-join on overlapping rank blocks bounding candidates at N·(window−1) by construction; union of both passes' pairs, distinct, sorted-merge Jaccard verify against the cached shingled corpus.",
    "q154_bm25_stored_index" -> "Stored-BM25-index probe: the broadcast query frame joins the bucket-partitioned posting lists on (bucket, term) — the lists scan carries dynamicpruningexpression(bucket...), so only the probed buckets are read (pinned); df derives from the pruned postings, stats from the summed summary rows, then the shared scoring core (sorted fold + bounded TopKByScore).",
    "q156_bpe_vocab_induction" -> "BPE trainer: the plan below is the final LocalTableScan of the learned merge table — by design. The corpus was touched ONCE (word-frequency hash aggregate with partial combine, its own job), and each merge round ran as a vocab-sized job (pair explode + hash agg + one-row argmax + codegen'd greedy fold, lineage truncated per round via localCheckpoint) — a single unrolled plan would replay rounds 1..N-1 inside round N.",
    "q157_bpe_tokenize" -> "BPE apply: the vocab side (distinct words -> 8 chained codegen'd merge folds -> token counts) joins the exploded corpus words, then one per-doc hash aggregate. The merge chain is narrow projections over the distinct-word aggregate — every word tokenized once, zero shuffles in the chain.",
    "q158_hybrid_retrieval" -> "RRF fusion: the BM25 and cosine branches end in their bounded TopKByScore aggregates (k rows per seed each), the fusion is a full-outer SortMergeJoin/BroadcastHashJoin of those two tiny lists + one more bounded top-k — the fusion stage costs nothing at any scale; the branches carry their own pinned plans.",
    "q159_recursive_reachability" -> "WITH RECURSIVE (Spark 4 surface): UnionLoop iterates the hop-bounded frontier join against the cached edge view — each level is one join of the (tiny) frontier, the depth predicate caps the level count, and the final hash aggregate collapses revisits via min(hops). Unbounded closure stays with q62's operator.",
    "q160_bag_set_ops" -> "exceptAll/intersectAll: Catalyst rewrites both to ONE hash aggregate over per-side tagged counts + a generate replicating each key max(0, diff)/min(l, r) times — no join, one exchange, multiplicity exact.",
    "q161_expectations" -> "Data-quality gate: per table, every rule is an aggregate expression over ONE scan (the uniqueness rule's count-distinct rides the same aggregate via Expand); the rule rows derive from the single aggregated row by an inline explode — no second job, no per-rule pass.",
    "q162_golden_record" -> "Survivorship: the cluster frame persists once, then every field rule is a partial+final struct-min/max HashAggregate (longest-text argmax, lexicographic-first source) — no window over clusters; the modal language adds one (comp, lang) count aggregate before its struct-min. A mass-dup mega-cluster costs O(1) combiner state per rule.",
    "q187_label_propagation" -> "Label propagation, fixed rounds: per round ONE hash join (directed edges x labeled nodes) + a (dst, label) count aggregate + the single-pass struct-max plurality — O(|E|) shuffle rows of three longs per round, no window; the edge frame persists once and is read every round.",
    "q188_pipeline_e2e" -> "End-to-end pipeline: the plan below is the final packing stage over the LAST stage boundary's localCheckpoint — by design. Each of the five upstream stages (repetition, perplexity, dedup, DSIR, mixture) ran as its own audited job with lineage truncated at the boundary; one unrolled plan would multiply the operators' internal input references exponentially (measured: a 2 GB plan string).",
    "q191_pack_manifest" -> "Packed-sequence manifest: the distributed prefix scan (range partition + per-partition sequential fold, eagerly localCheckpointed to pin partition identity) + the broadcast offsets join + ONE narrow span explode — ≤ ⌈n/B⌉+1 rows per doc, no second shuffle, no window over unbounded groups.",
    "q192_ppl_partition" -> "CCNet head/middle/tail: the bounded LM broadcasts into per-(doc,bigram) scoring (one explode + partial agg), per-source tercile boundaries come from ONE exact-percentile aggregate (2 doubles per source) and broadcast back into a narrow CASE — no per-group sort, every join a broadcast.",
    "q193_centroid_map" -> "Group-centroid similarity: ONE posexplode + partial-aggregated (group x dim) integer-sum shuffle (map-side combine caps each partition at the cell count), the |groups|-row centroid table broadcasts into its own pair cross — no exchange ever carries a raw embedding array (pinned).",
    "q194_contrastive_batches" -> "Leakage-safe batches: the q62 clustering feeds one left join onto the id set, a rank window PARTITIONED BY CLUSTER (bounded by the largest near-dup cluster — small post-exact-dedup), and a narrow hash+mod batch assignment; unseparable overflow is flagged, never silent.",
    "q195_countmin" -> "CountMin on the gate: the token stream persists once, the sketch is ONE explode (d rows each) + a partial+final integer aggregate bounded at d·w cells per partition, estimates join the broadcast sketch and min-aggregate per key — linear sums, no window, fully oracle-replayable.",
    "q200_js_divergence" -> "Lexical JSD map: one token explode feeds the bounded-vocab TakeOrdered, per-group totals and per-(group, term) counts; the zero-filled grid is |groups|·(V+1) rows, the pair table joins per term then folds per pair over a sorted bounded array — corpus scanned once, everything downstream broadcast-scale.",
    "q201_cdc_dedup" -> "Content-defined chunking: boundary election + chunk slicing happen INSIDE one narrow map per document (transform/filter/slice over the word array — no per-word join, no window); the only exchanges are the chunk-hash first-owner aggregate and its ownership join back.")

  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 8, appName = "plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.tools.PlanDump` at `$dir`. These are the plans\n")
    sb.append("the engine is designed around; `PlanShapeSpec` pins the invariants.\n")
    for ((name, note) <- notes.toSeq.sortBy(_._1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      // keep the tree + the scan/exchange detail lines; full dump is huge
      val (tree, detail) = plan.span(_ != '(')
      sb.append(tree.trim).append("\n\n")
      detail.linesIterator
        .filter(l => l.matches("\\(\\d+\\) .*") || l.startsWith("PushedFilters") ||
          l.startsWith("ReadSchema") || l.startsWith("Arguments: hashpartitioning") ||
          l.startsWith("Functions "))
        .foreach(l => sb.append(l).append('\n'))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plandump] wrote PLANS.md (${notes.size} queries)")
    spark.stop()
  }
}
