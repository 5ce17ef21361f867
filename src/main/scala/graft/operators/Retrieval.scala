package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist

/** Ranked text retrieval over a term-frequency corpus: Okapi BM25 scoring
  * with bounded per-query top-k.
  *
  * The reference has no retrieval capability (its text surface ends at
  * tokenize/sort/count, tez-examples/.../WordCount.java:140-195); this is an
  * LLM-pipeline extension of SURVEY.md §7.2 step 6 — the "find documents
  * like these seeds" primitive behind targeted corpus expansion and
  * contamination triage.
  *
  * Scale design: the query side (a handful of (q_id, term) rows) is
  * broadcast; candidate generation is ONE broadcast-semi pass over the tf
  * table, so only rows whose term appears in some query are ever scored —
  * cost is Σ df(query term), never corpus size. Per-document length (dl)
  * rides on each tf row (denormalized by the caller at tokenize time), so
  * no corpus-wide dl join exists. Corpus statistics (doc count, total
  * length) reduce to ONE row via partial aggregation. The final top-k is
  * the bounded [[graft.functions.TopKByScore]] aggregate: O(k) state per
  * query at every stage, shuffle volume |Q|·k.
  *
  * Determinism: per-(query, doc) scores fold their per-term contributions
  * in sorted term order (the q119 discipline), every float input is a pure
  * function of exact integer counts, and scores round to 4 decimals before
  * ranking — the DuckDB oracle replays the identical arithmetic.
  */
object Retrieval {

  /** BM25 top-k per query.
    *
    * @param terms   corpus term frequencies: (id: long, term: string,
    *                tf: long, dl: long) — dl is the document's total token
    *                count, constant across a document's rows
    * @param queries query bags: (q_id: long, term: string), small
    * @param k       results per query
    * @param k1      BM25 term-frequency saturation (default 1.2)
    * @param b       BM25 length normalization (default 0.75)
    * @param excludeSelf drop candidates whose id equals the query's q_id
    *                (more-like-this retrieval, where queries ARE documents)
    * @return (q_id, doc_id, score, rnk) — rnk 1-based by (score desc, id)
    */
  def bm25TopK(terms: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    val tf = terms.persistScoped() // feeds dfs, corpus stats and scoring
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.groupBy(col("id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val qd = queries.join(dfs, "term") // query terms with corpus df — tiny
    val base = tf.join(broadcast(qd), "term").crossJoin(broadcast(stats))
    val cand = if (excludeSelf) base.filter(col("id") =!= col("q_id")) else base
    val avgdl = col("tot_dl").cast("double") / col("n_docs").cast("double")
    // idf: ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative Robertson
    // form; all operands derive from exact integer counts
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    cand
      .select(col("q_id"), col("id"), col("term"), contrib.as("c"))
      .groupBy(col("q_id"), col("id"))
      .agg(sort_array(collect_list(struct(col("term").as("t"), col("c"))))
        .as("cs"))
      .select(col("q_id"), col("id"),
        round(expr("aggregate(cs, 0D, (a, x) -> a + x.c)"), 4).as("score"))
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("score"), col("id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("doc_id"),
        col("s.score").as("score"), (col("pos") + 1).cast("long").as("rnk"))
  }
}
