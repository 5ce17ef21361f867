package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
  * variant as the scale path. LLM-pipeline extension (SURVEY.md §7.2 step 6);
  * the reference has no vector capability.
  *
  * All vector math is codegen'd higher-order functions (`zip_with` +
  * `aggregate`) over the array column — no UDF, no driver collection.
  * Floats are cast to double before multiply; products of two 24-bit floats
  * are exact in double and summation is sequential left-to-right, so any
  * engine doing the same produces bit-identical scores (the DuckDB oracle
  * casts to DOUBLE[] and uses its native list kernels).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double via
    * the native kernel (graft.functions.CosineFExpr) — bit-identical to the
    * composable `aggregate(zip_with(...))` fold (same sequential order,
    * same float→double widening) but one codegen'd call instead of
    * interpreted per-element lambdas.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.cosine_f(a, b)

  /** Per-query top-k via the bounded [[graft.functions.TopKByScore]]
    * aggregate — identical rows to
    * `row_number().over(partitionBy(q_id).orderBy(desc(score), asc(id)))
    * .filter(rnk <= k)` but with O(k) state per query through partial+final
    * aggregation: the map side reduces each partition to k structs per
    * query before the exchange, so shuffle volume is |Q|·k instead of the
    * window's all-scored-rows shuffle (which also funnels each query's
    * entire score set through one task's sort).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("score"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("vec_id"), col("s.score").as("score"),
        (col("pos") + 1).cast("long").as("rnk"))

  /** Exact top-k neighbors for each query vector (brute force): broadcast
    * the (small) query set against the full corpus, rank per query.
    * This is the correctness baseline; cost is |Q|·|corpus| narrow work with
    * one k-bounded aggregation — fine for |Q| ≪ |corpus|, which is
    * the training-pipeline shape (probe set vs 100 TB corpus).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // queries: q_id, q_vec; corpus: vec_id, embedding
    val scored = corpus
      .join(broadcast(queries), col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, k)
  }

  /** Number of random hyperplanes (signature bits) for LSH bucketing. */
  val LshPlanes = 12

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * w(j)(d) = (((j·dim+d)·2654435761) mod 2001 − 1000) / 1000 — an
    * engine-neutral formula the DuckDB oracle reproduces exactly.
    */
  def planeComponent(j: Int, d: Int, dim: Int): Double =
    ((((j.toLong * dim + d) * 2654435761L) % 2001L) - 1000L) / 1000.0

  /** Sign-LSH bucket id (`planes` bits) of an embedding column — native
    * kernel (graft.functions.LshBucketExpr) computing [[planeComponent]]
    * inline; `dim` is taken from the array itself.
    */
  def lshBucket(emb: Column, dim: Int, planes: Int = LshPlanes): Column =
    graft.functions.lsh_bucket(emb, planes)

  /** Approximate top-k: rank only within the query's LSH bucket. The
    * bucket equi-join replaces the cross product — at 100 TB this is one
    * hash-partitioned join on bucket id (AQE handles bucket skew) instead
    * of |Q|·|corpus| comparisons.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      planes: Int = LshPlanes): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col("q_vec"), dim, planes))
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), dim, planes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k — the second scale path besides
    * sign-LSH. Coarse quantizer: the first `nCells` corpus vectors serve as
    * deterministic centroids (training-free IVF flavor — no k-means RNG, so
    * the oracle can reproduce cell assignment exactly). Every vector is
    * assigned to its max-cosine cell (narrow |corpus|·nCells pass against
    * broadcast centroids); a query probes its `nProbe` best cells and ranks
    * only those inverted lists. At 100 TB: assignment is a broadcast-join
    * map, probing is a cell-key equi-join — no cross product anywhere.
    */
  /** Deterministic training-free coarse quantizer: the first `nCells`
    * corpus vectors are the centroids (no k-means RNG, so the oracle can
    * reproduce cell assignment exactly).
    */
  private def centroidsOf(corpus: DataFrame, nCells: Int): DataFrame =
    corpus.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  /** Assign each row to its `n` max-cosine cells. Ranks nCells candidates
    * per vector with the bounded top-k aggregate: the map side collapses
    * to n structs per vector before the exchange (vs shuffling all
    * |df|·nCells scored rows into a per-vector window sort). first(vec) is
    * well-defined — every row of a group carries the same vector.
    */
  private def bestCells(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, n: Int): DataFrame =
    df.join(broadcast(cents), lit(true))
      .withColumn("cscore", round(cosine(col(vecCol), col("cvec")), 4))
      .groupBy(col(idCol))
      .agg(
        graft.functions.topk_by_score(col("cscore"), col("cent_id"), n).as("top"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol), explode(col("top.id")).as("cell"))

  def ivfTopK(queries: DataFrame, corpus: DataFrame, nCells: Int, nProbe: Int,
      k: Int): DataFrame = {
    val cents = centroidsOf(corpus, nCells)
    val lists = bestCells(corpus, cents, "vec_id", "embedding", 1)
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
    val scored = lists.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, k)
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023-style): partition the
    * corpus into IVF cells, drop every vector with cosine ≥ threshold to a
    * lower-id vector WITHIN its cell, return the survivors. Cluster-scoped
    * candidate generation is the published algorithm's tradeoff: cross-cell
    * near-dups are missed by design, in exchange for candidate pairs
    * bounded by Σ|cell|² instead of |corpus|² — with balanced cells at
    * 100 TB that is a per-cell-key equi-join AQE can split further on
    * skew. Exact-verify (the cosine) runs only inside cells.
    */
  def semanticDedup(corpus: DataFrame, nCells: Int,
      threshold: Double): DataFrame = {
    val cents = centroidsOf(corpus, nCells)
    // the cell assignment feeds both sides of the self-join — persist, or
    // the centroid broadcast-score pass runs twice
    val lists = bestCells(corpus, cents, "vec_id", "embedding", 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drops = lists.as("x")
      .join(lists.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(round(cosine(col("x.embedding"), col("y.embedding")), 4)
        >= threshold)
      .select(col("y.vec_id").as("drop_id"))
      .distinct()
    corpus.join(drops, col("vec_id") === col("drop_id"), "left_anti")
      .select(col("vec_id"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold,
    * candidates generated through one sign-LSH bucket join (fewer `planes`
    * → bigger buckets → higher recall at more verify cost; near-identical
    * vectors collide with overwhelming probability), then exact-verified.
    * Approximate-recall / exact-precision, like MinHash.
    */
  def cosineNearDupPairs(corpus: DataFrame, dim: Int, threshold: Double,
      planes: Int = 8): DataFrame = {
    val banded = corpus.select(
      col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, planes).as("bucket"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("score", round(cosine(col("x.embedding"), col("y.embedding")), 4))
      .filter(col("score") >= threshold)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"), col("score"))
  }
}
