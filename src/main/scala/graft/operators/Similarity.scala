package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedPersist

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

  /** Stored-PQ codebook grids already validated this session, keyed by
    * (dir, m_sub, n_codes, artifact fingerprint) — spares every probe
    * after the first its stride-guard count job. The fingerprint (file
    * names + mtimes + lengths of `codebooks/`, one driver-side listing)
    * ties the cache entry to the on-disk artifact: an out-of-process
    * rebuild or partial corruption at the same dir re-keys and
    * re-validates, instead of riding a stale same-JVM pass. Same-JVM
    * rebuilds additionally invalidate via [[writeIvfIndexPQ]].
    */
  private val cbGridOk =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int, Int, Long)]()

  /** Cheap content fingerprint of a small artifact directory: fold of
    * (path, mtime, length) over its files. A driver-side listing — far
    * cheaper than the parquet count job the cache exists to skip — that
    * changes whenever any file is rewritten, added, or removed.
    */
  private def artifactFingerprint(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var h = 1125899906842597L
    while (it.hasNext) {
      val f = it.next()
      h = h * 31 + f.getPath.getName.hashCode
      h = h * 31 + f.getModificationTime
      h = h * 31 + f.getLen
    }
    h
  }

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

  /** ANN QUALITY EVALUATION — the recall@k / reciprocal-rank report an
    * index deployment monitors continuously (every recall number this
    * engine's specs pin is this computation; here it is a first-class,
    * oracle-gated operator): ground truth = [[bruteForceTopK]] (exact),
    * system = [[ivfTopK]] under (nCells, nProbe), per query
    * n_hits = |system ∩ truth|, recall = n_hits / |truth| (the per-query
    * truth count, which is min(k, |corpus|−1) — dividing by the constant
    * k would misdefine recall on corpora smaller than k+1), rr = 1/rank
    * of the FIRST true hit in the system ranking (0 when none — the MRR
    * contribution). All numbers are single divisions of exact integers,
    * rounded to 4 dp.
    *
    * 100 TB posture: evaluation runs on a PROBE SAMPLE (|Q| ≪ corpus —
    * the caller picks the sample); truth is the broadcast-query brute
    * pass, the system side is the cell-pruned probe; the comparison is
    * one (q_id, vec_id) hash join + a bounded per-query aggregate.
    */
  def annEvalReport(queries: DataFrame, corpus: DataFrame, nCells: Int,
      nProbe: Int, k: Int): DataFrame = {
    val truth = bruteForceTopK(queries, corpus, k)
      .select(col("q_id"), col("vec_id"))
      .localCheckpoint() // feeds both the hit join and the truth count
    val nTruth = truth.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_truth"))
    val sys = ivfTopK(queries, corpus, nCells, nProbe, k)
      .select(col("q_id"), col("vec_id"), col("rnk"))
    val agg = sys.join(truth, Seq("q_id", "vec_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("rnk")).as("fr"))
    queries.select(col("q_id"))
      .join(nTruth, Seq("q_id"), "left")
      .join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_truth"), 4).as("recall"),
        round(coalesce(lit(1.0) / col("fr"), lit(0.0)), 4).as("rr"))
  }

  /** Number of random hyperplanes (signature bits) for LSH bucketing. */
  val LshPlanes = 12

  /** Ceiling on the PQ probe's driver-collected shortlist-id list (the
    * In-pushdown fast path); larger shortlists rerank via a distributed
    * semi-join instead. 100k longs ≈ 1 MB driver-side and a plannable In.
    */
  val DefaultInListMax = 100000

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

  /** Multi-probe sign-LSH top-k: each query additionally probes every
    * bucket at Hamming distance 1 (one flipped hyperplane sign — the
    * planes a near neighbour most plausibly disagrees on), i.e. planes+1
    * probe rows per query instead of 1. Single-bucket sign-LSH recall
    * collapses when buckets outnumber vectors (measured 0.03–0.18 recall@10
    * on the harness embeddings); multi-probe recovers most of it for a
    * (planes+1)× probe-side blow-up that is still negligible next to the
    * corpus (SimilaritySpec pins the measured improvement). A (query,
    * vector) pair can collide in at most ONE probed bucket (the corpus
    * vector has a single bucket), so no candidate dedup is needed.
    */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, dim: Int,
      k: Int, planes: Int = LshPlanes): DataFrame = {
    val probes = array((col("__b0") +: (0 until planes).map(j =>
      col("__b0").bitwiseXOR(lit(1L << j)))): _*)
    val qb = queries
      .withColumn("__b0", lshBucket(col("q_vec"), dim, planes))
      .withColumn("bucket", explode(probes))
      .drop("__b0")
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

  /** TRAINED coarse quantizer: distributed spherical Lloyd's k-means over
    * the corpus — the quality upgrade over [[centroidsOf]] real retrieval
    * stacks use (training-free centroids are deterministic and
    * oracle-friendly, but at scale recall hinges on quantizer quality).
    * Deterministic by construction: init = the nCells smallest-id corpus
    * vectors (no RNG seed to thread), a FIXED `iters` Lloyd iterations
    * (no data-dependent stopping), ties in assignment broken by cent_id
    * (the [[narrowBestCell]] first-max fold).
    *
    * Per iteration, Spark-shaped: (1) assignment is the
    * [[narrowBestCell]] fold over the broadcast centroid array (narrow,
    * |corpus|·nCells ops, zero shuffle — the corpus never exchanges);
    * (2) the new centroid = member mean, computed by posexploding to
    * (cell, pos, x) and hash-aggregating avg — partial aggregation
    * collapses each task to ≤ nCells·dim partial sums before the
    * exchange, so the shuffle carries centroids, not the corpus; (3) the
    * ≤ nCells·dim result folds back to arrays and localCheckpoints
    * (centroid frames are tiny; truncating lineage keeps iteration N's
    * plan from replaying iterations 1..N-1). A cell that loses all
    * members keeps its previous centroid (standard Lloyd's). Cosine
    * assignment is scale-invariant, so the mean needs no L2 re-norm.
    *
    * Float caveat (why the GATE keeps the training-free quantizer): the
    * per-cell avg folds in partition order, so trained centroids are not
    * bit-reproducible across engines — fine for an approximate index
    * (recall is pinned in SimilaritySpec), wrong for a hash-matched
    * oracle.
    *
    * `trainSampleMod` is the 100 TB knob: training runs on the
    * deterministic hash-mod sample `xxhash64(vec_id) % mod == 0` (a 1/mod
    * slice, stable across runs and engines), so the per-iteration cost is
    * sample-sized while the INDEX assignment — the caller's
    * [[narrowBestCell]] pass over the returned centroids — stays
    * full-corpus. Quantizer quality degrades only with sample
    * representativeness, not corpus coverage (k-means cells are density
    * summaries; a uniform hash sample preserves density), which is why
    * every production IVF trainer samples. Default 1 = train on
    * everything.
    */
  def centroidsKMeans(corpus: DataFrame, nCells: Int, iters: Int,
      trainSampleMod: Int = 1): DataFrame = {
    require(iters >= 1)
    require(trainSampleMod >= 1)
    // init stays full-corpus (the nCells smallest ids — deterministic and
    // sample-independent); only the Lloyd iterations see the sample
    val train =
      if (trainSampleMod == 1) corpus
      else corpus.filter(
        pmod(xxhash64(col("vec_id")), lit(trainSampleMod.toLong)) === 0L)
    var cents = centroidsOf(corpus, nCells).localCheckpoint()
    for (_ <- 1 to iters) {
      val means = narrowBestCell(train, cents, "vec_id", "embedding")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"),
          transform(col("pm"), p => p("m").cast("float")).as("mvec"))
      cents = cents.as("c")
        .join(means.as("m"), col("c.cent_id") === col("m.cent_id"), "left")
        .select(col("c.cent_id").as("cent_id"),
          coalesce(col("m.mvec"), col("c.cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** Single-best-cell assignment as a ZERO-SHUFFLE narrow map: the
    * centroids collapse to ONE broadcast row holding a cent_id-sorted
    * array, and each corpus row folds over it with a strict-max argmax —
    * first max wins, which on the 4-dp-rounded score ties selects the
    * SMALLEST cent_id, exactly [[bestCells]]'s top-1 tiebreak (and the
    * oracle's `ORDER BY score DESC, cent_id` with rank 1). Identical
    * output to `bestCells(df, cents, idCol, vecCol, 1)`, but where that
    * form exchanges one partially-aggregated row PER CORPUS VECTOR
    * (embedding included) through its groupBy, this one exchanges
    * nothing: assignment stays scan-bandwidth-bound at any corpus size.
    * Used wherever only the best cell is needed (index builds, ingest,
    * k-means training); probes keep [[bestCells]] — they need n > 1 and
    * their batch side is small.
    */
  private def narrowBestCell(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val carr = cents.agg(
      array_sort(collect_list(struct(col("cent_id"), col("cvec")))).as("__cents"))
    val init = struct(lit(-1L).as("cent_id"), lit(-2.0).as("s"))
    df.join(broadcast(carr), lit(true))
      .withColumn("__best", aggregate(col("__cents"), init, (acc, c) => {
        val s = round(cosine(col(vecCol), c.getField("cvec")), 4)
        when(s > acc.getField("s"),
          struct(c.getField("cent_id").as("cent_id"), s.as("s")))
          .otherwise(acc)
      }))
      .select(col(idCol), col(vecCol), col("__best.cent_id").as("cell"))
  }

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
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
    val scored = lists.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, k)
  }

  /** Build a STORED IVF index: the production retrieval shape — build
    * once, probe forever (the similarity sibling of
    * [[Dedup.writeCorpusIndex]]). Two parquet views under `dir`:
    *
    *  - `centroids/`: (cent_id, cvec) — the deterministic training-free
    *    coarse quantizer (first `nCells` corpus vectors), tiny;
    *  - `lists/`: (vec_id, embedding) PARTITIONED BY `cell` — each
    *    vector's max-cosine cell assignment, i.e. the inverted lists as
    *    physical partition directories.
    *
    * The cell-partitioned layout is what makes the probe cost ∝ batch:
    * a probe joins the lists scan on `cell` against a broadcast of the
    * query batch's probed cells, so dynamic partition pruning opens ONLY
    * the probed cells' directories — the corpus's other inverted lists
    * are never read (the same mechanism as the DPP PlanShapeSpec pin).
    * Build cost is one broadcast-score pass + one partitioned write;
    * rebuilds are overwrite-idempotent.
    */
  def writeIvfIndex(corpus: DataFrame, dir: String, nCells: Int,
      trainIters: Int = 0, trainSampleMod: Int = 1): Unit = {
    // trainIters = 0 → deterministic training-free quantizer (the gate's
    // oracle-reproducible default); > 0 → k-means-trained centroids
    // ([[centroidsKMeans]], optionally sample-trained via trainSampleMod)
    // for recall. Probes don't care which built the index: the stored
    // layout is identical.
    val cents =
      if (trainIters > 0) centroidsKMeans(corpus, nCells, trainIters, trainSampleMod)
      else centroidsOf(corpus, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    // cell as int: parquet partition-column inference reads the directory
    // values back as ints, so writing ints keeps the probe join key
    // cast-free (a cast on the partition column can defeat static pruning)
    narrowBestCell(corpus, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/lists")
    corpus.sparkSession.catalog.refreshByPath(dir)
  }

  /** Incrementally extend a stored [[writeIvfIndex]] with new vectors:
    * assign the BATCH against the stored centroids (broadcast, narrow)
    * and append to the cell-partitioned lists — ingestion grows the
    * index by the batch, never rebuilding the corpus assignment (the
    * similarity sibling of [[Dedup.appendToCorpusIndex]]). The quantizer
    * is frozen at build time — appended vectors never become centroids —
    * so probes against build+append equal probes against a from-scratch
    * build over the union whenever the build corpus contained the
    * centroid id range (spec-pinned). Appends are NOT replay-safe
    * (append-mode duplicates on redo); replaying producers use the
    * batch-versioned layout instead — [[writeIvfIndexVersioned]] +
    * [[ingestIntoIvfIndex]] (the
    * [[graft.streaming.EventStreams.dedupIngest]] pattern).
    */
  def appendToIvfIndex(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    // guard against the silent-loss corner: after a compaction the live
    // lists move to lists_e<N> (with a batch= level this flat layout lacks),
    // so an append into the superseded epoch-0 path would vanish from every
    // probe (which resolves the pointer first). Compacted indexes are
    // batch-versioned by construction — ingest into them instead.
    require(Compaction.currentEpoch(spark, dir) == 0,
      s"$dir has been compacted (epoch > 0); use ingestIntoIvfIndex " +
        "with a fresh batch id instead of the flat append")
    val cents = spark.read.parquet(s"$dir/centroids")
    narrowBestCell(newVectors, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/lists")
    // external write to a path this session may already have listed:
    // invalidate Spark's shared file-status cache, or a later read of the
    // same path can silently serve the pre-write listing
    spark.catalog.refreshByPath(dir)
  }

  /** Build a stored IVF index in the BATCH-VERSIONED layout — the
    * replay-safe sibling of [[writeIvfIndex]] for indexes that will be fed
    * by a (possibly replaying) producer: inverted lists live under
    * `lists/batch=<id>/cell=<c>/` (the build is batch 0), so an ingest
    * batch OVERWRITES its own batch partition instead of appending —
    * a crash-replayed batch converges to identical index contents rather
    * than duplicating its vectors (exactly the
    * [[graft.streaming.EventStreams.dedupIngest]] index layout). Probes
    * ([[ivfTopKAgainstIndex]]) work unchanged: partition discovery reads
    * `batch` as just another partition column, the probe joins on `cell`,
    * and cell-directory pruning applies across every batch directory.
    */
  def writeIvfIndexVersioned(corpus: DataFrame, dir: String, nCells: Int,
      trainIters: Int = 0, trainSampleMod: Int = 1): Unit = {
    val cents =
      if (trainIters > 0) centroidsKMeans(corpus, nCells, trainIters, trainSampleMod)
      else centroidsOf(corpus, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    narrowBestCell(corpus, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/lists/batch=0")
    corpus.sparkSession.catalog.refreshByPath(dir)
  }

  /** Replay-safe incremental ingestion into a [[writeIvfIndexVersioned]]
    * index: assign the batch against the FROZEN stored centroids
    * (broadcast, narrow — same frozen-quantizer semantics as
    * [[appendToIvfIndex]]) and OVERWRITE this batch's own partition
    * directory. Re-running the same (batch, batchId) — a streaming
    * replay after a crash — rewrites the same files and leaves the index
    * contents identical; per-ingest cost stays ∝ batch.
    */
  def ingestIntoIvfIndex(newVectors: DataFrame, dir: String,
      batchId: Long): Unit = {
    require(batchId >= 1, s"batch 0 is the build (got $batchId)")
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val lists = Compaction.epochPath(dir, "lists",
      Compaction.currentEpoch(spark, dir))
    narrowBestCell(newVectors, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$lists/batch=$batchId")
    // external write to a path this session may already have listed:
    // invalidate Spark's shared file-status cache, or a later read of the
    // same path can silently serve the pre-write listing
    spark.catalog.refreshByPath(dir)
  }

  /** Compact a batch-versioned IVF index: rewrite every `batch=<id>`
    * directory of the current epoch into ONE consolidated batch under the
    * next epoch (one file per cell via a cell repartition), atomically
    * swap the `EPOCH` pointer, then drop the superseded epoch — probes
    * resolve the pointer first, so they see either complete epoch, never a
    * mix, and probe results are IDENTICAL pre/post (spec-pinned): the rows
    * are the same, only their file layout changes. This is the maintenance
    * op that stops per-ingest batch directories from accreting until file
    * listing dominates probe cost (~2× file-open overhead measured with
    * just two batches at sf0.1).
    *
    * Replay horizon: compaction folds batch ids away, so it must run
    * BEYOND the producer's replay horizon (after its checkpoint commits) —
    * a batch replayed after being compacted would re-land beside its
    * already-folded rows. That is the standard contract (compact only
    * sealed batches); the streaming sinks here commit their checkpoint
    * with the batch, so anything older than the last commit is sealed.
    *
    * @return the new epoch number
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int = {
    val e = Compaction.currentEpoch(spark, dir)
    val cur = Compaction.epochPath(dir, "lists", e)
    val next = Compaction.epochPath(dir, "lists", e + 1)
    spark.read.parquet(cur)
      .select(col("vec_id"), col("embedding"), col("cell")) // fold `batch` away
      .repartition(col("cell")) // one task → one file per cell directory
      .write.mode("overwrite").partitionBy("cell").parquet(s"$next/batch=0")
    Compaction.advanceEpoch(spark, dir, e + 1)
    Compaction.deleteDir(spark, cur)
    // external write to a path this session may already have listed:
    // invalidate Spark's shared file-status cache, or a later read of the
    // same path can silently serve the pre-write listing
    spark.catalog.refreshByPath(dir)
    e + 1
  }

  /** Auto-compaction trigger: run [[compactIvfIndex]] only when the
    * current epoch holds more than `maxBatches` sealed batch directories
    * ([[Compaction.batchCount]]) — the threshold helper ingest drivers
    * consult after their checkpoint commits (see the consult pattern on
    * batchCount; compaction must stay beyond the replay horizon).
    *
    * @return the new epoch, or None when under threshold (no-op)
    */
  def compactIvfIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxBatches: Int): Option[Int] =
    if (Compaction.batchCount(spark, dir, "lists") > maxBatches)
      Some(compactIvfIndex(spark, dir))
    else None

  /** Physically DELETE vectors from a stored IVF index — the
    * right-to-be-forgotten maintenance op: rewrite the current epoch's
    * lists WITHOUT the given ids (an anti-join rewrite, not a tombstone
    * mask — the erasure obligation is on the STORED bytes, which a mask
    * would not meet), committed by [[compactIvfIndex]]'s atomic
    * epoch-pointer swap, so probes see the pre-delete or post-delete
    * index in full, never a mix. Centroids stay FROZEN (deletion is not
    * retraining — the quantizer contract of [[appendToIvfIndex]]), so a
    * post-delete probe is bit-identical to probing an index built from
    * the surviving corpus under the same quantizer (spec-pinned).
    *
    * Deletion implies compaction (batch ids fold away into one
    * consolidated batch), so it shares the replay-horizon contract: run
    * beyond the producer's replay horizon, or a replayed batch would
    * resurrect its deleted rows. Cost: one index-sized filter-rewrite —
    * the compaction envelope; `ids` broadcasts when request-sized (the
    * usual GDPR case) and hash-joins when not.
    *
    * @param ids one column `vec_id`; ids absent from the index are
    *            ignored (idempotent: re-running a delete is a no-op
    *            rewrite)
    * @return the new epoch number
    */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame): Int = {
    val e = Compaction.currentEpoch(spark, dir)
    val cur = Compaction.epochPath(dir, "lists", e)
    // writePartitioned: a delete that removes EVERY vector would leave a
    // fileless lists dir no later read could infer a schema from
    Compaction.writePartitioned(
      spark.read.parquet(cur)
        .join(ids.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("embedding"), col("cell"))
        .repartition(col("cell")), // one task → one file per cell directory
      "cell", s"${Compaction.epochPath(dir, "lists", e + 1)}/batch=0")
    Compaction.advanceEpoch(spark, dir, e + 1)
    Compaction.deleteDir(spark, cur)
    // external write to a path this session may already have listed:
    // invalidate Spark's shared file-status cache, or a later read of the
    // same path can silently serve the pre-write listing
    spark.catalog.refreshByPath(dir)
    e + 1
  }

  /** Probe a stored [[writeIvfIndex]]: per-query top-k over the `nProbe`
    * best cells' inverted lists, identical semantics (and identical
    * result) to running [[ivfTopK]] against the full corpus with the same
    * parameters — the index just amortizes the assignment. Per-batch
    * cost: one broadcast-score pass of the BATCH against the tiny stored
    * centroids + a partition-pruned scan of the probed cells only.
    */
  def ivfTopKAgainstIndex(queries: DataFrame, dir: String, nProbe: Int,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    // resolve the epoch pointer first (the snapshot-read side of
    // [[compactIvfIndex]]'s atomic swap); epoch 0 = the unmarked layout
    val lists = spark.read.parquet(Compaction.epochPath(dir, "lists",
      Compaction.currentEpoch(spark, dir)))
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
      .withColumn("cell", col("cell").cast("int"))
    val scored = lists.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(scored, k)
  }

  // ===== product quantization (IVFADC + exact refine) =====================
  // The stored-IVF storage/probe-I/O fix: raw inverted lists ARE the
  // corpus (dim·4 bytes per vector scanned per probed cell), so at 100 TB
  // every probe's list scan is corpus-sized per cell. The standard answer
  // (Jégou et al., IVFADC) compresses each vector to M one-byte-ish codes
  // — the probe scans CODES (M bytes/vector, 32× smaller at dim=64, M=8),
  // scores them against a per-query lookup table (asymmetric distance),
  // and exactly re-ranks only a bounded shortlist from the full vectors.

  /** Train the M per-subspace L2 codebooks — distributed Lloyd's with the
    * [[centroidsKMeans]] cost discipline, all M subspaces in ONE pass per
    * iteration: the corpus narrowly explodes to (vec_id, m, subvector)
    * rows (a map, no exchange), assignment folds each row over its own
    * subspace's broadcast codebook (argmin L2, ties to the smallest code),
    * and the mean update's exchange carries only M·nCodes·subDim partial
    * sums — codebook-sized, never the corpus. Deterministic: init = the
    * subvectors of the nCodes smallest-id corpus vectors, FIXED iters,
    * strict-< argmin. L2, not cosine: PQ codes must reconstruct the
    * vector (ADC needs magnitudes), unlike the coarse quantizer where
    * only direction matters. Returns (m, code, cvec).
    */
  def pqCodebooks(corpus: DataFrame, mSub: Int, nCodes: Int, iters: Int,
      dim: Int): DataFrame = {
    require(dim % mSub == 0, s"dim $dim not divisible by mSub $mSub")
    require(iters >= 0)
    val subDim = dim / mSub
    val sub = corpus
      .select(col("vec_id"), explode(expr(s"sequence(0, ${mSub - 1})")).as("m"),
        expr(s"slice(embedding, m * $subDim + 1, $subDim)").as("sv"))
    var cb = corpus.orderBy(col("vec_id")).limit(nCodes)
      .select(col("vec_id"), col("embedding"))
      .withColumn("code", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
      // the window runs over nCodes rows (the init set) — never the corpus
      .select(explode(expr(s"sequence(0, ${mSub - 1})")).as("m"), col("code"),
        expr(s"slice(embedding, m * $subDim + 1, $subDim)").as("cvec"))
      .localCheckpoint()
    // a corpus smaller than nCodes would silently yield fewer codebook
    // rows while meta records n_codes = nCodes — and the probe's ADC LUT
    // is indexed with stride nCodes (lut[m·nCodes + code]), so a short
    // codebook reads past the LUT array's end into arbitrary bytes
    // (silently wrong scores). Fail loudly at train time instead; the
    // count is on the localCheckpointed frame — one cheap cached action.
    val initRows = cb.count()
    require(initRows == mSub.toLong * nCodes,
      s"PQ codebook init needs >= $nCodes corpus vectors; got " +
        s"${initRows / mSub} (corpus smaller than nCodes)")
    pqLloyd(sub, cb, iters)
  }

  /** The per-subspace Lloyd loop shared by raw and RESIDUAL codebook
    * training: assign via [[pqAssign]], re-center to member means (a code
    * that loses all members keeps its previous entry), localCheckpoint
    * per round.
    */
  private def pqLloyd(sub: DataFrame, cb0: DataFrame, iters: Int): DataFrame = {
    var cb = cb0
    for (_ <- 1 to iters) {
      val means = pqAssign(sub, cb)
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(avg(col("x")).as("v"))
        .groupBy(col("m"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pm"))
        .select(col("m"), col("code"),
          transform(col("pm"), p => p("v").cast("float")).as("mvec"))
      cb = cb.join(means, Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cb
  }

  /** Assign each (m, subvector) row to its nearest code in subspace m —
    * a narrow fold over the broadcast per-subspace codebook arrays.
    */
  private def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame = {
    val byM = cb.groupBy(col("m"))
      .agg(array_sort(collect_list(struct(col("code"), col("cvec")))).as("__cb"))
    val init = struct(lit(-1).as("code"), lit(Double.MaxValue).as("d"))
    sub.join(broadcast(byM), Seq("m"))
      .withColumn("__best", aggregate(col("__cb"), init, (acc, c) => {
        val d = aggregate(
          zip_with(col("sv"), c.getField("cvec"),
            (x, y) => (x.cast("double") - y.cast("double"))
              * (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, v) => a + v)
        when(d < acc.getField("d"),
          struct(c.getField("code").as("code"), d.as("d"))).otherwise(acc)
      }))
      .select(col("vec_id"), col("m"), col("sv"), col("__best.code").as("code"))
  }

  /** RESIDUAL IVF-PQ top-k (IVFADC proper, Jégou et al. 2011 §III): PQ
    * codebooks train on and codes encode the RESIDUAL x − c(cell) instead
    * of the raw vector — the production FAISS form, because residuals
    * concentrate around the origin so the same code budget spends its
    * precision on the part of x the coarse quantizer did NOT explain
    * (recall gain spec-pinned against raw-vector PQ at equal bytes).
    *
    * Cosine ADC decomposes exactly: with x ≈ c + r̂,
    * ⟨q, x⟩ = ⟨q, c⟩ + ⟨q, r̂⟩ — the residual LUT ⟨q_sub, cvec⟩ is
    * CELL-INDEPENDENT (unlike L2-ADC, where the LUT would rebuild per
    * probed cell), so the probe adds one ⟨q, c⟩ term per (query, probed
    * cell) on top of the standard per-subspace fold; ‖x‖ comes from the
    * EXACT per-vector norm computed at encode time (the FAISS stored-norm
    * column), never from the approximation.
    *
    * Determinism (the q168 contract extended to residuals): residuals,
    * folds and norms are index-ordered double arithmetic; codebooks are
    * the training-free subvectors of the nCodes smallest-id RESIDUALS;
    * encoding is strict-< L2 argmin (ties to the smallest code); ADC
    * scores round to 4 dp before ranking; the exact re-rank runs on the
    * raw vectors. A SQL oracle replays every step.
    *
    * 100 TB posture: assignment and residual computation are narrow maps
    * over broadcast centroids; encoding is the shared [[pqAssign]]
    * broadcast fold; candidates are cell-pruned; both rankings are the
    * bounded [[rankTopK]] aggregate — no window over unbounded groups,
    * no cross product, the corpus never shuffles raw vectors.
    */
  def pqResidualTopK(queries: DataFrame, corpus: DataFrame, nCells: Int,
      mSub: Int, nCodes: Int, nProbe: Int, k: Int,
      shortlist: Int = 50, trainIters: Int = 0): DataFrame = {
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by mSub $mSub")
    val subDim = dim / mSub
    val cents = centroidsOf(corpus, nCells)
    val centsD = cents.select(col("cent_id"),
      expr("transform(cvec, x -> CAST(x AS DOUBLE))").as("cv"))
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
      .persistScoped() // feeds residuals AND the exact re-rank fetch
    val resid = lists
      .join(broadcast(centsD), col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - b)")
          .as("rv"),
        expr("""aggregate(embedding, 0D,
               (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""")
          .as("n2x"))
      .persistScoped() // feeds codebooks, encoding, and the norm join
    // codebook init: the first nCodes NON-CENTROID residuals — a vector in
    // the training-free centroid set is its own cell, so its residual is
    // the zero vector and an all-zero codebook would make every ADC term
    // vanish (measured: recall collapsed to 0.06 before this guard)
    val cb0 = resid.filter(col("vec_id") >= nCells)
      .orderBy(col("vec_id")).limit(nCodes)
      .select(col("vec_id"), col("rv"))
      .withColumn("code", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
      // the window runs over nCodes rows (the init set), never the corpus
      .select(explode(expr(s"sequence(0, ${mSub - 1})")).as("m"), col("code"),
        expr(s"slice(rv, m * $subDim + 1, $subDim)").as("cvec"))
      .localCheckpoint()
    require(cb0.count() == mSub.toLong * nCodes,
      s"residual-PQ codebook init needs >= $nCodes corpus vectors")
    val sub = resid.select(col("vec_id"),
      explode(expr(s"sequence(0, ${mSub - 1})")).as("m"),
      expr(s"slice(rv, m * $subDim + 1, $subDim)").as("sv"))
    // trainIters Lloyd rounds over the residual subvectors (the shared
    // [[pqLloyd]] loop; 0 = the training-free oracle-replayable form the
    // gate runs — trained means fold floats in partition order)
    val cb = pqLloyd(sub, cb0, trainIters)
    // round-16 optimization: score candidates through the SAME native
    // pq_adc kernel + per-query LUT ARRAY the stored probe uses
    // ([[ivfTopKAgainstIndexPQR]]). The former shape joined the candidate
    // set against per-(vec, m) assignments and per-(q, m, code) LUT rows —
    // (candidates × mSub) rows through TWO hash joins and a per-candidate
    // collect_list aggregate (all shuffles); the kernel form collapses
    // each vector's codes ONCE corpus-side and scores every candidate in
    // a narrow fold. Both fold the m-indexed terms ascending from 0D over
    // identical doubles, so scores are bit-identical (the oracle's
    // m-sorted msum replays unchanged).
    val codes = pqAssign(sub, cb)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("code")))).as("e"))
      .select(col("vec_id"),
        expr("transform(e, x -> CAST(x.code AS INT))").as("codes"))
      .join(resid.select(col("vec_id"), col("cell"), col("n2x")), Seq("vec_id"))
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
    val q0 = queries.select(col("q_id"), col("q_vec"),
      expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("qv"))
      .persistScoped() // feeds LUT, norms, and the re-rank
    val luts = q0.crossJoin(broadcast(cb))
      .select(col("q_id"), col("m"), col("code"),
        expr(s"""aggregate(zip_with(slice(qv, m * $subDim + 1, $subDim), cvec,
               (x, y) -> x * y), 0D, (a, v) -> a + v)""").as("ld"))
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("code"), col("ld"))))
        .as("e"))
      .select(col("q_id"), expr("transform(e, x -> x.ld)").as("lut"))
    val qn = q0.select(col("q_id"),
      sqrt(expr("aggregate(qv, 0D, (a, x) -> a + x * x)")).as("qn"))
    val qc = probes.select(col("q_id"), col("cell"))
      .join(broadcast(centsD), col("cell") === col("cent_id"))
      .join(q0.select(col("q_id"), col("qv")), Seq("q_id"))
      .select(col("q_id"), col("cell"),
        expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, v) -> a + v)")
          .as("qc"))
    // one bounded probe frame: (q_id, cell, qc, lut, qn) — |Q|·nProbe rows.
    // Size envelope: the per-query LUT array (mSub·nCodes doubles) is
    // duplicated per probed cell, so the broadcast carries
    // |Q|·nProbe·mSub·nCodes·8 B (gate constants: 4·4·8·16·8 B ≈ 16 KB);
    // at serving scale grow nProbe/nCodes with this multiplier in mind —
    // past a few hundred MB, dedup the LUT to a per-q_id broadcast join.
    val pb = qc.join(luts, Seq("q_id")).join(qn, Seq("q_id"))
    val scored = codes
      .join(broadcast(pb), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round((col("qc") + graft.functions.pq_adc(col("codes"), col("lut"), nCodes))
          / (col("qn") * sqrt(col("n2x"))), 4)
          .as("score"))
    val sl = rankTopK(scored, shortlist).select(col("q_id"), col("vec_id"))
    val rs = sl
      .join(broadcast(q0.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .join(lists.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_vec"), col("embedding")), 4).as("score"))
    rankTopK(rs, k)
  }

  /** IVF-SQ8 top-k — SCALAR quantization, the third member of the
    * compressed-index family next to raw lists (q44) and product
    * quantization (q168/q208; FAISS's IndexIVFScalarQuantizer): every
    * dimension is quantized INDEPENDENTLY to one byte with a per-dim
    * affine map code_d = clamp(⌊(x_d − mn_d)/step_d + ½⌋, 0, 255),
    * step_d = (mx_d − mn_d)/255 — 4× smaller than float32 at dim
    * precision PQ can't reach (PQ at the same 1 byte/dim would need
    * dim codebooks; SQ8 needs 2·dim doubles), the right trade when
    * dimensions are weakly correlated. Candidates come from the
    * training-free coarse quantizer's probed cells; scoring is cosine
    * between the query and the RECONSTRUCTED vector
    * r_d = mn_d + code_d·step_d; the top-`shortlist` then re-rank by
    * exact cosine on the raw vectors (the q168 refine discipline).
    *
    * Determinism: mn/mx are float min/max (exact in double), step and
    * every code/reconstruction/fold a fixed tree of correctly-rounded
    * IEEE double ops in index order, scores rounded to 4 dp before
    * ranking with vec_id tie-break — the DuckDB oracle replays the
    * whole chain from the same parquet floats.
    *
    * 100 TB posture: the quantizer model is 2·dim doubles — collected
    * once at the driver (the bounded-model-artifact contract, like the
    * PQ codebooks) and shipped as expression data; encoding and
    * reconstruction are narrow maps; candidates are cell-pruned;
    * both rankings are the bounded [[rankTopK]] aggregate.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, nCells: Int,
      nProbe: Int, k: Int, shortlist: Int = 50): DataFrame = {
    val cents = centroidsOf(corpus, nCells)
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
      .persistScoped() // feeds the stats pass, the candidate join, re-rank
    val (mnL, stepL) = sq8Lits(sq8Stats(lists))
    val codes = lists.select(col("vec_id"), col("cell"),
      sq8EncodeCol(col("embedding"), mnL, stepL).as("codes"))
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
    val q0 = queries.select(col("q_id"), col("q_vec"),
      expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("qv"))
      .persistScoped() // feeds the approx scoring and the re-rank
    val scored = codes
      .join(broadcast(probes.select(col("q_id"), col("cell"))), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .join(broadcast(q0.select(col("q_id"), col("qv"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        sq8ApproxScore(col("qv"), col("codes"), mnL, stepL).as("score"))
    val sl = rankTopK(scored, shortlist).select(col("q_id"), col("vec_id"))
    val rs = sl
      .join(broadcast(q0.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .join(lists.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_vec"), col("embedding")), 4).as("score"))
    rankTopK(rs, k)
  }

  /** Per-dim SQ8 quantizer params of a vector frame: (d, mn, step) — dim
    * rows from ONE map-side-combined aggregate. step = (mx − mn)/255 is
    * computed HERE (one double division) so build, ingest, direct probe
    * and oracle all share the identical value.
    */
  private def sq8Stats(vectors: DataFrame): DataFrame =
    vectors.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"),
        ((max(col("x").cast("double")) - min(col("x").cast("double"))) / 255.0)
          .as("step"))

  /** Collect a [[sq8Stats]] frame into the two expression-data literals
    * the encode/score columns consume — 2·dim doubles, the bounded
    * quantizer artifact (the PQ-codebook pattern).
    */
  private def sq8Lits(stats: DataFrame): (Column, Column) = {
    val rows = stats.orderBy(col("d")).collect()
    (typedLit(rows.map(_.getDouble(1)).toSeq),
      typedLit(rows.map(_.getDouble(2)).toSeq))
  }

  /** SQ8 encode: code_d = clamp(⌊(x_d − mn_d)/step_d + ½⌋, 0, 255)
    * (constant dims → 0) — one narrow `transform`, shared by the direct
    * operator, the stored build, and ingest so encoding cannot drift.
    */
  private def sq8EncodeCol(vec: Column, mnL: Column, stepL: Column): Column = {
    def mAt(i: Column) = element_at(mnL, (i + 1).cast("int"))
    def sAt(i: Column) = element_at(stepL, (i + 1).cast("int"))
    transform(vec, (x, i) =>
      when(sAt(i) > lit(0.0),
        least(greatest(
          floor((x.cast("double") - mAt(i)) / sAt(i) + lit(0.5)).cast("int"),
          lit(0)), lit(255)))
        .otherwise(lit(0)))
  }

  /** SQ8 approx score: round-4 cosine of the query against the
    * reconstructed vector r_d = mn_d + code_d·step_d (index-ordered
    * 0-init folds) — shared by the direct operator and the stored probe.
    */
  private def sq8ApproxScore(qv: Column, codes: Column,
      mnL: Column, stepL: Column): Column = {
    def mAt(i: Column) = element_at(mnL, (i + 1).cast("int"))
    def sAt(i: Column) = element_at(stepL, (i + 1).cast("int"))
    def fsum(arr: Column) = aggregate(arr, lit(0.0), (a, v) => a + v)
    val rv = transform(codes, (c, i) => mAt(i) + c * sAt(i))
    round(fsum(zip_with(qv, rv, (x, y) => x * y)) /
      (sqrt(fsum(transform(qv, x => x * x))) *
        sqrt(fsum(transform(rv, x => x * x)))), 4)
  }

  /** Persist an IVF-SQ8 index — the FOURTH stored ANN layout (raw q145,
    * PQ, residual-PQ): `centroids/`, `sqstats/` (the 2·dim-double
    * quantizer — the frozen-model artifact of this family), cell-
    * partitioned 1-byte-per-dim `codes/batch=0`, and the vec_id-sorted
    * raw `vectors/batch=0` refine store. Compaction and deletion are the
    * PQ layout's own schema-preserving ops
    * ([[compactIvfIndexPQ]]/[[deleteFromIvfIndexPQ]]) — same store
    * names, column-generic folds — so the lifecycle surface is shared,
    * not reimplemented.
    */
  def writeIvfIndexSQ(corpus: DataFrame, dir: String, nCells: Int): Unit = {
    val spark = corpus.sparkSession
    val cents = centroidsOf(corpus, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
      .persistScoped()
    val stats = sq8Stats(lists).persistScoped()
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/sqstats")
    val (mnL, stepL) = sq8Lits(stats)
    lists.select(col("vec_id"),
        sq8EncodeCol(col("embedding"), mnL, stepL).as("codes"),
        col("cell").cast("int").as("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes/batch=0")
    corpus.select(col("vec_id"), col("embedding"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/vectors/batch=0")
    spark.catalog.refreshByPath(dir)
  }

  /** Replay-safe incremental ingestion into a [[writeIvfIndexSQ]] index:
    * the batch assigns against the FROZEN stored centroids and encodes
    * against the FROZEN stored quantizer stats (deletion ≠ retraining —
    * the frozen-quantizer contract of [[ingestIntoIvfIndexPQ]]; a batch
    * value outside a dim's build-time [mn, mx] clamps to the range edge,
    * the FAISS SQ behavior — quantizer drift is a rebuild-and-swap
    * decision, surfaced by monitoring clamp rates, never an in-stream
    * stats update), then OVERWRITES its own batch partitions.
    */
  def ingestIntoIvfIndexSQ(newVectors: DataFrame, dir: String,
      batchId: Long): Unit = {
    require(batchId >= 1, s"batch 0 is the build (got $batchId)")
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val (mnL, stepL) = sq8Lits(spark.read.parquet(s"$dir/sqstats"))
    val e = Compaction.currentEpoch(spark, dir)
    narrowBestCell(newVectors, cents, "vec_id", "embedding")
      .select(col("vec_id"),
        sq8EncodeCol(col("embedding"), mnL, stepL).as("codes"),
        col("cell").cast("int").as("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${Compaction.epochPath(dir, "codes", e)}/batch=$batchId")
    newVectors.select(col("vec_id"), col("embedding"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${Compaction.epochPath(dir, "vectors", e)}/batch=$batchId")
    spark.catalog.refreshByPath(dir)
  }

  /** Probe a [[writeIvfIndexSQ]] index: reconstruct-and-score against the
    * cell-pruned codes scan (the stored quantizer rides as expression
    * data), exact re-rank of the bounded shortlist through the refine
    * store's pushed-down fetch — [[ivfTopKAgainstIndexPQR]]'s probe shape
    * with per-dim affine reconstruction in place of the codebook LUT.
    * Identical output to [[sq8TopK]] over the indexed corpus (stored ≡
    * direct, hash-gated via q215's oracle).
    */
  def ivfTopKAgainstIndexSQ(queries: DataFrame, dir: String, nProbe: Int,
      k: Int, shortlist: Int = 50,
      inListMax: Int = DefaultInListMax): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val (mnL, stepL) = sq8Lits(spark.read.parquet(s"$dir/sqstats"))
    val epoch = Compaction.currentEpoch(spark, dir)
    val codes = spark.read.parquet(Compaction.epochPath(dir, "codes", epoch))
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
      .withColumn("cell", col("cell").cast("int"))
    val q0 = queries.select(col("q_id"), col("q_vec"),
      expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("qv"))
      .persistScoped() // feeds the approx scan AND the exact-rerank join
    val short = codes
      .join(broadcast(probes.select(col("q_id"), col("cell"))), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .join(broadcast(q0.select(col("q_id"), col("qv"))), Seq("q_id"))
      .withColumn("appr", sq8ApproxScore(col("qv"), col("codes"), mnL, stepL))
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("appr"), col("vec_id"), shortlist)
        .as("top"))
      .select(col("q_id"), explode(col("top.id")).as("vec_id"))
      .persistScoped() // feeds the id fetch AND the exact-rerank join
    val idsDf = short.select(col("vec_id")).distinct()
    val capped = idsDf.limit(inListMax + 1).collect()
    val vecStore = spark.read.parquet(Compaction.epochPath(dir, "vectors", epoch))
    val raw =
      if (capped.length <= inListMax)
        vecStore.filter(col("vec_id").isin(capped.map(_.getLong(0)).toSeq: _*))
          .select(col("vec_id"), col("embedding"))
      else
        vecStore.join(idsDf, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding"))
    val rescored = short.join(raw, Seq("vec_id"))
      .join(broadcast(q0.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(rescored, k)
  }

  /** Deterministic coordinate permutation for PQ subspace slicing — the
    * OPQ-grade recall knob without rotation training (OPQ, Ge et al.
    * 2013, learns a rotation so each subspace carries balanced variance;
    * a fixed pseudo-random permutation captures most of that gain when
    * the hurt comes from CORRELATED ADJACENT dims landing in one
    * subspace): dims ordered by the engine-neutral multiplicative hash
    * (d·2654435761) mod 1000003 (ties by d — a total order). Stored in
    * the index meta, so probes replay it; identity for old indexes.
    */
  def pqDimPermutation(dim: Int): Array[Int] =
    (0 until dim).sortBy(d => ((d.toLong * 2654435761L) % 1000003L, d)).toArray

  /** Apply a stored dim permutation to a vector column (null perm =
    * identity): out(i) = vec(perm(i)+1).
    */
  private def permuteVec(vec: Column, perm: Option[Array[Int]]): Column =
    perm match {
      case None => vec
      case Some(p) =>
        transform(typedLit(p.toSeq), i => element_at(vec, i + 1))
    }

  /** Build a PQ-compressed stored IVF index (IVFADC + refine layout):
    *
    *  - `centroids/`: the coarse quantizer (as [[writeIvfIndex]]);
    *  - `codebooks/`: (m, code, cvec) — M per-subspace L2 codebooks,
    *    trained distributed ([[pqCodebooks]]), a tiny model artifact;
    *  - `codes/` PARTITIONED BY `cell`: (vec_id, codes) — the scanned
    *    index. M ints per vector instead of dim floats: probe list I/O
    *    shrinks ~dim·4/M per vector (32× at dim=64, M=8);
    *  - `vectors/`: the raw vectors, range-partitioned and SORTED by
    *    vec_id so the refine stage's id-list fetch prunes row groups via
    *    parquet min/max stats — shortlist-local I/O, not a corpus scan;
    *  - `meta/`: (m_sub, n_codes, sub_dim).
    *
    * Cell assignment and encoding run in ONE narrow pass (the codebooks
    * collect driver-side once — a bounded model artifact, M·nCodes rows —
    * and ride into [[graft.functions.PqEncodeExpr]] as expression data);
    * the corpus never shuffles.
    */
  def writeIvfIndexPQ(corpus: DataFrame, dir: String, nCells: Int,
      mSub: Int, nCodes: Int, trainIters: Int = 3,
      permuteDims: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    // OPQ-grade knob: codebooks train on (and codes encode) the PERMUTED
    // coordinates so correlated adjacent dims spread across subspaces;
    // the perm is stored in meta and replayed by probes/ingest. Coarse
    // cells and the exact re-rank stay on the RAW vectors (cosine is
    // permutation-invariant; the raw store is the refine source).
    val perm = if (permuteDims) Some(pqDimPermutation(dim)) else None
    val cents = centroidsOf(corpus, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    val pqTrain = corpus.select(col("vec_id"),
      permuteVec(col("embedding"), perm).as("embedding"))
    val cbDf = pqCodebooks(pqTrain, mSub, nCodes, trainIters, dim)
    cbDf.write.mode("overwrite").parquet(s"$dir/codebooks")
    // a rebuild over a previously-probed dir must re-validate its grid
    cbGridOk.removeIf(_._1 == dir)
    Seq((mSub, nCodes, dim / mSub, perm.map(_.toSeq).getOrElse(Seq.empty[Int])))
      .toDF("m_sub", "n_codes", "sub_dim", "perm")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val cb = collectCodebooks(cbDf, mSub, nCodes)
    // batch-versioned from the start (the writeIvfIndexVersioned layout):
    // the build is batch 0, so replaying producers can ingest with
    // [[ingestIntoIvfIndexPQ]] and [[compactIvfIndexPQ]] can epoch-swap
    narrowBestCell(corpus, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .withColumn("codes",
        graft.functions.pq_encode(permuteVec(col("embedding"), perm), cb))
      .select(col("vec_id"), col("codes"), col("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes/batch=0")
    corpus.select(col("vec_id"), col("embedding"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/vectors/batch=0")
    spark.catalog.refreshByPath(dir)
  }

  /** Replay-safe incremental ingestion into a [[writeIvfIndexPQ]] index:
    * the batch assigns against the FROZEN stored centroids and encodes
    * against the FROZEN stored codebooks (both broadcast; the quantizer
    * contract of [[appendToIvfIndex]] extended to the code level), then
    * OVERWRITES its own batch partitions — codes under
    * `codes/batch=<id>/cell=<c>/`, raw vectors (sorted within the batch,
    * so the refine fetch's row-group pruning still bites) under
    * `vectors/batch=<id>/`. A crash-replayed batch rewrites the same
    * partitions and leaves the index contents identical.
    */
  def ingestIntoIvfIndexPQ(newVectors: DataFrame, dir: String,
      batchId: Long): Unit = {
    require(batchId >= 1, s"batch 0 is the build (got $batchId)")
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val cb = collectCodebooks(spark.read.parquet(s"$dir/codebooks"),
      meta.getAs[Int]("m_sub"), meta.getAs[Int]("n_codes"))
    val e = Compaction.currentEpoch(spark, dir)
    narrowBestCell(newVectors, cents, "vec_id", "embedding")
      .withColumn("cell", col("cell").cast("int"))
      .withColumn("codes", graft.functions.pq_encode(
        permuteVec(col("embedding"), metaPerm(meta)), cb))
      .select(col("vec_id"), col("codes"), col("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${Compaction.epochPath(dir, "codes", e)}/batch=$batchId")
    newVectors.select(col("vec_id"), col("embedding"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${Compaction.epochPath(dir, "vectors", e)}/batch=$batchId")
    spark.catalog.refreshByPath(dir)
  }

  /** Compact a PQ index's batch directories — [[compactIvfIndex]]'s
    * epoch-pointer commit applied to BOTH stores: codes consolidate to one
    * batch (one file per cell), the raw vectors re-sort globally by
    * vec_id (restoring the tightest row-group pruning for the refine
    * fetch, which per-batch sorting can only approximate). Probe results
    * identical pre/post (spec-pinned); same replay-horizon contract.
    *
    * @return the new epoch number
    */
  def compactIvfIndexPQ(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int = {
    val e = Compaction.currentEpoch(spark, dir)
    val curCodes = Compaction.epochPath(dir, "codes", e)
    val curVecs = Compaction.epochPath(dir, "vectors", e)
    // schema-preserving fold (drop only the batch level): the residual
    // layout ([[writeIvfIndexPQR]]) carries an extra n2x column the
    // compaction must not lose — both PQ layouts compact through here
    val curCodesDf = spark.read.parquet(curCodes)
    curCodesDf
      .select(curCodesDf.columns.filter(_ != "batch").map(col): _*)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${Compaction.epochPath(dir, "codes", e + 1)}/batch=0")
    spark.read.parquet(curVecs)
      .select(col("vec_id"), col("embedding"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${Compaction.epochPath(dir, "vectors", e + 1)}/batch=0")
    Compaction.advanceEpoch(spark, dir, e + 1)
    Compaction.deleteDir(spark, curCodes)
    Compaction.deleteDir(spark, curVecs)
    spark.catalog.refreshByPath(dir)
    e + 1
  }

  /** [[compactIvfIndexIfNeeded]] for the PQ layout (thresholds on the
    * codes store's batch count; codes and vectors always compact
    * together).
    */
  def compactIvfIndexPQIfNeeded(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxBatches: Int): Option[Int] =
    if (Compaction.batchCount(spark, dir, "codes") > maxBatches)
      Some(compactIvfIndexPQ(spark, dir))
    else None

  /** [[deleteFromIvfIndex]] for the PQ layout: the anti-join rewrite
    * applied to BOTH stores — the deleted vectors' CODES and their RAW
    * vectors must go (the refine store holds the actual embeddings; a
    * codes-only delete would leave the data recoverable) — under one
    * atomic epoch swap. Centroids and codebooks stay frozen; the vectors
    * store re-sorts globally by vec_id like [[compactIvfIndexPQ]], so the
    * refine fetch keeps tight row-group pruning. Same replay-horizon
    * contract and cost envelope as compaction.
    *
    * @param ids one column `vec_id`
    * @return the new epoch number
    */
  def deleteFromIvfIndexPQ(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame): Int = {
    val del = ids.select(col("vec_id"))
    val e = Compaction.currentEpoch(spark, dir)
    val curCodes = Compaction.epochPath(dir, "codes", e)
    val curVecs = Compaction.epochPath(dir, "vectors", e)
    // writePartitioned: delete-everything must leave a readable codes dir.
    // Schema-preserving anti-join (drop only batch) — the residual
    // layout's n2x column survives deletion like every other column
    val curCodesDf = spark.read.parquet(curCodes)
    Compaction.writePartitioned(
      curCodesDf
        .join(del, Seq("vec_id"), "left_anti")
        .select(curCodesDf.columns.filter(_ != "batch").map(col): _*)
        .repartition(col("cell")),
      "cell", s"${Compaction.epochPath(dir, "codes", e + 1)}/batch=0")
    spark.read.parquet(curVecs)
      .join(del, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${Compaction.epochPath(dir, "vectors", e + 1)}/batch=0")
    Compaction.advanceEpoch(spark, dir, e + 1)
    Compaction.deleteDir(spark, curCodes)
    Compaction.deleteDir(spark, curVecs)
    spark.catalog.refreshByPath(dir)
    e + 1
  }

  /** The stored dim permutation from a meta row — None (identity) for
    * indexes written before the perm column existed, or with an empty one.
    */
  private def metaPerm(meta: org.apache.spark.sql.Row): Option[Array[Int]] =
    if (!meta.schema.fieldNames.contains("perm")) None
    else Option(meta.getAs[scala.collection.Seq[Int]]("perm"))
      .filter(_.nonEmpty).map(_.toArray)

  /** Driver-side codebook materialization: cb(m)(code) = cvec. A bounded
    * model artifact (M·nCodes rows), the q157-merge-table pattern.
    */
  private def collectCodebooks(cbDf: DataFrame, mSub: Int,
      nCodes: Int): Array[Array[Array[Float]]] = {
    val out = Array.ofDim[Array[Float]](mSub, nCodes)
    val rows = cbDf.collect()
    // the load-time twin of the pqCodebooks init guard: a stored codebook
    // that disagrees with meta's (m_sub, n_codes) would mis-stride every
    // ADC LUT — validate the full (m, code) grid is present
    require(rows.length == mSub * nCodes,
      s"codebook has ${rows.length} rows, meta says ${mSub * nCodes} " +
        s"(m_sub=$mSub × n_codes=$nCodes) — corrupt or mismatched index")
    rows.foreach { r =>
      out(r.getAs[Int]("m"))(r.getAs[Int]("code")) =
        r.getAs[scala.collection.Seq[Float]]("cvec").toArray
    }
    require(out.forall(_.forall(_ != null)),
      "codebook rows do not cover the full (m, code) grid")
    out
  }

  /** Probe a [[writeIvfIndexPQ]] index: ADC scoring over the pruned codes
    * scan, exact cosine re-rank of a bounded shortlist.
    *
    *  1. The query batch's probed cells come from the stored coarse
    *     centroids (as [[ivfTopKAgainstIndex]]); the codes scan is
    *     dynamically partition-pruned to those cells (plan-pinned).
    *  2. Each query precomputes its ADC lookup tables against the
    *     broadcast codebooks — per (m, code): dot(q_m, c_{m,code}) and
    *     ‖c_{m,code}‖²; M·nCodes rows per query, tiny. A candidate's
    *     approximate cosine is then two [[graft.functions.PqAdcExpr]]
    *     folds over its codes: Σdot / (‖q‖·√Σn²).
    *  3. The top `shortlist` candidates per query (bounded TopKByScore)
    *     fetch their FULL vectors from the sorted `vectors/` store and are
    *     re-ranked with the exact rounded cosine, same arithmetic as
    *     [[ivfTopK]]. The fetch is two-path: up to `inListMax` distinct
    *     ids collect driver-side and push down as an In filter (row-group
    *     stats keep serving fetches shortlist-local); past the cap — an
    *     offline rerank over a large query set, where |Q|·shortlist would
    *     OOM the driver — the id set semi-joins the store distributed,
    *     trading row-group pruning for unbounded |Q| (spec-pinned
    *     identical output on both paths).
    *
    * Recall vs the raw-list probe is bounded by the same nProbe cell
    * choice; the shortlist only loses candidates ADC misranks past
    * position `shortlist` (spec-pinned floor).
    */
  def ivfTopKAgainstIndexPQ(queries: DataFrame, dir: String, nProbe: Int,
      k: Int, shortlist: Int = 50,
      inListMax: Int = DefaultInListMax): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (mSub, nCodes, subDim) =
      (meta.getAs[Int]("m_sub"), meta.getAs[Int]("n_codes"), meta.getAs[Int]("sub_dim"))
    // resolve the epoch pointer first (the [[compactIvfIndexPQ]] snapshot
    // commit); epoch 0 = the build layout
    val epoch = Compaction.currentEpoch(spark, dir)
    val codes = spark.read.parquet(Compaction.epochPath(dir, "codes", epoch))
    val cbRows = spark.read.parquet(s"$dir/codebooks")
    // stride guard (the collectCodebooks check, probe-side): PqAdcExpr
    // indexes lut[m·nCodes + code], so a codebook short of meta's grid
    // would read past the LUT's end — silently wrong scores, not an error.
    // The count is ONE parquet-metadata job per (dir, grid) per session,
    // not per probe: codebooks are frozen at build (ingest/compact/delete
    // never touch them), so the first probe validates and later probes
    // hit the cache; a same-session rebuild re-keys via (mSub, nCodes)
    // or is invalidated by [[writeIvfIndexPQ]].
    val cbFp = artifactFingerprint(spark, s"$dir/codebooks")
    if (!cbGridOk.contains((dir, mSub, nCodes, cbFp))) {
      require(cbRows.count() == mSub.toLong * nCodes,
        s"codebook rows != m_sub×n_codes ($mSub×$nCodes) at $dir — " +
          "corrupt or mismatched index")
      cbGridOk.add((dir, mSub, nCodes, cbFp))
    }
    // per-query ADC lookup tables, indexed lut[m·nCodes + code]; the LUT
    // dot-products run in the PERMUTED coordinate space the codes were
    // encoded in (identity for indexes built without permuteDims) — the
    // query norm is permutation-invariant and stays on q_vec
    val luts = queries
      .withColumn("__qp", permuteVec(col("q_vec"), metaPerm(meta)))
      .crossJoin(broadcast(cbRows))
      .select(col("q_id"), col("q_vec"), col("m"), col("code"),
        expr(s"""aggregate(zip_with(slice(__qp, m * $subDim + 1, $subDim), cvec,
                 (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               0D, (a, v) -> a + v)""").as("d"),
        expr("""aggregate(cvec, 0D,
               (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""").as("n2"))
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("code"), col("d"), col("n2")))).as("e"),
        first(col("q_vec")).as("q_vec"))
      .select(col("q_id"), col("q_vec"),
        transform(col("e"), x => x.getField("d")).as("lut"),
        transform(col("e"), x => x.getField("n2")).as("n2lut"),
        sqrt(expr(
          "aggregate(q_vec, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
          .as("qn"))
      .persistScoped() // feeds the ADC scan AND the exact-rerank join
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
      .withColumn("cell", col("cell").cast("int"))
      .select(col("q_id"), col("cell"))
      .join(luts, Seq("q_id"))
    // rounded to 4 dp before ranking (the house determinism discipline):
    // every input is a fixed-order double fold, so any engine replaying
    // the same arithmetic ranks the same shortlist — q168 hash-gates this
    val adc = round(
      graft.functions.pq_adc(col("codes"), col("lut"), nCodes) /
        (col("qn") * sqrt(graft.functions.pq_adc(col("codes"), col("n2lut"), nCodes))),
      4)
    val short = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", adc)
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("adc"), col("vec_id"), shortlist).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("vec_id"))
      .persistScoped() // feeds the id fetch AND the exact-rerank join —
      // the pruned ADC scan is the probe's dominant stage; never run it twice
    val idsDf = short.select(col("vec_id")).distinct()
    // SERVING path: the id list is bounded (≤ |Q|·shortlist), so it
    // collects driver-side and pushes down as an In filter — parquet
    // row-group stats keep the fetch shortlist-local. The collect is
    // size-GUARDED (limit inListMax+1 on the persisted shortlist): an
    // OFFLINE rerank over a huge query set would OOM the driver and
    // produce an unplannable In list, so past the cap the fetch falls back
    // to a semi-join of the id set against the sorted vectors store —
    // fully distributed, losing only row-group pruning on that path.
    val capped = idsDf.limit(inListMax + 1).collect()
    val vecStore = spark.read.parquet(Compaction.epochPath(dir, "vectors", epoch))
    val raw =
      if (capped.length <= inListMax)
        vecStore.filter(col("vec_id").isin(capped.map(_.getLong(0)).toSeq: _*))
          .select(col("vec_id"), col("embedding"))
      else
        vecStore.join(idsDf, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding"))
    val rescored = short.join(raw, Seq("vec_id"))
      .join(broadcast(luts.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(rescored, k)
  }

  /** Build a STORED residual IVF-PQ index ([[pqResidualTopK]]'s layout —
    * build once, probe forever): `centroids/` (raw float), `codebooks/`
    * (RESIDUAL-trained, stored as DOUBLE arrays so the reader type is
    * fixed whether trained or training-free), `meta/`,
    * `codes/batch=0/cell=…` carrying (vec_id, codes, n2x) — the EXACT
    * per-vector norm rides beside the codes, the FAISS stored-norm
    * column cosine ADC needs — and `vectors/batch=0` for the exact
    * refine. Same batch-versioned, cell-partitioned layout as
    * [[writeIvfIndexPQ]], so probes DPP-prune identically.
    */
  def writeIvfIndexPQR(corpus: DataFrame, dir: String, nCells: Int,
      mSub: Int, nCodes: Int, trainIters: Int = 0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by mSub $mSub")
    val subDim = dim / mSub
    val cents = centroidsOf(corpus, nCells)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    val centsD = cents.select(col("cent_id"),
      expr("transform(cvec, x -> CAST(x AS DOUBLE))").as("cv"))
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
      .persistScoped()
    val resid = lists
      .join(broadcast(centsD), col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - b)")
          .as("rv"),
        expr("""aggregate(embedding, 0D,
               (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""")
          .as("n2x"))
      .persistScoped()
    val cb0 = resid.filter(col("vec_id") >= nCells) // centroid residuals = 0⃗
      .orderBy(col("vec_id")).limit(nCodes)
      .select(col("vec_id"), col("rv"))
      .withColumn("code", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
      .select(explode(expr(s"sequence(0, ${mSub - 1})")).as("m"), col("code"),
        expr(s"slice(rv, m * $subDim + 1, $subDim)").as("cvec"))
      .localCheckpoint()
    require(cb0.count() == mSub.toLong * nCodes,
      s"residual-PQ codebook init needs >= $nCodes non-centroid vectors")
    val sub = resid.select(col("vec_id"),
      explode(expr(s"sequence(0, ${mSub - 1})")).as("m"),
      expr(s"slice(rv, m * $subDim + 1, $subDim)").as("sv"))
    val cb = pqLloyd(sub, cb0, trainIters)
    cb.select(col("m"), col("code"),
      expr("transform(cvec, x -> CAST(x AS DOUBLE))").as("cvec"))
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    cbGridOk.removeIf(_._1 == dir)
    Seq((mSub, nCodes, subDim)).toDF("m_sub", "n_codes", "sub_dim")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val codes = pqAssign(sub, cb)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("code")))).as("e"))
      .select(col("vec_id"),
        expr("transform(e, x -> CAST(x.code AS INT))").as("codes"))
    codes.join(resid.select(col("vec_id"), col("cell"), col("n2x")),
        Seq("vec_id"))
      .select(col("vec_id"), col("codes"), col("n2x"),
        col("cell").cast("int").as("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes/batch=0")
    corpus.select(col("vec_id"), col("embedding"))
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/vectors/batch=0")
    spark.catalog.refreshByPath(dir)
  }

  /** Replay-safe incremental ingestion into a [[writeIvfIndexPQR]] index:
    * the batch assigns against the FROZEN stored centroids, takes its
    * residuals against them, and encodes against the FROZEN stored
    * residual codebooks (both broadcast — the quantizer contract of
    * [[ingestIntoIvfIndexPQ]] at the residual level), computing each
    * vector's EXACT norm at encode time; then OVERWRITES its own batch
    * partitions, so a crash-replayed batch converges to identical index
    * contents. Compaction and deletion are the PQ layout's own
    * ([[compactIvfIndexPQ]]/[[deleteFromIvfIndexPQ]] — schema-preserving,
    * so the n2x column rides through both).
    */
  def ingestIntoIvfIndexPQR(newVectors: DataFrame, dir: String,
      batchId: Long): Unit = {
    require(batchId >= 1, s"batch 0 is the build (got $batchId)")
    val spark = newVectors.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (mSub, nCodes, subDim) =
      (meta.getAs[Int]("m_sub"), meta.getAs[Int]("n_codes"), meta.getAs[Int]("sub_dim"))
    val cbRows = spark.read.parquet(s"$dir/codebooks")
    require(cbRows.count() == mSub.toLong * nCodes,
      s"codebook rows != m_sub×n_codes ($mSub×$nCodes) at $dir")
    val e = Compaction.currentEpoch(spark, dir)
    val centsD = cents.select(col("cent_id"),
      expr("transform(cvec, x -> CAST(x AS DOUBLE))").as("cv"))
    val resid = narrowBestCell(newVectors, cents, "vec_id", "embedding")
      .join(broadcast(centsD), col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - b)")
          .as("rv"),
        expr("""aggregate(embedding, 0D,
               (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""")
          .as("n2x"))
    val sub = resid.select(col("vec_id"),
      explode(expr(s"sequence(0, ${mSub - 1})")).as("m"),
      expr(s"slice(rv, m * $subDim + 1, $subDim)").as("sv"))
    pqAssign(sub, cbRows)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("code")))).as("e"))
      .select(col("vec_id"),
        expr("transform(e, x -> CAST(x.code AS INT))").as("codes"))
      .join(resid.select(col("vec_id"), col("cell"), col("n2x")), Seq("vec_id"))
      .select(col("vec_id"), col("codes"), col("n2x"),
        col("cell").cast("int").as("cell"))
      .hint("rebalance", col("cell")) // cell-packed files (see Retrieval.writeBm25Index)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${Compaction.epochPath(dir, "codes", e)}/batch=$batchId")
    newVectors.select(col("vec_id"), col("embedding"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .parquet(s"${Compaction.epochPath(dir, "vectors", e)}/batch=$batchId")
    spark.catalog.refreshByPath(dir)
  }

  /** Probe a [[writeIvfIndexPQR]] index — [[ivfTopKAgainstIndexPQ]]'s
    * probe with the residual decomposition: ADC estimates
    * ⟨q, x⟩ = ⟨q, c(cell)⟩ + Σ_m lut[m·nCodes + codes[m]] (the native
    * [[graft.functions.PqAdcExpr]] fold), normalized by the query norm
    * and the EXACT stored ‖x‖. Identical output to [[pqResidualTopK]]
    * over the indexed corpus (the stored ≡ direct contract, hash-gated).
    */
  def ivfTopKAgainstIndexPQR(queries: DataFrame, dir: String, nProbe: Int,
      k: Int, shortlist: Int = 50,
      inListMax: Int = DefaultInListMax): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$dir/centroids")
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (mSub, nCodes, subDim) =
      (meta.getAs[Int]("m_sub"), meta.getAs[Int]("n_codes"), meta.getAs[Int]("sub_dim"))
    val epoch = Compaction.currentEpoch(spark, dir)
    val codes = spark.read.parquet(Compaction.epochPath(dir, "codes", epoch))
    val cbRows = spark.read.parquet(s"$dir/codebooks")
    val cbFp = artifactFingerprint(spark, s"$dir/codebooks")
    if (!cbGridOk.contains((dir, mSub, nCodes, cbFp))) {
      require(cbRows.count() == mSub.toLong * nCodes,
        s"codebook rows != m_sub×n_codes ($mSub×$nCodes) at $dir — " +
          "corrupt or mismatched index")
      cbGridOk.add((dir, mSub, nCodes, cbFp))
    }
    val luts = queries
      .crossJoin(broadcast(cbRows))
      .select(col("q_id"), col("q_vec"), col("m"), col("code"),
        expr(s"""aggregate(zip_with(slice(q_vec, m * $subDim + 1, $subDim), cvec,
                 (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)""")
          .as("d"))
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("code"), col("d")))).as("e"),
        first(col("q_vec")).as("q_vec"))
      .select(col("q_id"), col("q_vec"),
        transform(col("e"), x => x.getField("d")).as("lut"),
        sqrt(expr(
          "aggregate(q_vec, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
          .as("qn"))
      .persistScoped() // feeds the ADC scan AND the exact-rerank join
    val centsD = cents.select(col("cent_id"),
      expr("transform(cvec, x -> CAST(x AS DOUBLE))").as("cv"))
    val probes = bestCells(queries, cents, "q_id", "q_vec", nProbe)
      .withColumn("cell", col("cell").cast("int"))
      .join(broadcast(centsD), col("cell") === col("cent_id"))
      .select(col("q_id"), col("cell"),
        expr("aggregate(zip_with(q_vec, cv, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, v) -> a + v)")
          .as("qc"))
      .join(luts, Seq("q_id"))
    val adc = round(
      (col("qc") + graft.functions.pq_adc(col("codes"), col("lut"), nCodes)) /
        (col("qn") * sqrt(col("n2x"))),
      4)
    val short = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("adc", adc)
      .groupBy(col("q_id"))
      .agg(graft.functions.topk_by_score(col("adc"), col("vec_id"), shortlist).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("vec_id"))
      .persistScoped() // feeds the id fetch AND the exact-rerank join
    val idsDf = short.select(col("vec_id")).distinct()
    val capped = idsDf.limit(inListMax + 1).collect()
    val vecStore = spark.read.parquet(Compaction.epochPath(dir, "vectors", epoch))
    val raw =
      if (capped.length <= inListMax)
        vecStore.filter(col("vec_id").isin(capped.map(_.getLong(0)).toSeq: _*))
          .select(col("vec_id"), col("embedding"))
      else
        vecStore.join(idsDf, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding"))
    val rescored = short.join(raw, Seq("vec_id"))
      .join(broadcast(luts.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("embedding")), 4))
    rankTopK(rescored, k)
  }

  /** Pairwise cosine similarity of per-GROUP embedding centroids — the
    * domain-similarity map mixture design reads (which sources are
    * near-duplicates in embedding space, which are distinct — the DoReMi
    * / data-mixing diagnostic): mean vector per group, cosine over all
    * unordered group pairs (diagonal included, ≡ 1).
    *
    * Determinism: a distributed float mean is partial-sum-order
    * nondeterministic, so each component INTEGERIZES first —
    * floor(x·2^scaleBits) is EXACT in double for float32 inputs and
    * floor/cast agree across engines where round-half rules do not; the
    * per-dimension sums are then order-free BIGINT sums, and the
    * centroid components divide back to doubles deterministically. The
    * pair cosine folds the dimension arrays in index order (one
    * zip_with/aggregate chain) — bit-replayable by any engine.
    *
    * 100 TB posture: ONE explode + partial-aggregated (group × dim)
    * integer shuffle (map-side combine shrinks each partition to
    * |groups|·dim rows); the centroid table is |groups| rows and
    * broadcasts into its own |groups|² cross — driver never holds
    * vectors, the corpus never shuffles raw embeddings.
    *
    * @return (g_a, g_b, n_a, n_b, cos_sim) for every pair g_a ≤ g_b
    */
  def groupCentroidCosine(df: DataFrame, group: Column, vec: Column,
      scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 30)
    val scale = (1L << scaleBits).toDouble
    val sums = df.select(group.cast("string").as("g"), vec.as("__v"))
      .select(col("g"), posexplode(col("__v")).as(Seq("d", "x")))
      .groupBy(col("g"), col("d"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * scale).cast("long")).as("sx"))
    val cents = sums
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        sort_array(collect_list(struct(col("d"),
          (col("sx").cast("double") / (col("n") * scale)).as("c")))).as("cs"))
      .select(col("g"), col("n"), expr("transform(cs, z -> z.c)").as("cv"))
    val a = cents.select(col("g").as("g_a"), col("n").as("n_a"),
      col("cv").as("va"))
    val b = cents.select(col("g").as("g_b"), col("n").as("n_b"),
      col("cv").as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("g_a") <= col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(expr(
          """aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
            | / (sqrt(aggregate(va, 0D, (acc, v) -> acc + v * v))
            |    * sqrt(aggregate(vb, 0D, (acc, v) -> acc + v * v)))""".stripMargin),
          4).as("cos_sim"))
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
    val lists = narrowBestCell(corpus, cents, "vec_id", "embedding")
      .persistScoped()
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

  /** Cross-cell recall variant of [[semanticDedup]]: each vector enters
    * its top-`nAssign` (default 2) cells during CANDIDATE GENERATION, so a
    * near-dup pair straddling a cell boundary — each vector's best cell is
    * the other's runner-up — is still witnessed in a shared cell. This is
    * the knob for the published SemDeDup trade (cross-cell misses by
    * design): candidate rows grow ≤ nAssign× and pair count ≤ nAssign²×,
    * still Σ|cell|²-bounded — a constant-factor recall/cost dial, not a
    * new asymptotic. The drop set is `distinct`ed (already so in the base
    * form) because a pair can now collide in up to nAssign shared cells.
    * Candidate generation reuses the [[bestCells]] top-k aggregate — the
    * exact machinery probes already use; nAssign = 1 IS [[semanticDedup]].
    */
  def semanticDedupMultiCell(corpus: DataFrame, nCells: Int,
      threshold: Double, nAssign: Int = 2): DataFrame = {
    require(nAssign >= 1)
    val cents = centroidsOf(corpus, nCells)
    val lists = bestCells(corpus, cents, "vec_id", "embedding", nAssign)
      .persistScoped()
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

  /** Scale-capped semantic dedup — [[semanticDedup]] with the cell
    * population kept corpus-proportional and bounded, so the in-cell
    * self-join's Σ|cell|² pair count cannot degenerate toward n² no
    * matter the corpus size or skew. A FIXED cell count is quadratic at
    * scale (cells grow ∝ n); the published SemDeDup uses ~10⁵ clusters
    * precisely so cells stay bounded — this is that knob, automated:
    *
    *  1. **Exact collapse**: identical embeddings are deduped first with
    *     one hash aggregate (keep min id). Parity-preserving — every
    *     dropped copy has cosine 1 to a lower-id vector, and any pair the
    *     copy could witness is witnessed by its representative — and it
    *     removes the worst skew source (the same vector repeated 10⁹×)
    *     BEFORE any cell can absorb it.
    *  2. **Corpus-proportional cells**: nCells = ⌈n / targetCellSize⌉ from
    *     one count of the collapsed corpus; centroids = the nCells
    *     smallest-id representatives (deterministic, training-free).
    *  3. **Split oversized cells semantically**: any cell above the cap
    *     (4 × targetCellSize) is re-quantized against `fanout` sub-
    *     centroids drawn from its own members (smallest ids, via the
    *     bounded top-k aggregate — no window), one hash join on the cell
    *     key. AQE can redistribute a hot cell's JOIN but cannot shrink its
    *     pair count — only splitting the cell does.
    *  4. **Salt the residue**: a cell still above the cap after splitting
    *     (near-identical but distinct vectors that tie on every
    *     sub-centroid) is sliced by deterministic id-hash into
    *     ⌈size/target⌉ slices. This caps the pair count unconditionally;
    *     slicing such a cell loses only cross-slice pairs inside a region
    *     the quantizer could not resolve — the documented approximate-
    *     recall tradeoff SemDeDup already makes cross-cell.
    *
    * In-cell dedup then runs exactly as [[semanticDedup]]: drop any
    * vector with cosine ≥ threshold to a lower-id vector in its final
    * cell. Output: surviving vec_ids.
    *
    * `nAssign` is the [[semanticDedupMultiCell]] cross-cell recall knob
    * composed onto the capped form: each representative enters its top-n
    * cells during step-2 candidate generation, so boundary-straddling
    * near-dup pairs are witnessed in a shared cell. Candidate rows grow
    * ≤ nAssign× and the per-cell cap still bounds every cell (the split
    * and salt stages operate on final per-cell populations, assignments
    * included), so the Σ|cell|² pair bound scales by the same constant —
    * a recall/cost dial, not a new asymptotic.
    */
  def semanticDedupCapped(corpus: DataFrame, targetCellSize: Int,
      threshold: Double, fanout: Int = 16, nAssign: Int = 1): DataFrame = {
    // the assignment feeds both sides of the self-join — persist, or the
    // whole quantize/split pipeline runs twice
    val cells = cappedCells(corpus, targetCellSize, fanout, nAssign)
      .persistScoped()
    val drops = cells.as("x")
      .join(cells.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(round(cosine(col("x.embedding"), col("y.embedding")), 4)
        >= threshold)
      .select(col("y.vec_id").as("drop_id"))
      .distinct()
    // survivors = corpus minus exact-collapse drops minus in-cell drops;
    // the semi-join against the (already persisted) assignment covers the
    // former — non-representatives never entered a cell
    corpus.join(cells.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .join(drops, col("vec_id") === col("drop_id"), "left_anti")
      .select(col("vec_id"))
  }

  /** One representative (min id) per distinct embedding — step 1 of
    * [[semanticDedupCapped]]. One hash aggregate, partial min.
    */
  private def repsOf(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"), col("embedding"))

  /** Bounded cell assignment (vec_id, embedding, cell:string) for the
    * collapsed corpus — steps 2–4 of [[semanticDedupCapped]]. Exposed for
    * the SimilaritySpec invariant that no cell exceeds the cap.
    */
  private[operators] def cappedCells(corpus: DataFrame, targetCellSize: Int,
      fanout: Int = 16, nAssign: Int = 1): DataFrame = {
    require(targetCellSize > 0)
    require(nAssign >= 1)
    val cap = 4L * targetCellSize
    val reps = repsOf(corpus).persistScoped()
    // ONE driver-side count to size the quantizer — the same setup-time
    // action any IVF build performs; never a per-row collect.
    val n = reps.count()
    val nCells = ((n + targetCellSize - 1) / targetCellSize).max(1L).toInt
    val cents = reps.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    // top-nAssign of fewer-than-nAssign cells is simply all of them — the
    // bounded aggregate and the oracle's crn <= n agree without a special
    // case
    val assigned = bestCells(reps, cents, "vec_id", "embedding", nAssign)
      .withColumn("cell", col("cell").cast("string"))
      .persistScoped()
    // -- step 3: semantic sub-split of over-cap cells ----------------------
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("sz"))
    val overCells = sizes.filter(col("sz") > cap).select(col("cell"))
    // short-circuit the common case: proportional sizing keeps cells near
    // the target, so most corpora have NO over-cap cell — one scalar
    // action on the tiny per-cell size table skips two joins, a union and
    // the salt pass entirely (steps 3-4 are no-ops on an empty overCells
    // set either way; this just prunes them from the plan)
    if (overCells.isEmpty) return assigned
    val over = assigned.join(overCells, Seq("cell"), "left_semi").persistScoped()
    val ok = assigned.join(overCells, Seq("cell"), "left_anti")
    // fanout smallest-id members per oversized cell = its sub-centroids;
    // bounded top-k aggregate (score = -id ranks ascending), never a window
    val subIds = over.groupBy(col("cell"))
      .agg(graft.functions.topk_by_score(
        -col("vec_id").cast("double"), col("vec_id"), fanout).as("top"))
      .select(col("cell"), explode(col("top.id")).as("cent_id"))
    val subCents = subIds.join(
        over.select(col("cell"), col("vec_id").as("cent_id"), col("embedding").as("cvec")),
        Seq("cell", "cent_id"))
    // re-quantize members against their OWN cell's sub-centroids: hash
    // join on the cell key (≤ fanout candidates per member), then the
    // bounded top-1 pick — same determinism as bestCells (score desc,
    // cent_id asc)
    val resplit = over.join(subCents, Seq("cell"))
      .withColumn("cscore", round(cosine(col("embedding"), col("cvec")), 4))
      .groupBy(col("cell"), col("vec_id"))
      .agg(
        graft.functions.topk_by_score(col("cscore"), col("cent_id"), 1).as("top"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        concat_ws("_", col("cell"), col("top.id").getItem(0)).as("cell"))
    val afterSplit = ok.select(col("vec_id"), col("embedding"), col("cell"))
      .unionByName(resplit)
    // -- step 4: id-hash salt for cells the split could not separate -------
    val sizes2 = afterSplit.groupBy(col("cell")).agg(count(lit(1)).as("sz"))
    val salted = afterSplit
      .join(sizes2, Seq("cell"))
      .withColumn("cell",
        when(col("sz") > cap,
          concat_ws("#", col("cell"),
            pmod(graft.operators.Dedup.SharedHash.hash28(col("vec_id").cast("string")),
              ceil(col("sz") / lit(targetCellSize.toDouble)).cast("long"))))
          .otherwise(col("cell")))
      .select(col("vec_id"), col("embedding"), col("cell"))
    salted
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
