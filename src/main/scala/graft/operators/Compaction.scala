package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}

/** Small-files compaction — the table-maintenance operator every long-lived
  * 100 TB dataset needs: streaming sinks, per-batch ingests and
  * over-parallel writers leave thousands of KB-sized parquet files whose
  * per-file open/footer cost dominates scan time and whose listing cost
  * dominates planning.
  *
  * The reference's closest shape is the split-grouping its inputs do at
  * READ time (grouping many small splits into one task,
  * tez-mapreduce/src/main/java/org/apache/tez/mapreduce/grouper/TezSplitGrouper.java:206);
  * compaction is the write-side fix that makes every later read cheap
  * instead of re-grouping per query.
  */
object Compaction {

  // ===== epoch pointer for batch-versioned index layouts ==================
  // The replay-safe index layouts (Similarity.writeIvfIndexVersioned,
  // Retrieval.writeBm25IndexVersioned) grow one `batch=<id>` directory per
  // ingest forever; at production cadence thousands of batch dirs make
  // every probe's file listing the bottleneck (measured ~2× probe file-open
  // overhead with just TWO batches at sf0.1 — BENCH_LOCAL.md round 8).
  // Compaction rewrites all batches into ONE consolidated batch under the
  // NEXT epoch directory and then atomically swaps the `EPOCH` pointer
  // file — the Iceberg-style snapshot-pointer commit: readers resolve the
  // pointer first, so they see either the old complete epoch or the new
  // complete epoch, never a half-written mix. Epoch 0 is the unmarked
  // legacy layout (`<dir>/<name>`), so pre-compaction indexes read
  // unchanged.

  /** Current epoch of a versioned index: the `EPOCH` pointer's value, 0
    * when absent.
    */
  def currentEpoch(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir, "EPOCH")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** Epoch-scoped path of a layout component (`lists`, `stats`):
    * epoch 0 = the unmarked original layout.
    */
  def epochPath(dir: String, name: String, epoch: Int): String =
    if (epoch == 0) s"$dir/$name" else s"$dir/${name}_e$epoch"

  /** Atomically advance the epoch pointer: write `EPOCH.tmp`, rename over
    * `EPOCH` (atomic on posix and HDFS; an object-store deployment swaps a
    * metastore pointer instead). Readers in flight keep their resolved
    * epoch; the caller deletes the old epoch's directories AFTER the swap
    * (immediately here — a production deployment defers by a read-TTL).
    */
  def advanceEpoch(spark: SparkSession, dir: String, epoch: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new Path(dir, "EPOCH.tmp")
    val dst = new Path(dir, "EPOCH")
    val fs = tmp.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(epoch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext rename supports an atomic overwrite, unlike FileSystem
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Number of sealed `batch=<id>` directories in the CURRENT epoch of a
    * versioned index component — the signal the compact-when-needed
    * helpers (compactIvfIndexIfNeeded and siblings) threshold on. Batch
    * directories accrete one per ingest until file listing dominates
    * probe cost; nothing previously decided WHEN to compact. The flat
    * (unversioned) layout has no batch level and reports 0.
    *
    * Consult pattern for streaming ingest drivers: call the family's
    * `compact*IfNeeded(spark, dir, maxBatches)` AFTER the producer's
    * checkpoint has committed the batch (foreachBatch returns → commit),
    * e.g. from a separate maintenance tick — never inside the uncommitted
    * batch itself, or a crash-replay would re-land a batch compaction
    * already folded away (the replay-horizon contract of
    * [[Similarity.compactIvfIndex]]).
    */
  def batchCount(spark: SparkSession, dir: String, name: String): Int = {
    val p = new Path(epochPath(dir, name, currentEpoch(spark, dir)))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** Partitioned overwrite that stays READABLE when `df` is empty: a
    * `partitionBy` write of zero rows emits no part files and no partition
    * directories at all, so a later `spark.read.parquet` of the path fails
    * with "unable to infer schema" — the delete-everything corner of the
    * index-deletion ops. The empty frame writes one schema-carrying empty
    * file (SPARK-23271) under a PARTITION-SHAPED leaf, `<partCol>=0/`,
    * with the partition column dropped from the data — so partition
    * discovery sees the SAME directory depth and the same (int-valued)
    * partition column as a real partitioned write. A bare unpartitioned
    * file here would poison the epoch directory: a later `ingestInto*`
    * lands `batch=N/<partCol>=.../` beside it and every subsequent read
    * fails partition discovery with "Conflicting directory structures".
    * Downstream reads see zero rows either way; equi-joins on the
    * partition column simply match nothing.
    *
    * The partition value must parse as the column's real type — every
    * caller partitions on an int column (cell/bucket/band), for which
    * `0` is a legitimate value of the right type.
    *
    * The emptiness probe is a limit-1 action — it short-circuits at the
    * first surviving row, so the non-empty (i.e. every real) case pays a
    * near-zero peek, not a full pass.
    */
  def writePartitioned(df: org.apache.spark.sql.DataFrame, partCol: String,
      path: String): Unit =
    if (df.isEmpty) {
      // keep the overwrite contract symmetric: a partitionBy overwrite of
      // zero rows touches no existing <partCol>=X directories, so if a
      // non-empty write previously landed here its other partitions would
      // survive and a later read would return stale rows — clear the whole
      // path first, then land the schema-carrying empty leaf
      deleteDir(df.sparkSession, path)
      df.drop(partCol).write.mode("overwrite").parquet(s"$path/$partCol=0")
    } else df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Delete a directory tree (post-swap cleanup of a superseded epoch). */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Number of data files under `dir` (the probe-listing cost compaction
    * exists to cut; ignores _SUCCESS/_metadata and the EPOCH pointer).
    */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val nm = f.getPath.getName
      if (!nm.startsWith("_") && !nm.startsWith("EPOCH")) n += 1
    }
    n
  }

  /** Total bytes of data files under `dir` (ignores _SUCCESS/_metadata). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet dataset at `inDir` into ⌈bytes/targetBytes⌉
    * similarly-sized files at `outDir`; returns the file count chosen.
    *
    * With `sortCols` empty the rewrite is a round-robin `repartition` —
    * perfectly balanced output files, one full shuffle. With `sortCols`
    * given, rows are range-partitioned and sorted on those columns, so the
    * rewritten files carry tight non-overlapping min/max footer stats and
    * later range predicates prune whole files (data-skipping layout — the
    * reason to compact on a filter column rather than round-robin).
    *
    * Sizing note: file count is computed from the INPUT's on-disk bytes, so
    * the target is approximate when recompression changes density — the
    * right behavior for a maintenance job (stable file count, no output
    * double-pass).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[Column] = Nil): Int = {
    require(targetBytes > 0)
    val n = math.max(1L, (dataBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val out =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    out.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Z-order layout rewrite: range-partition + sort the dataset on the
    * Morton interleave of two long filter columns, so every output file's
    * footer carries a tight min/max range on BOTH columns and a predicate
    * on EITHER prunes whole files. A single-column sorted layout
    * ([[compactParquet]] with `sortCols`) skips perfectly on its sort
    * column and not at all on any other; Z-order trades a little skipping
    * on each for real skipping on both — the standard lakehouse layout for
    * two-dimensional access patterns (e.g. corpus queries by (domain hash,
    * crawl date)).
    *
    * The z key is computed by the codegen'd native [[graft.functions.ZValue16Expr]]
    * over the columns' low 16 bits (callers with wider domains bucket
    * first, e.g. `pmod(hash(col), 65536)`); it orders the write only and
    * is not persisted.
    */
  def zOrderParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, colA: String, colB: String): Int = {
    require(targetBytes > 0)
    val n = math.max(1L, (dataBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val z = graft.functions.z_value16(
      org.apache.spark.sql.functions.col(colA).cast("long"),
      org.apache.spark.sql.functions.col(colB).cast("long"))
    df.withColumn("__z", z)
      .repartitionByRange(n, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
