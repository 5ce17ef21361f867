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
