package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}
import graft.operators.{Compaction, Retrieval}

/** Temporary diagnostic: per-stage wall times of the BM25 stored-index
  * probe path (round-16 optimization round). Not part of any contract.
  */
object ProbeDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "probediag")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        }
      })
    def timed[A](label: String)(f: => A): A = {
      val (j0, s0, m0) = (jobs.get, stages.get, taskMs.get)
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d taskTime=${(taskMs.get - m0) / 1e3}%7.2f s")
      r
    }
    // cache path embeds the data dir's basename + a path hash (the
    // cachedIndexDir discipline): rerunning after changing
    // SPARK_GRAFT_SF_DIR must not silently probe a stale index built
    // from different data
    val dirTag = new java.io.File(dir).getName + "_" +
      Integer.toHexString(dir.hashCode)
    val idx = sys.env.getOrElse("SPARK_GRAFT_DIAG_IDX",
      s"${System.getProperty("java.io.tmpdir")}/diag_bm25_$dirTag")
    // build once (outside the timed probes)
    val tf = graft.Fanout(t.documents)
      .select(col("doc_id").as("id"),
        expr("filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("id"), (size(col("ws")) - 1).cast("long").as("dl"),
        explode(expr(
          "transform(sequence(1, size(ws) - 1, 1), i -> concat(ws[i - 1], ' ', ws[i]))"))
          .as("term"))
      .groupBy(col("id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    if (!new java.io.File(idx).isDirectory)
      timed("build index")(Retrieval.writeBm25Index(tf, idx, 64))
    val seeds = t.documents.filter(col("doc_id") < 4)
      .select(col("doc_id").as("id"), col("text"))
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      timed("bigramTf.count") {
        tf.write.format("noop").mode("overwrite").save()
      }
      val sq = timed("seedQueriesAgainstIndex (collect)") {
        Retrieval.seedQueriesAgainstIndex(seeds, idx, 3).collect()
      }
      timed("  seeds.collect") { seeds.collect() }
      val stf = seeds
        .select(col("id"), expr(
          "filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("id"), explode(expr(
          "transform(sequence(1, size(ws) - 1, 1), i -> concat(ws[i - 1], ' ', ws[i]))"))
          .as("term"))
        .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      timed("  seed tf.collect") { stf.collect() }
      val qt = stf.select(col("term")).distinct()
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(64L)).cast("int"))
      val qtb = timed("  qt bucket collect") {
        qt.select(col("bucket")).distinct().collect().map(_.getInt(0)).sorted
      }
      val lists0 = spark.read.parquet(s"$idx/lists")
      timed("  pruned lists scan count") {
        lists0.filter(col("bucket").isin(qtb.map(Int.box): _*))
          .write.format("noop").mode("overwrite").save()
      }
      timed("  dfq collect") {
        lists0.filter(col("bucket").isin(qtb.map(Int.box): _*))
          .join(broadcast(qt), Seq("bucket", "term"))
          .groupBy(col("term")).agg(count_distinct(col("id")).as("df"))
          .collect()
      }
      timed("meta head") {
        spark.read.parquet(s"$idx/meta").head()
      }
      timed("currentEpoch") {
        Compaction.currentEpoch(spark, idx)
      }
      timed("stats agg head") {
        spark.read.parquet(Compaction.epochPath(idx, "stats", 0))
          .agg(sum(col("n_docs"))).head()
      }
      val sqDf = spark.createDataFrame(
        spark.sparkContext.parallelize(sq.toIndexedSeq),
        Retrieval.seedQueriesAgainstIndex(seeds, idx, 3).schema)
      timed("bm25AgainstIndex probe (noop)") {
        Retrieval.bm25AgainstIndex(sqDf, idx, 10, 1.2, 0.75,
          excludeSelf = true)
          .write.format("noop").mode("overwrite").save()
      }
      timed("full q154-shape (noop)") {
        Retrieval.bm25AgainstIndex(
          Retrieval.seedQueriesAgainstIndex(seeds, idx, 3), idx, 10, 1.2,
          0.75, excludeSelf = true)
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheScope.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
