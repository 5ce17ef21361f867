package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}

/** Temporary diagnostic: per-stage wall times of the composed curation
  * flagship (q238 shape, same constants) — round-16 optimization round
  * instrumentation. Stage params mirror Pipeline's q238; the langid model
  * trains into its own diag dir so the cached flagship artifact is
  * untouched.
  */
object FlagDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "flagdiag")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
      })
    def timed[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs.get, taskMs.get)
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs=${jobs.get - j0}%3d taskTime=${(taskMs.get - m0) / 1e3}%7.2f s")
      r
    }
    import graft.operators.{Curation, Dedup, TextOps}
    val gopher = TextOps.GopherRules(minWords = 20L,
      maxWords = 100000L, minMeanWordLen = 3L, maxMeanWordLen = 10L,
      symbolTau = 1000L, bulletTau = 9000L, ellipsisTau = 3000L,
      dupLineTau = 3000L, dupCharTau = 2000L)
    // cache path embeds the data dir (the cachedIndexDir discipline): a
    // rerun after changing SPARK_GRAFT_SF_DIR must retrain, not silently
    // score against a model built from different data
    val mdir = s"${System.getProperty("java.io.tmpdir")}/diag_langid_" +
      new java.io.File(dir).getName + "_" + Integer.toHexString(dir.hashCode)
    if (!new java.io.File(mdir).isDirectory) {
      timed("langid train+gate (one-time)") {
        TextOps.writeLangIdModel(spark,
          TextOps.trainHashedLangId(graft.Fanout(t.documents), col("doc_id"),
            col("text"), col("lang"), 512, 12, 1L, 2L), mdir)
        TextOps.writeLangIdGate(graft.Fanout(t.documents), col("doc_id"),
          col("text"), mdir, 0.05, mdir)
      }
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val keptIds = timed("tagger pass (lazy)") {
        TextOps.taggerTable(graft.Fanout(t.documents),
            col("doc_id"), col("text"), Seq("slow", "dup", "stale"), 400L,
            2L, 0.12, 0.06, 0.35, 0.02, gopher)
          .filter(col("kept")).select(col("id").as("doc_id"))
      }
      val tau = timed("langid tau load") {
        TextOps.loadLangIdGateTau(spark, mdir)
      }
      val scored = timed("langid score + checkpoint") {
        TextOps.langIdScoreAgainstModel(
          graft.Fanout(t.documents), col("doc_id"), col("text"), mdir)
          .localCheckpoint()
      }
      val langKept = scored.filter(col("score") >= tau)
        .select(col("id").as("doc_id"))
      val docs0 = graft.Fanout(t.documents)
        .join(keptIds, Seq("doc_id"), "left_semi")
        .join(langKept, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("text"))
      val survivors = timed("tagger+gate+dedup -> checkpoint") {
        docs0.join(Dedup.dedupCorpus(
            docs0.select(col("doc_id").as("id"), col("text")),
            3, 64, 16, 0.8).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi")
          .localCheckpoint()
      }
      val merges = timed("byte-BPE trainer (8 rounds)") {
        TextOps.bpeMergesByteLevel(survivors, col("text"), 8,
          requireFull = true)
          .orderBy(col("merge_round"))
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      }
      val vocab = TextOps.bpeVocabIdsByteLevel(merges)
      timed("tokenize + pack OLD 2x-regex (noop)") {
        val dw = survivors.select(col("source"), col("doc_id"),
          posexplode(regexp_extract_all(lower(col("text")),
            lit(TextOps.byteLevelTokenPattern), lit(0))).as(Seq("pos", "w")))
        val wt = dw.select(col("w")).distinct()
          .select(col("w"),
            graft.functions.bpe_encode(col("w"), merges, byteLevel = true)
              .as("toks"))
        val dt = dw.join(wt, Seq("w"))
          .groupBy(col("source"), col("doc_id"))
          .agg(expr(
            "flatten(transform(sort_array(collect_list(struct(pos, toks))), x -> x.toks))")
            .as("toks"))
        Curation.packShardIdsSep(dt, col("source"),
          col("doc_id"), col("toks"), vocab, 256L + 8L, 1000L,
          partitions = 32)
          .write.format("noop").mode("overwrite").save()
      }
      timed("tokenize + pack NEW persist (noop)") {
        import graft.CacheScope.ScopedPersist
        val words = survivors.select(col("source"), col("doc_id"),
          regexp_extract_all(lower(col("text")),
            lit(TextOps.byteLevelTokenPattern), lit(0)).as("ws"))
          .persistScoped()
        val dw = words.select(col("source"), col("doc_id"),
          posexplode(col("ws")).as(Seq("pos", "w")))
        val wt = dw.select(col("w")).distinct()
          .select(col("w"),
            graft.functions.bpe_encode(col("w"), merges, byteLevel = true)
              .as("toks"))
        val dt = dw.join(wt, Seq("w"))
          .groupBy(col("source"), col("doc_id"))
          .agg(expr(
            "flatten(transform(sort_array(collect_list(struct(pos, toks))), x -> x.toks))")
            .as("toks"))
        Curation.packShardIdsSep(dt, col("source"),
          col("doc_id"), col("toks"), vocab, 256L + 8L, 1000L,
          partitions = 32)
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheScope.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
