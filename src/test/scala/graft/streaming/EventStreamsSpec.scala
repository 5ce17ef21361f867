package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Compaction
import EventStreams.{Event, Session}

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("windowedCounts: watermark closes windows, late rows beyond it are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventStreams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"), "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(3), "b", 1.0))
      q.processAllAvailable()
      // watermark = 3min - 5min < window[0,10) end -> nothing emitted yet
      assert(spark.table("wc").count() == 0)
      input.addData((ts(16), "a", 1.0)) // watermark -> 11min, closes [0,10)
      q.processAllAvailable()
      input.addData((ts(4), "a", 99.0)) // late beyond watermark: dropped
      q.processAllAvailable()
      val rows = spark.table("wc").orderBy("ws", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(rows == Seq((ts(0), "a", 2L, 3.0), (ts(0), "b", 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions, timeout emits the open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60000L, delay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // base at minute 60: rows at the initial watermark (epoch 0) would be
      // dropped as late before reaching the state function
      input.addData(
        Event(1, ts(60), 7L, "x", 1.0), Event(2, ts(65), 7L, "x", 1.0),
        Event(3, ts(90), 7L, "x", 1.0)) // gap 25min > 10min -> closes first
      q.processAllAvailable()
      input.addData(Event(4, ts(120), 8L, "x", 1.0)) // advances watermark past 100min
      q.processAllAvailable()
      val got = spark.table("sess").as[Session].collect().sortBy(_.session_start.getTime)
      // first session [60, 65+10) with 2 events, closed by the in-batch gap;
      // second session [90, 100) closed by event-time timeout
      assert(got.length >= 1)
      assert(got.head == Session(7L, ts(60), ts(75), 2))
      if (got.length > 1) assert(got(1) == Session(7L, ts(90), ts(100), 1))
    } finally q.stop()
  }

  test("sessionizeNative (session_window agg) matches the batch q38 form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(60), 7L), (2L, ts(65), 7L), (3L, ts(90), 7L), // 7: two sessions
      (4L, ts(62), 8L), (5L, ts(63), 8L)) // 8: one session
    val input = MemoryStream[(Long, Timestamp, Long)]
    val out = EventStreams.sessionizeNative(
      input.toDF().toDF("event_id", "ts", "user_id"),
      gap = "10 minutes", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessnat")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((9L, ts(200), 9L)) // watermark past every session end
      q.processAllAvailable()
      val got = spark.table("sessnat")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      // batch reference: the exact q38 shape over the same rows
      val batch = rows.toDF("event_id", "ts", "user_id")
        .groupBy(org.apache.spark.sql.functions.session_window($"ts", "10 minutes")
          .as("sw"), $"user_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"))
        .select($"user_id", $"sw.start", $"sw.end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got.exists(_._1 == 7L) && got.exists(_._1 == 8L))
      assert(got.count(_._1 == 7L) == 2) // the 25-min gap split user 7
    } finally q.stop()
  }

  test("ohlcBars: struct-min/max open/close match the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(61), 7L, 10.0), (2L, ts(62), 7L, 30.0), (3L, ts(63), 7L, 5.0),
      (4L, ts(64), 7L, 20.0), // bar [60,70): open 10, high 30, low 5, close 20
      (5L, ts(62), 8L, 1.0)) // second user, same bar
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = EventStreams.ohlcBars(
      input.toDF().toDF("event_id", "ts", "user_id", "value"),
      window_ = "10 minutes", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("ohlc")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((9L, ts(200), 9L, 1.0)) // watermark closes the bars
      q.processAllAvailable()
      val got = spark.table("ohlc")
        .as[(Long, Timestamp, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(got.contains((7L, ts(60), 10.0, 30.0, 5.0, 20.0, 4L)), got)
      assert(got.contains((8L, ts(60), 1.0, 1.0, 1.0, 1.0, 1L)), got)
    } finally q.stop()
  }

  test("stateful queries run on the RocksDB state store (large-state scale path)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, String, Double)]
      val out = EventStreams.windowedCounts(
        input.toDF().toDF("ts", "event_type", "value"), "10 minutes", "5 minutes")
      val q = out.writeStream.format("memory").queryName("wc_rocks").outputMode("append").start()
      try {
        input.addData((ts(61), "a", 1.0), (ts(62), "a", 2.0))
        q.processAllAvailable()
        input.addData((ts(90), "a", 1.0)) // closes [60,70)
        q.processAllAvailable()
        val rows = spark.table("wc_rocks")
          .as[(Timestamp, String, Long, Double)].collect().toSeq
        assert(rows == Seq((ts(60), "a", 2L, 3.0)))
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("transformWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState requires the RocksDB provider (state v2)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val out = EventStreams.runningUserTotals(input.toDS())
      val q = out.writeStream.format("memory").queryName("tws").outputMode("update").start()
      try {
        input.addData(Event(1, ts(60), 7L, "x", 2.0), Event(2, ts(61), 7L, "x", 3.0))
        q.processAllAvailable()
        input.addData(Event(3, ts(62), 7L, "x", 5.0), Event(4, ts(62), 8L, "y", 1.0))
        q.processAllAvailable()
        val last = spark.table("tws").as[EventStreams.UserTotal].collect()
          .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
        assert(last(7L) == EventStreams.UserTotal(7L, 3L, 10.0))
        assert(last(8L) == EventStreams.UserTotal(8L, 1L, 1.0))
      } finally q.stop()
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("dedupStreamWithinWatermark drops re-stamped duplicates, passes distinct ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = EventStreams.dedupStreamWithinWatermark(
      input.toDF().toDF("event_id", "ts", "event_type"), "event_id", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ddw").outputMode("append").start()
    try {
      input.addData((1L, ts(60), "a"), (2L, ts(61), "b"))
      q.processAllAvailable()
      // id 1 replayed with a LATER timestamp: dropDuplicates(id, ts) would
      // pass it; within-watermark dedup must drop it
      input.addData((1L, ts(63), "a"), (3L, ts(64), "c"))
      q.processAllAvailable()
      val ids = spark.table("ddw").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched left rows with nulls after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lin = MemoryStream[(Long, Timestamp)]
    val rin = MemoryStream[(Long, Timestamp, Double)]
    val out = EventStreams.intervalJoinLeftOuter(
      lin.toDF().toDF("user_id", "ts"),
      rin.toDF().toDF("user_id", "rts", "value"),
      "user_id", "5 minutes", "10 minutes")
      .select(col("l.user_id"), col("value"))
    val q = out.writeStream.format("memory").queryName("loj").outputMode("append").start()
    try {
      lin.addData((7L, ts(60)), (8L, ts(60))) // 8 will never match
      rin.addData((7L, ts(65), 42.0)) // within [60, 70] for user 7
      q.processAllAvailable()
      // advance BOTH watermarks far past 70 so user 8's null row is final
      lin.addData((99L, ts(200))); rin.addData((98L, ts(200), 0.0))
      q.processAllAvailable()
      lin.addData((97L, ts(400))); rin.addData((96L, ts(400), 0.0))
      q.processAllAvailable()
      val got = spark.table("loj").as[(Long, Option[Double])].collect()
        .filter(r => r._1 == 7L || r._1 == 8L).sortBy(_._1)
      assert(got.toSeq == Seq((7L, Some(42.0)), (8L, None)))
    } finally q.stop()
  }

  test("runningTypeCounts in update mode tracks totals incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = EventStreams.runningTypeCounts(input.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("rc").outputMode("complete").start()
    try {
      input.addData((ts(1), "a", 1.0), (ts(2), "b", 1.0))
      q.processAllAvailable()
      input.addData((ts(3), "a", 1.0))
      q.processAllAvailable()
      val m = spark.table("rc").as[(String, Long)].collect().toMap
      assert(m == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("streaming heavy hitters: approx_top_items accumulates across micro-batches") {
    // the Misra-Gries TypedImperativeAggregate runs as STREAMING state:
    // O(k) bytes per group in the state store, merged incrementally —
    // trending-tokens over an unbounded stream without a vocabulary table
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = input.toDF().toDF("token")
      .groupBy()
      .agg(graft.functions.approx_top_items(col("token"), 4).as("top"))
    val q = out.writeStream.format("memory").queryName("hh")
      .outputMode("complete").start()
    try {
      input.addData(Seq.fill(30)("hot") ++ Seq("a", "b", "c"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(25)("hot2") ++ Seq("d", "e"): _*)
      q.processAllAvailable()
      val top = spark.table("hh")
        .select(explode(col("top"))).select("col.item", "col.est")
        .as[(String, Long)].collect().toMap
      // n = 60; bound = n/(k+1) = 12: hot (30) and hot2 (25) must be
      // present, estimates within the MG bound
      assert(top.contains("hot") && top.contains("hot2"))
      assert(top("hot") <= 30 && top("hot") >= 30 - 12)
      assert(top("hot2") <= 25 && top("hot2") >= 25 - 12)
    } finally q.stop()
  }

  test("streamingMerge: micro-batches upsert into a keyed table, latest seq wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("smerge").toString + "/t"
    val input = MemoryStream[(Long, Long, String)] // (key, seq, payload)
    val q = input.toDF().toDF("k", "seq", "payload")
      .writeStream
      .foreachBatch(EventStreams.streamingMerge(dir, "k", "seq"))
      .outputMode("update").start()
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1"))
      q.processAllAvailable()
      // batch 2: update k=1 (two rows for the same key — highest seq must
      // win), insert k=3
      input.addData((1L, 2L, "a2"), (1L, 3L, "a3"), (3L, 1L, "c1"))
      q.processAllAvailable()
      val got = EventStreams.mergedTable(spark, dir)
        .as[(Long, Long, String)].collect().toSet
      assert(got == Set((1L, 3L, "a3"), (2L, 1L, "b1"), (3L, 1L, "c1")))
    } finally q.stop()
  }

  test("mergedTableAsOf time-travels to any materialized version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stravel").toString + "/t"
    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("k", "seq", "payload")
      .writeStream
      .foreachBatch(EventStreams.streamingMerge(dir, "k", "seq"))
      .outputMode("update").start()
    try {
      input.addData((1L, 1L, "a1"))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2"), (2L, 1L, "b1"))
      q.processAllAvailable()
      def asOf(v: Long) = EventStreams.mergedTableAsOf(spark, dir, v)
        .as[(Long, Long, String)].collect().toSet
      assert(asOf(0L) == Set((1L, 1L, "a1")))
      assert(asOf(1L) == Set((1L, 2L, "a2"), (2L, 1L, "b1")))
      assert(asOf(99L) == asOf(1L)) // requests past the head read the head
      intercept[IllegalArgumentException] {
        EventStreams.mergedTableAsOf(spark, dir, -1L)
      }
    } finally q.stop()
  }

  test("dedupIngest: batches dedup within themselves, against the index, and extend it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("dedupingest").toString
    val idx = s"$base/index"; val out = s"$base/out"
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.dedupIngest(idx, out))
      .outputMode("update").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "a completely different document body with other words"))
      q.processAllAvailable()
      input.addData(
        (3L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1 (via index)
        (4L, "yet another unrelated piece of text arriving later"),
        (5L, "yet another unrelated piece of text arriving later")) // dup of 4 within batch
      q.processAllAvailable()
      val kept = spark.read.parquet(out).select("id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      // the index grew with every kept doc: a third batch duplicating
      // batch-2's survivor is dropped too
      input.addData((6L, "yet another unrelated piece of text arriving later"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("id").as[Long].collect().toSet
        == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("annProbeIngest: streamed query batches probe the stored index; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("annprobe").toString
    val idx = s"$base/index"; val out = s"$base/out"
    graft.operators.Similarity.writeIvfIndex(emb, idx, 16)
    // queries as a stream of (q_id, q_vec): two micro-batches
    val probeRows = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b0, b1) = probeRows.splitAt(probeRows.size / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("q_id", "q_vec")
      .writeStream.foreachBatch(EventStreams.annProbeIngest(idx, out, 2, 10))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      // union of streamed batches == one offline probe of the same queries
      val streamed = spark.read.parquet(out)
        .select("q_id", "vec_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val offline = graft.operators.Similarity.ivfTopKAgainstIndex(
          probeRows.toDF("q_id", "q_vec"), idx, 2, 10)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch (same batchId dir) re-derives identical results
      val sink = EventStreams.annProbeIngest(idx, out, 2, 10)
      sink(b1.toDF("q_id", "q_vec"), 1)
      val replayed = spark.read.parquet(out)
        .select("q_id", "vec_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(replayed == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("annIngest: streamed vectors extend a versioned index; replay leaves it identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = java.nio.file.Files.createTempDirectory("anningest").toString
    val idx = s"$base/index"
    // build on a slice containing the whole centroid id range (frozen
    // quantizer == full-corpus quantizer, as in the append test), stream
    // the rest in two micro-batches
    graft.operators.Similarity.writeIvfIndexVersioned(
      emb.filter($"vec_id" < 16 || $"vec_id" % 3 =!= 1), idx, 16)
    val late = emb.filter($"vec_id" >= 16 && $"vec_id" % 3 === 1)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val (b0, b1) = late.splitAt(late.size / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(EventStreams.annIngest(idx))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      // probing build+stream equals probing a from-scratch build of the
      // full corpus (frozen-quantizer equivalence, now through the
      // versioned layout — ivfTopKAgainstIndex reads batch=* unchanged)
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "vec_id", "score", "rnk")
          .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      val full = java.nio.file.Files.createTempDirectory("anningestfull").toString
      graft.operators.Similarity.writeIvfIndexVersioned(emb, full, 16)
      assert(sorted(graft.operators.Similarity.ivfTopKAgainstIndex(queries, idx, 2, 10))
        == sorted(graft.operators.Similarity.ivfTopKAgainstIndex(queries, full, 2, 10)))
      // crash-replay: re-delivering streaming batch 1 overwrites its own
      // batch partition — index contents must be IDENTICAL, not doubled
      def contents(): Set[(Long, Long, Int)] =
        spark.read.parquet(s"$idx/lists")
          .select($"vec_id", $"batch".cast("long"), $"cell")
          .as[(Long, Long, Int)].collect().toSet
      val before = contents()
      val sink = EventStreams.annIngest(idx)
      sink(b1.toDF("vec_id", "embedding"), 1)
      assert(contents() == before, "replayed batch changed the index")
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("pqIngest + pqProbeIngest: streamed vectors extend the compressed index; serving ≡ offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = java.nio.file.Files.createTempDirectory("pqingest").toString
    val idx = s"$base/index"; val out = s"$base/out"
    // build on a slice containing the centroid AND codebook id ranges
    // (both frozen artifacts equal their full-corpus versions), stream
    // the rest; training-free codebooks → build+stream must EQUAL a
    // from-scratch build over the union
    graft.operators.Similarity.writeIvfIndexPQ(
      emb.filter($"vec_id" < 16 || $"vec_id" % 3 =!= 1), idx, 16, 8, 16,
      trainIters = 0)
    val late = emb.filter($"vec_id" >= 16 && $"vec_id" % 3 === 1)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(EventStreams.pqIngest(idx))
      .outputMode("update").start()
    try {
      input.addData(late); q.processAllAvailable()
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "vec_id", "score", "rnk")
          .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      val full = java.nio.file.Files.createTempDirectory("pqingestfull").toString
      graft.operators.Similarity.writeIvfIndexPQ(emb, full, 16, 8, 16,
        trainIters = 0)
      val offline = sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexPQ(queries, full, 2, 10))
      assert(sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexPQ(queries, idx, 2, 10))
        == offline)
      // serving sink: idempotent per-batch output equal to the offline probe
      val qrows = queries.as[(Long, Array[Float])].collect().toSeq
      val sink = EventStreams.pqProbeIngest(idx, out, 2, 10)
      sink(qrows.toDF("q_id", "q_vec"), 0)
      sink(qrows.toDF("q_id", "q_vec"), 0) // replay
      assert(sorted(spark.read.parquet(s"$out/batch=0")) == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("pqrIngest + pqrProbeIngest: streamed vectors extend the RESIDUAL index; serving ≡ offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = java.nio.file.Files.createTempDirectory("pqringest").toString
    val idx = s"$base/index"; val out = s"$base/out"
    // the build slice must contain the centroid ids (< 16) AND the
    // residual-codebook init ids (the first 16 NON-centroid ids, 16..31)
    // so both frozen artifacts equal their full-corpus versions; then
    // build+stream must EQUAL a from-scratch build over the union
    graft.operators.Similarity.writeIvfIndexPQR(
      emb.filter($"vec_id" < 32 || $"vec_id" % 3 =!= 1), idx, 16, 8, 16)
    val late = emb.filter($"vec_id" >= 32 && $"vec_id" % 3 === 1)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(EventStreams.pqrIngest(idx))
      .outputMode("update").start()
    try {
      input.addData(late); q.processAllAvailable()
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "vec_id", "score", "rnk")
          .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      val full = java.nio.file.Files.createTempDirectory("pqringestfull").toString
      graft.operators.Similarity.writeIvfIndexPQR(emb, full, 16, 8, 16)
      val offline = sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexPQR(queries, full, 2, 10))
      assert(sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexPQR(queries, idx, 2, 10))
        == offline)
      val qrows = queries.as[(Long, Array[Float])].collect().toSeq
      val sink = EventStreams.pqrProbeIngest(idx, out, 2, 10)
      sink(qrows.toDF("q_id", "q_vec"), 0)
      sink(qrows.toDF("q_id", "q_vec"), 0) // replay
      assert(sorted(spark.read.parquet(s"$out/batch=0")) == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("packShardsIngest: per-batch shards against the frozen tokenizer ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("shards").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"source", $"doc_id".as("id"), $"text")
    graft.operators.TextOps.writeBpeModel(
      graft.operators.TextOps.bpeMergesByteLevel(docs, $"text", 4), model)
    val rows = docs.filter($"id" < 40)
      .as[(String, Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(String, Long, String)]
    val q = input.toDF().toDF("source", "id", "text")
      .writeStream
      .foreachBatch(EventStreams.packShardsIngest(model, out, budget = 50L))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      // offline: the same per-batch tokenize+pack over batch 1's docs
      val merges = graft.operators.TextOps.loadBpeMerges(spark, model)
      val dw = b1.toDF("source", "id", "text").select($"source", $"id",
        posexplode(regexp_extract_all(lower($"text"),
          lit(graft.operators.TextOps.byteLevelTokenPattern), lit(0)))
          .as(Seq("pos", "w")))
      val wt = dw.select($"w").distinct()
        .select($"w", graft.functions.bpe_encode($"w", merges,
          byteLevel = true).as("toks"))
      val dt = dw.join(wt, Seq("w")).groupBy($"source", $"id")
        .agg(expr(
          "flatten(transform(sort_array(collect_list(struct(pos, toks))), x -> x.toks))")
          .as("toks"))
      val offline = graft.operators.Curation.packShards(dt, $"source", $"id",
          $"toks", 50L, 8)
        .as[(String, Long, Long, String)].collect().toSet
      def streamedB1() = spark.read.parquet(s"$out/batch=1")
        .as[(String, Long, Long, String)].collect().toSet
      assert(streamedB1() == offline && offline.nonEmpty)
      // replay re-derives identical shards
      val sink = EventStreams.packShardsIngest(model, out, 50L)
      sink(b1.toDF("source", "id", "text"), 1)
      assert(streamedB1() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("packShardIdsIngest: per-batch TOKEN-ID shards against the frozen tokenizer + vocab ≡ offline; ids ≡ the string shards mapped; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("idshards").toString
    val model = s"$base/model"; val vdir = s"$base/vocab"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"source", $"doc_id".as("id"), $"text")
    graft.operators.TextOps.writeBpeModel(
      graft.operators.TextOps.bpeMergesByteLevel(docs, $"text", 4), model)
    val merges = graft.operators.TextOps.loadBpeMerges(spark, model)
    graft.operators.TextOps.writeBpeVocabIds(spark,
      graft.operators.TextOps.bpeVocabIdsByteLevel(merges), vdir)
    val vocab = graft.operators.TextOps.loadBpeVocabIds(spark, vdir)
    val rows = docs.filter($"id" < 30)
      .as[(String, Long, String)].collect().toSeq
    val input = MemoryStream[(String, Long, String)]
    val q = input.toDF().toDF("source", "id", "text")
      .writeStream
      .foreachBatch(EventStreams.packShardIdsIngest(model, vdir, out,
        budget = 50L))
      .outputMode("update").start()
    try {
      input.addData(rows); q.processAllAvailable()
      def streamed() = spark.read.parquet(s"$out/batch=0")
        .select("domain", "bin", "n_tokens", "token_ids", "stream_md5")
        .as[(String, Long, Long, Seq[Long], String)].collect().toSet
      // offline twin over the same batch
      val dw = rows.toDF("source", "id", "text").select($"source", $"id",
        posexplode(regexp_extract_all(lower($"text"),
          lit(graft.operators.TextOps.byteLevelTokenPattern), lit(0)))
          .as(Seq("pos", "w")))
      val wt = dw.select($"w").distinct()
        .select($"w", graft.functions.bpe_encode($"w", merges,
          byteLevel = true).as("toks"))
      val dt = dw.join(wt, Seq("w")).groupBy($"source", $"id")
        .agg(expr(
          "flatten(transform(sort_array(collect_list(struct(pos, toks))), x -> x.toks))")
          .as("toks"))
      val offline = graft.operators.Curation.packShardIds(dt, $"source",
          $"id", $"toks", vocab, 50L, 8)
        .as[(String, Long, Long, Seq[Long], String)].collect().toSet
      val s0 = streamed()
      assert(s0 == offline && offline.nonEmpty)
      // the id arrays ARE the string shards mapped through the vocab:
      // same bins, same lengths, ids within the vocab's range
      val strShards = graft.operators.Curation.packShards(dt, $"source",
          $"id", $"toks", 50L, 8)
        .select($"domain", $"bin", $"n_tokens")
        .as[(String, Long, Long)].collect().toSet
      assert(s0.map(r => (r._1, r._2, r._3)) == strShards)
      assert(s0.forall(_._4.forall(i => i >= 0 && i < 256L + merges.length)))
      // replay re-derives identical shards
      val sink = EventStreams.packShardIdsIngest(model, vdir, out, 50L)
      sink(rows.toDF("source", "id", "text"), 0)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("ccLabelIngest: streamed docs maintain the clustering; final ≡ from-scratch; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("cclabel").toString
    val idx = s"$base/index"; val cc = s"$base/cc"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    val initial = docs.filter($"id" % 3 =!= 1)
    val late = docs.filter($"id" % 3 === 1)
      .as[(Long, String)].collect().toSeq
    graft.operators.Dedup.writeCorpusIndexVersioned(initial, idx)
    graft.operators.Dedup.writeCcLabels(initial.select($"id"),
      graft.operators.Dedup.minhashLshPairs(initial, 3, 64, 16, 0.8)
        .select($"id_a", $"id_b"), cc)
    val (b0, b1) = late.splitAt(late.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream.foreachBatch(EventStreams.ccLabelIngest(idx, cc))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      def resolved() = graft.operators.Dedup.ccLabelsResolved(spark, cc)
        .as[(Long, Long)].collect().toMap
      // every pair (a, b) surfaces when the LATER doc's batch processes
      // (within-batch, or cross against the index holding the earlier
      // one), so the maintained labeling must equal the from-scratch
      // clustering of the full corpus
      val scratch = {
        val labels = graft.operators.Dedup.connectedComponents(
          graft.operators.Dedup.minhashLshPairs(docs, 3, 64, 16, 0.8)
            .select($"id_a", $"id_b"))
          .withColumnRenamed("id", "lid")
        docs.select($"id").join(labels, $"id" === $"lid", "left")
          .select($"id", coalesce($"comp", $"id").as("comp"))
          .as[(Long, Long)].collect().toMap
      }
      val r = resolved()
      assert(r == scratch && r.nonEmpty)
      // the fixture must actually exercise a cross-batch merge
      assert(scratch.exists { case (id, comp) => id % 3 == 1 && comp != id },
        "fixture has no near-dup touching the streamed slice")
      // crash-replay of the LAST batch converges to identical labels
      val sink = EventStreams.ccLabelIngest(idx, cc)
      sink(b1.toDF("id", "text"), 1)
      assert(resolved() == r)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("sqIngest + sqProbeIngest: streamed vectors extend the SQ8 index; serving ≡ offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = java.nio.file.Files.createTempDirectory("sqingest").toString
    val idx = s"$base/index"; val idx2 = s"$base/index2"; val out = s"$base/out"
    // SQ8 stats are per-dim min/max, so build+stream ≡ build+offline-ingest
    // over the SAME frozen quantizer (not ≡ a from-scratch union build —
    // a batch CAN extend a dim's range; it clamps, the FAISS behavior)
    val initial = emb.filter($"vec_id" % 3 =!= 1)
    val late = emb.filter($"vec_id" % 3 === 1)
    graft.operators.Similarity.writeIvfIndexSQ(initial, idx, 16)
    graft.operators.Similarity.writeIvfIndexSQ(initial, idx2, 16)
    graft.operators.Similarity.ingestIntoIvfIndexSQ(late, idx2, 1L)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(EventStreams.sqIngest(idx))
      .outputMode("update").start()
    try {
      input.addData(late.as[(Long, Array[Float])].collect().toSeq)
      q.processAllAvailable()
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "vec_id", "score", "rnk")
          .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
      val offline = sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexSQ(queries, idx2, 2, 10))
      assert(sorted(
        graft.operators.Similarity.ivfTopKAgainstIndexSQ(queries, idx, 2, 10))
        == offline && offline.nonEmpty)
      val qrows = queries.as[(Long, Array[Float])].collect().toSeq
      val sink = EventStreams.sqProbeIngest(idx, out, 2, 10)
      sink(qrows.toDF("q_id", "q_vec"), 0)
      sink(qrows.toDF("q_id", "q_vec"), 0) // replay
      assert(sorted(spark.read.parquet(s"$out/batch=0")) == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("dedupIngest replay: a re-delivered batch re-derives the same kept set") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dedupingest2").toString
    val idx = s"$base/index"; val out = s"$base/out"
    val sink = EventStreams.dedupIngest(idx, out)
    val b0 = Seq((1L, "first document with some words in it"),
      (2L, "second totally different body of text")).toDF("id", "text")
    val b1 = Seq((3L, "first document with some words in it"), // dup of 1
      (4L, "a fresh third document unlike the others")).toDF("id", "text")
    sink(b0, 0); sink(b1, 1)
    val first = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(first == Set(1L, 2L, 4L))
    // crash-replay of batch 1: must probe only batch 0's index entries
    // (not its own first attempt) and re-derive the identical kept set
    sink(b1, 1)
    val second = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(second == first)
  }

  test("taggerIngest: per-batch tagger table ≡ offline; every row lands; replay idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("taggeringest").toString
    val sink = EventStreams.taggerIngest(out, Seq("bad"), 1000L, 2L,
      0.35, 0.3, 0.2, 0.02)
    val b0 = Seq(
      (1L, "the cat of the house is in the garden today"),
      (2L, "bad bad bad the cat is here today ok"),
      (3L, "")).toDF("id", "text")
    sink(b0, 0L)
    def rows(b: Long) = spark.read.parquet(s"$out/batch=$b")
      .select($"id", $"kept", $"reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val r0 = rows(0L)
    val offline = graft.operators.TextOps.taggerTable(b0, $"id", $"text",
        Seq("bad"), 1000L, 2L, 0.35, 0.3, 0.2, 0.02)
      .select($"id", $"kept", $"reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r0 == offline, "streaming report must equal the offline tagger table")
    assert(r0.keySet == Set(1L, 2L, 3L), "every batch row lands, drops included")
    assert(r0(3L) == ((false, "repetition,quality,doclen")))
    sink(b0, 0L) // replay
    assert(rows(0L) == r0)
  }

  test("htmlExtractIngest: per-batch block table ≡ offline extractor; replay idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("htmlingest").toString
    val sink = EventStreams.htmlExtractIngest(out)
    val b0 = Seq(
      (1L, "<html><body><h1>a &amp; b</h1><p>one two</p></body></html>"),
      (2L, "<nav>x</nav><script>drop()</script><p>kept</p>")).toDF("id", "html")
    sink(b0, 0L)
    def rows() = spark.read.parquet(s"$out/batch=0")
      .select($"id", $"block_type", $"block_idx", $"block_text")
      .as[(Long, String, Long, String)].collect().toSet
    val r0 = rows()
    val offline = graft.operators.Html.extractBlocks(b0,
        org.apache.spark.sql.functions.col("html"))
      .select($"id", $"block_type", $"block_idx", $"block_text")
      .as[(Long, String, Long, String)].collect().toSet
    assert(r0 == offline && r0.nonEmpty)
    assert(r0.contains((1L, "h1", 0L, "a & b")))
    assert(r0.contains((2L, "nav", 0L, "x")))
    assert(!r0.exists(_._4.contains("drop")), "script content never leaks")
    sink(b0, 0L) // replay
    assert(rows() == r0)
  }

  test("warcIngest: per-batch field table ≡ offline parse; quarantine arrives as rows; replay idempotent") {
    import spark.implicits._
    import graft.operators.Warc
    val out = java.nio.file.Files.createTempDirectory("warcingest").toString
    val sink = EventStreams.warcIngest(out)
    val recs = Warc.withWarcRecord(
      Seq((1L, "s", "<p>one</p>"), (2L, "s", "<p>two</p>"),
        (23L, "s", "<p>bad</p>")).toDF("doc_id", "source", "html"),
      $"doc_id", $"source", $"html", "rec", malformEvery = 23)
    val b0 = Warc.withWarcFiles(recs, $"doc_id", $"rec", docsPerFile = 2)
    sink(b0, 0L)
    def rows() = spark.read.parquet(s"$out/batch=0")
      .select($"url", $"malformed")
      .as[(Option[String], Boolean)].collect().toSet
    val r0 = rows()
    val offline = Warc.parseFields(Warc.records(b0, "warc"), $"rec")
      .select($"url", $"malformed")
      .as[(Option[String], Boolean)].collect().toSet
    assert(r0 == offline && r0.size == 3)
    assert(r0.contains((Some("http://example.com/s/1"), false)))
    assert(r0.contains((None, true)), "the corrupted record arrives quarantined")
    sink(b0, 0L) // replay
    assert(rows() == r0)
  }

  test("outlinkIngest: per-batch anchor table resolved against each page's own base; non-crawlable hrefs arrive null; replay idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("linkingest").toString
    val sink = EventStreams.outlinkIngest(out)
    val b0 = Seq(
      (1L, "http://a.com/d/p",
        "<p><a href=\"next/2\">more</a> <a href=\"mailto:x@y.z\">mail</a></p>"),
      (2L, "HTTPS://B.net:443/x?q=1",
        "<ul><li><a href='/r'>root &amp; rel</a></li></ul>" +
          "<script>var s='<a href=\"http://ghost/\">g</a>';</script>"))
      .toDF("id", "url", "html")
    sink(b0, 0L)
    def rows() = spark.read.parquet(s"$out/batch=0")
      .select($"id", $"link_idx", $"href", $"anchor_text", $"url_resolved",
        $"url_canon")
      .as[(Long, Long, Option[String], String, Option[String], Option[String])]
      .collect().toSet
    val r0 = rows()
    assert(r0 == Set(
      (1L, 0L, Some("next/2"), "more",
        Some("http://a.com/d/next/2"), Some("http://a.com/d/next/2")),
      (1L, 1L, Some("mailto:x@y.z"), "mail", None, None), // not crawlable — data
      (2L, 0L, Some("/r"), "root & rel",
        Some("https://b.net:443/r"), Some("https://b.net/r"))))
    sink(b0, 0L) // replay
    assert(rows() == r0)
  }

  test("imageAHashIngest: dedup-on-arrival vs store and within batch; undecodables quarantined; replay idempotent") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal}
    // hand-controlled hashes: an 8x8 image with columns < k white has
    // aHash bits exactly on those 8k cells (white is above the mean while
    // any black cell exists), so hamming(img(k), img(k')) = 8|k - k'|
    def img(k: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8)
        im.setRGB(x, y, if (x < k) 0xffffff else 0)
      Multimodal.ImageCodec.encode(im, "png")
    }
    def fps(rows: (Long, Array[Byte])*) =
      Multimodal.decodeImageAHash(rows.toSeq.toDF("id", "media"), "media")
        .select($"id", $"ah_hi", $"ah_lo")
    val base = java.nio.file.Files.createTempDirectory("ahashingest").toString
    val idx = s"$base/index"; val out = s"$base/out"
    Dedup.writeAHashIndex(fps(1L -> img(2), 2L -> img(4)), idx)
    val sink = EventStreams.imageAHashIngest(idx, out)
    val b0 = Seq(10L -> img(4), // exact dup of stored 2
      11L -> img(6),            // new (hamming 16 from 2, 32 from 1)
      12L -> img(6),            // within-batch dup of 11
      13L -> "not an image".getBytes("UTF-8")).toDF("id", "media")
    sink(b0, 0L)
    def report(b: Long) = spark.read.parquet(s"$out/batch=$b")
      .select($"id", $"n_store_dups", $"kept")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val r0 = report(0L)
    assert(r0 == Map(10L -> ((1L, false)), 11L -> ((0L, true)),
      12L -> ((0L, false)), 13L -> ((0L, false))))
    // the store grew by the kept image only: 14 dups 11, 15 is new
    sink(Seq(14L -> img(6), 15L -> img(3)).toDF("id", "media"), 1L)
    assert(report(1L) == Map(14L -> ((1L, false)), 15L -> ((0L, true))))
    // crash-replay of batch 0: probes only the build (beforeBatch), not
    // its own first-attempt entries — identical report
    sink(b0, 0L)
    assert(report(0L) == r0)
  }

  /** Unigram tf with dl attached over the sf0.001 documents — the
    * [[graft.operators.Retrieval]] input shape for the streaming twins.
    */
  private def docTf = {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
    docs.select(col("doc_id").as("id"),
        expr("filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy(col("id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
  }

  test("bm25ProbeIngest: streamed query bags probe the stored index; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bm25probe").toString
    val idx = s"$base/index"; val out = s"$base/out"
    val tf = docTf
    graft.operators.Retrieval.writeBm25Index(tf, idx, 16)
    val probeRows = Seq((0L, "the"), (0L, "data"), (1L, "table"), (1L, "query"))
    val (b0, b1) = probeRows.splitAt(2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("q_id", "term")
      .writeStream.foreachBatch(EventStreams.bm25ProbeIngest(idx, out, 5))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      // union of streamed batches == one offline probe of the same queries
      val streamed = spark.read.parquet(out)
        .select("q_id", "doc_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val offline = graft.operators.Retrieval.bm25AgainstIndex(
          probeRows.toDF("q_id", "term"), idx, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch (same batchId dir) re-derives identical results
      val sink = EventStreams.bm25ProbeIngest(idx, out, 5)
      sink(b1.toDF("q_id", "term"), 1)
      val replayed = spark.read.parquet(out)
        .select("q_id", "doc_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(replayed == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("expectationsIngest: per-batch quality reports; replay re-derives identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Expectations._
    val out = java.nio.file.Files.createTempDirectory("expingest").toString
    val rules = Seq(NotNull("id"), InRange("v", 0.0, 1.0), Unique(Seq("id")))
    val input = MemoryStream[(Option[Long], Double)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.foreachBatch(EventStreams.expectationsIngest(rules, out))
      .outputMode("update").start()
    try {
      input.addData(Seq((Some(1L), 0.5), (Some(2L), 0.7)))  // clean batch
      q.processAllAvailable()
      input.addData(Seq((None, 0.5), (Some(3L), 1.5), (Some(3L), 0.2))) // dirty
      q.processAllAvailable()
      def report(b: Int) = spark.read.parquet(s"$out/batch=$b")
        .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val clean = report(0)
      assert(clean.values.forall(_ == ((0L, true))))
      val dirty = report(1)
      assert(dirty("not_null(id)") == ((1L, false)))
      assert(dirty("in_range(v)") == ((1L, false)))
      assert(dirty("unique(id)") == ((1L, false)))
      // replayed batch overwrites its own report identically
      val sink = EventStreams.expectationsIngest(rules, out)
      sink(Seq((Option.empty[Long], 0.5), (Some(3L), 1.5), (Some(3L), 0.2))
        .toDF("id", "v"), 1)
      assert(report(1) == dirty)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("hybridProbeIngest: streamed queries probe BOTH indexes; fusion equals offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("hybridprobe").toString
    val bm = s"$base/bm25"; val ivf = s"$base/ivf"; val out = s"$base/out"
    graft.operators.Retrieval.writeBm25Index(docTf, bm, 16)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.Similarity.writeIvfIndex(emb, ivf, 16)
    // queries: hand term bags + each seed's own embedding as the vector
    val seedVecs = emb.filter($"vec_id" < 2)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    val probeRows = Seq(
      (0L, Seq("the", "data"), seedVecs(0L)),
      (1L, Seq("table", "query"), seedVecs(1L)))
    val input = MemoryStream[(Long, Seq[String], Array[Float])]
    val q = input.toDF().toDF("q_id", "terms", "q_vec")
      .writeStream.foreachBatch(EventStreams.hybridProbeIngest(bm, ivf, out, 2, 5))
      .outputMode("update").start()
    try {
      input.addData(probeRows.take(1)); q.processAllAvailable()
      input.addData(probeRows.drop(1)); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("q_id", "doc_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val offline = graft.operators.Retrieval.rrfFuse2(
          graft.operators.Retrieval.bm25AgainstIndex(
            probeRows.toDF("q_id", "terms", "q_vec")
              .select($"q_id", explode($"terms").as("term")), bm, 5)
            .select($"q_id", $"doc_id", $"rnk"),
          graft.operators.Similarity.ivfTopKAgainstIndex(
            probeRows.toDF("q_id", "terms", "q_vec")
              .select($"q_id", $"q_vec"), ivf, 2, 5)
            .select($"q_id", $"vec_id".as("doc_id"), $"rnk"),
          5)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch re-derives identical results (read-only indexes)
      val sink = EventStreams.hybridProbeIngest(bm, ivf, out, 2, 5)
      sink(probeRows.drop(1).toDF("q_id", "terms", "q_vec"), 1)
      val replayed = spark.read.parquet(out)
        .select("q_id", "doc_id", "score", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(replayed == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("bm25Ingest: streamed postings extend a versioned index; replay leaves it identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bm25ingest").toString
    val idx = s"$base/index"
    val tf = docTf
    // build on a doc slice, stream the rest's postings in two
    // DOCUMENT-ATOMIC batches (the ingest contract: a doc's postings
    // arrive together — splitting rows mid-doc would double-count the
    // doc in the summed stats)
    graft.operators.Retrieval.writeBm25IndexVersioned(
      tf.filter($"id" % 3 =!= 1), idx, 16)
    def lateRows(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      tf.filter($"id" % 3 === 1).filter(f($"id"))
        .select($"id", $"term", $"tf", $"dl")
        .as[(Long, String, Long, Long)].collect().toSeq
    val b0 = lateRows(_ % 6 === 1)
    val b1 = lateRows(_ % 6 === 4)
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = input.toDF().toDF("id", "term", "tf", "dl")
      .writeStream.foreachBatch(EventStreams.bm25Ingest(idx))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      // probing build+stream equals the DIRECT bm25TopK over the full
      // corpus: df counts postings and stats rows sum, so nothing drifts
      val queries = Seq((0L, "the"), (0L, "data"), (1L, "table"))
        .toDF("q_id", "term")
      val probed = graft.operators.Retrieval.bm25AgainstIndex(queries, idx, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      val direct = graft.operators.Retrieval.bm25TopK(tf, queries, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(probed == direct && probed.nonEmpty)
      // crash-replay: re-delivering streaming batch 1 overwrites its own
      // partitions — index contents must be IDENTICAL, not doubled
      def contents(): Set[(Long, String, Long)] =
        spark.read.parquet(s"$idx/lists")
          .select($"id", $"term", $"batch".cast("long"))
          .as[(Long, String, Long)].collect().toSet
      val before = contents()
      val sink = EventStreams.bm25Ingest(idx)
      sink(b1.toDF("id", "term", "tf", "dl"), 1)
      assert(contents() == before, "replayed batch changed the index")
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("knnLabelIngest: streamed vectors classify against the frozen labeling; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = java.nio.file.Files.createTempDirectory("knnlabel").toString
    val idx = s"$base/index"; val lbl = s"$base/labels"; val out = s"$base/out"
    graft.operators.Similarity.writeIvfIndexVersioned(emb, idx, 8)
    // the frozen labeling artifact: the offline LP output written once
    graft.operators.Graph.labelPropagation(
        graft.operators.Similarity.lshTopK(
          emb.select($"vec_id".as("q_id"), $"embedding".as("q_vec")),
          emb, 64, 5, 5)
          .select(least($"q_id", $"vec_id").as("id_a"),
            greatest($"q_id", $"vec_id").as("id_b")).distinct(),
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .select($"vec_id".as("id"),
            when($"vec_id" % 4 === 0, $"label").cast("long").as("seed_label")),
        iters = 3)
      .select($"id", $"label").write.parquet(lbl)
    val probeRows = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b0, b1) = probeRows.splitAt(probeRows.size / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("q_id", "q_vec")
      .writeStream.foreachBatch(EventStreams.knnLabelIngest(idx, lbl, out, 4, 10))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("q_id", "label", "votes")
        .as[(Long, Long, Long)].collect().toSet
      val offline = graft.operators.Graph.knnClassifyAgainstIndex(
          probeRows.toDF("q_id", "q_vec"), idx, lbl, 4, 10)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch re-derives the identical report (read-only index)
      val sink = EventStreams.knnLabelIngest(idx, lbl, out, 4, 10)
      sink(b1.toDF("q_id", "q_vec"), 1)
      assert(spark.read.parquet(out).select("q_id", "label", "votes")
        .as[(Long, Long, Long)].collect().toSet == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("lmScoreIngest: streamed docs score against the stored LM; serving ≡ offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("lmscore").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id", $"text")
    // train on the reference slice, stream everything else through
    graft.operators.TextOps.writeLmModel(docs.filter($"doc_id" % 10 === 0),
      col("doc_id"), col("text"), 500, 1000, model)
    val rows = docs.filter($"doc_id" % 10 =!= 0)
      .as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(EventStreams.lmScoreIngest(model, out, 0.7, 40.0))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("id", "n_bigrams", "h", "ppl", "keep")
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      val offline = graft.operators.TextOps.lmScoreAgainstModel(
          rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
          model, 0.7, 40.0)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch (same batchId dir) re-derives identical scores
      val sink = EventStreams.lmScoreIngest(model, out, 0.7, 40.0)
      sink(b1.toDF("doc_id", "text"), 1)
      assert(spark.read.parquet(out)
        .select("id", "n_bigrams", "h", "ppl", "keep")
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("clsScoreIngest: streamed docs score against the stored classifier; serving ≡ offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("clsscore").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id", $"text")
    val label = array_contains(split(lower(col("text")), """\s+"""), "dup")
    graft.operators.TextOps.writeLinearModel(spark,
      graft.operators.TextOps.trainHashedLinear(docs, col("doc_id"),
        col("text"), label.cast("int"), 64, 8, 1L, 2L),
      model)
    val rows = docs.as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(EventStreams.clsScoreIngest(model, out, 0.5))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("id", "n_tokens", "score", "prob", "keep")
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      val offline = graft.operators.TextOps.hashedLinearScoreAgainstModel(
          rows.toDF("doc_id", "text"), col("doc_id"), col("text"), model, 0.5)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      // replayed batch (same batchId dir) re-derives identical scores
      val sink = EventStreams.clsScoreIngest(model, out, 0.5)
      sink(b1.toDF("doc_id", "text"), 1)
      assert(spark.read.parquet(out)
        .select("id", "n_tokens", "score", "prob", "keep")
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("pplBucketIngest: streamed docs bucket against frozen boundaries; unknown group fails visible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("pplbkt").toString
    val lm = s"$base/lm"; val bounds = s"$base/bounds"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text", $"source".as("group"))
    graft.operators.TextOps.writeLmModel(docs.filter($"id" % 10 === 0),
      col("id"), col("text"), 500, 1000, lm)
    graft.operators.TextOps.writePplBoundaries(docs, col("id"), col("text"),
      col("group"), col("id") % 10 === 0, 500, 1000, 0.7, bounds)
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("id", "text", "group")
      .writeStream.foreachBatch(EventStreams.pplBucketIngest(lm, bounds, out, 0.7))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("id", "group", "ppl", "bucket")
        .as[(Long, String, Double, String)].collect().toSet
      // serving over frozen artifacts ≡ the fresh offline partition
      val offline = graft.operators.TextOps.perplexityPartition(
          rows.toDF("id", "text", "group"), col("id"), col("text"),
          col("group"), col("id") % 10 === 0, 500, 1000, 0.7)
        .as[(Long, String, Double, String)].collect().toSet
      assert(streamed.nonEmpty && streamed == offline)
      assert(streamed.map(_._4).subsetOf(Set("head", "middle", "tail")))
      // a group absent from the stored boundaries buckets to NULL
      val sink = EventStreams.pplBucketIngest(lm, bounds, out, 0.7)
      sink(Seq((900001L, b0.head._2, "no-such-source"))
        .toDF("id", "text", "group"), 99)
      val unknown = spark.read.parquet(s"$out/batch=99")
        .select("bucket").collect()
      assert(unknown.length == 1 && unknown.head.isNullAt(0))
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("countMinIngest: streamed batches maintain the stored sketch; store == one-shot sketch (linearity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cmingest").toString
    val all = (Seq.fill(40)("a") ++ Seq.fill(15)("b") ++ Seq.fill(3)("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val (build, rest) = all.splitAt(10)
    val (s0, s1) = rest.splitAt(rest.length / 2)
    graft.operators.Sketches.writeCountMin(build.toDF("i", "k"), col("k"),
      depth = 3, width = 64, dir)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("i", "k")
      .writeStream.foreachBatch(EventStreams.countMinIngest(dir, "k"))
      .outputMode("update").start()
    try {
      input.addData(s0); q.processAllAvailable()
      input.addData(s1); q.processAllAvailable()
      val est = graft.operators.Sketches.countMinEstimateAgainstStore(dir,
          Seq("a", "b", "c", "zz").toDF("k"), col("k"))
        .as[(String, Long)].collect().toMap
      // linearity: build + 2 streamed batches == one-shot over everything
      val oneShot = graft.operators.Sketches.countMinEstimate(
          graft.operators.Sketches.countMin(all.toDF("i", "k"), col("k"), 3, 64),
          Seq("a", "b", "c", "zz").toDF("k"), col("k"), 3, 64)
        .as[(String, Long)].collect().toMap
      assert(est == oneShot)
      assert(est("a") >= 40L && est("b") >= 15L && est("c") >= 3L)
      // replayed batch overwrites its own cells: store unchanged
      val sink = EventStreams.countMinIngest(dir, "k")
      sink(s1.toDF("i", "k"), 1)
      val replayed = graft.operators.Sketches.countMinEstimateAgainstStore(
          dir, Seq("a", "b", "c", "zz").toDF("k"), col("k"))
        .as[(String, Long)].collect().toMap
      assert(replayed == oneShot)
      // maintenance tick AFTER the producer's commit (the
      // Compaction.batchCount consult contract): 3 batch dirs > 2 →
      // fold to one epoch-1 batch; probes unchanged, and the NEXT
      // streamed batch keeps landing in the new epoch
      assert(graft.operators.Sketches
        .compactCountMinIfNeeded(spark, dir, maxBatches = 2).contains(1))
      assert(graft.operators.Compaction.batchCount(spark, dir, "cells") == 1)
      assert(graft.operators.Sketches.countMinEstimateAgainstStore(dir,
          Seq("a", "b", "c", "zz").toDF("k"), col("k"))
        .as[(String, Long)].collect().toMap == oneShot)
      input.addData(Seq((9001L, "c"), (9002L, "c"))); q.processAllAvailable()
      val after = graft.operators.Sketches.countMinEstimateAgainstStore(dir,
          Seq("c").toDF("k"), col("k"))
        .as[(String, Long)].collect().toMap
      assert(after("c") == oneShot("c") + 2L)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("curationIngest: the composed online gate — every survivor passes all three filters; cross-batch dup dropped; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("curing").toString
    val lm = s"$base/lm"; val cls = s"$base/cls"
    val idx = s"$base/idx"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    // frozen artifacts, trained offline on the reference slice
    graft.operators.TextOps.writeLmModel(docs.filter($"id" % 10 === 0),
      col("id"), col("text"), 500, 1000, lm)
    val label = array_contains(split(lower(col("text")), """\s+"""), "dup")
    graft.operators.TextOps.writeLinearModel(spark,
      graft.operators.TextOps.trainHashedLinear(docs, col("id"),
        col("text"), (!label).cast("int"), 64, 8, 1L, 2L), cls)
    val rows = docs.as[(Long, String)].collect().toSeq
    val (b0, b1raw) = rows.splitAt(rows.length / 2)
    // plant a cross-batch near-duplicate: batch 1 re-sends b0's first doc
    // under a fresh id — the stored-index stage must drop it
    val dupOfB0 = (900001L, b0.head._2)
    val b1 = dupOfB0 +: b1raw
    val sink = EventStreams.curationIngest(lm, cls, idx, out,
      maxTopTokFrac = 0.2, maxTopBigramFrac = 0.1, minTtr = 0.3,
      lambda = 0.7, pplThreshold = 40.0, clsThreshold = 0.5)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream.foreachBatch(sink).outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      val kept = spark.read.parquet(out).select("id")
        .as[Long].collect().toSet
      assert(kept.nonEmpty)
      // every survivor passes all three quality gates, recomputed offline
      val keptDocs = rows.filter(r => kept(r._1)).toDF("id", "text")
      def keepSet(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("keep")).select(col("id")).as[Long].collect().toSet
      assert(keepSet(graft.operators.TextOps.repetitionFilter(keptDocs,
        col("id"), col("text"), 0.2, 0.1, 0.3)) == kept)
      assert(keepSet(graft.operators.TextOps.lmScoreAgainstModel(keptDocs,
        col("id"), col("text"), lm, 0.7, 40.0)) == kept)
      assert(keepSet(graft.operators.TextOps.hashedLinearScoreAgainstModel(
        keptDocs, col("id"), col("text"), cls, 0.5)) == kept)
      // the planted cross-batch duplicate never survives (exact dup of a
      // batch-0 doc — dropped by the stored-index stage if its source
      // passed the gates, by the quality gates otherwise)
      assert(!kept(900001L) || !kept(b0.head._1))
      // replay of batch 1 re-derives the identical kept set
      sink(b1.toDF("id", "text"), 1)
      assert(spark.read.parquet(out).select("id")
        .as[Long].collect().toSet == kept)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("unigramTokenizeIngest: streamed docs tokenize against the stored model; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("unitok").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    graft.operators.Unigram.writeModel(spark,
      graft.operators.Unigram.trainPieces(docs, $"text", 100, 2), model)
    val rows = docs.filter($"id" < 40).as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.unigramTokenizeIngest(model, out))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      def streamed() = spark.read.parquet(out).select("id", "n_tokens")
        .as[(Long, Long)].collect().toSet
      // offline: per-word tokenization of the same docs with the model
      val m = graft.operators.Unigram.loadModel(spark, model)
      val words = docs.filter($"id" < 40)
        .select($"id", explode(expr(
          "filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)")).as("w"))
      val wt = graft.operators.Unigram.tokenize(
        words.select($"w").distinct(), m)
        .select($"w", size($"toks").cast("long").as("nt"))
      val offline = words.join(wt, Seq("w"))
        .groupBy($"id").agg(sum($"nt").as("n_tokens"))
        .as[(Long, Long)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      val sink = EventStreams.unigramTokenizeIngest(model, out)
      sink(b1.toDF("id", "text"), 1)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("knScoreIngest: KN serving over the SAME stored LM artifact; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("knscore").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id", $"text")
    // ONE artifact, two smoothings: this is writeLmModel's output serving KN
    graft.operators.TextOps.writeLmModel(docs.filter($"doc_id" % 10 === 0),
      col("doc_id"), col("text"), 500, 1000, model)
    val rows = docs.filter($"doc_id" % 10 =!= 0)
      .as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(EventStreams.knScoreIngest(model, out, 40.0))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      def streamed() = spark.read.parquet(out)
        .select("id", "n_bigrams", "h", "ppl", "keep")
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      val offline = graft.operators.TextOps.knScoreAgainstModel(
          rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
          model, 40.0)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      // KN scores differ from add-one scores over the identical artifact
      val addOne = graft.operators.TextOps.lmScoreAgainstModel(
          rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
          model, 0.7, 40.0)
        .as[(Long, Long, Double, Double, Boolean)].collect().toSet
      assert(addOne.map(r => (r._1, r._4)) != offline.map(r => (r._1, r._4)),
        "KN must not degenerate into the add-one smoothing")
      val sink = EventStreams.knScoreIngest(model, out, 40.0)
      sink(b1.toDF("doc_id", "text"), 1)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("langIdIngest: streamed docs classify against the frozen stored model; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("langid-ing").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text", $"lang")
    graft.operators.TextOps.writeLangIdModel(spark,
      graft.operators.TextOps.trainHashedLangId(docs, $"id", $"text",
        $"lang", dim = 128, iters = 4), model)
    val rows = docs.filter($"id" < 40).select($"id", $"text")
      .as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.langIdIngest(model, out))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      def streamed() = spark.read.parquet(out)
        .select("id", "pred_lang", "score")
        .as[(Long, String, Double)].collect().toSet
      val offline = graft.operators.TextOps.langIdScoreAgainstModel(
          docs.filter($"id" < 40), $"id", $"text", model)
        .as[(Long, String, Double)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      // replay converges (overwrite-own-partition)
      val sink = EventStreams.langIdIngest(model, out)
      sink(b1.toDF("id", "text"), 1)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("langIdDriftIngest: per-batch drift report against the frozen reference; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("liddrift-ing").toString
    val model = s"$base/model"; val ref = s"$base/ref"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text", $"lang")
    graft.operators.TextOps.writeLangIdModel(spark,
      graft.operators.TextOps.trainHashedLangId(docs, $"id", $"text",
        $"lang", dim = 128, iters = 4), model)
    graft.operators.TextOps.writeLangIdReference(docs, $"id", $"text",
      model, ref)
    val rows = docs.filter($"id" < 30).select($"id", $"text")
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.langIdDriftIngest(model, ref, out))
      .outputMode("update").start()
    try {
      input.addData(rows); q.processAllAvailable()
      def streamed() = spark.read.parquet(s"$out/batch=0")
        .select("pred_lang", "n_batch", "n_ref", "batch_p", "ref_p", "jsd")
        .as[(String, Long, Long, Double, Double, Double)].collect().toSet
      val offline = graft.operators.TextOps.langIdDriftReport(
          docs.filter($"id" < 30), $"id", $"text", model, ref)
        .as[(String, Long, Long, Double, Double, Double)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      // replay converges
      val sink = EventStreams.langIdDriftIngest(model, ref, out)
      sink(rows.toDF("id", "text"), 0)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("wordPieceTokenizeIngest: streamed docs tokenize against the stored vocab; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("wptok").toString
    val model = s"$base/model"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    val wt = graft.operators.TextOps.wordPieceWordTable(docs, $"text")
    graft.operators.TextOps.writeWordPieceModel(wt,
      graft.operators.TextOps.wordPieceMerges(docs, $"text", 3), model)
    val rows = docs.filter($"id" < 40).as[(Long, String)].collect().toSeq
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.wordPieceTokenizeIngest(model, out))
      .outputMode("update").start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      def streamed() = spark.read.parquet(out)
        .select("id", "n_tokens", "n_unk")
        .as[(Long, Long, Long)].collect().toSet
      val vocab = graft.operators.TextOps.loadWordPieceVocab(spark, model)
      val words = docs.filter($"id" < 40)
        .select($"id", explode(expr(
          "filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)")).as("w"))
      val wtoks = graft.operators.TextOps.wordPieceTokens(
        words.select($"w").distinct(), vocab)
        .select($"w", size($"toks").cast("long").as("nt"),
          when(element_at($"toks", 1) === "[UNK]", 1L).otherwise(0L).as("unk"))
      val offline = words.join(wtoks, Seq("w"))
        .groupBy($"id").agg(sum($"nt").as("n_tokens"), sum($"unk").as("n_unk"))
        .as[(Long, Long, Long)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      // the vocab was trained on the full corpus word table, so the
      // served slice segments without UNK (the drift signal stays 0)
      assert(s1.forall(_._3 == 0L))
      val sink = EventStreams.wordPieceTokenizeIngest(model, out)
      sink(b1.toDF("id", "text"), 1)
      assert(streamed() == offline)
      // EVERY ingested doc reports — a doc with no extractable words gets
      // (id, 0, 0) rather than a silent per-doc gap
      sink(Seq((9001L, ""), (9002L, "   \t  "), (9003L, "real words here"))
        .toDF("id", "text"), 1)
      val withEmpty = streamed()
      assert(withEmpty.contains((9001L, 0L, 0L)))
      assert(withEmpty.contains((9002L, 0L, 0L)))
      assert(withEmpty.exists(r => r._1 == 9003L && r._2 > 0L))
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("trainingPairIngest: streamed seeds export pairs against frozen artifacts; serving ≡ offline; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("tpairs").toString
    val idx = s"$base/bm25"; val shs = s"$base/shingles"; val out = s"$base/out"
    val docs = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    val tf = docs
      .select($"id", expr(
        "filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"id", (size($"ws") - 1).cast("long").as("dl"),
        explode(expr(
          "transform(sequence(1, size(ws) - 1, 1), i -> concat(ws[i - 1], ' ', ws[i]))"))
          .as("term"))
      .groupBy($"id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    graft.operators.Retrieval.writeBm25IndexVersioned(tf, idx, 8)
    val shingled = graft.operators.Dedup.batchShingleArrays(docs, 3)
    shingled.write.parquet(shs) // the frozen corpus shingle view
    val seeds = docs.filter($"id".isin(0L, 1L, 8L))
    val seedRows = seeds.as[(Long, String)].collect().toSeq.sortBy(_._1)
    // query-derivation parity: stored-idf derivation equals the
    // corpus-side recipe (independent replay, the bm25SeedQueries shape)
    val qIdx = graft.operators.Retrieval
      .seedQueriesAgainstIndex(seeds, idx, 3)
      .as[(Long, String)].collect().toSet
    val dfs = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val nd = tf.agg(count_distinct($"id").as("n_docs"))
    val qOff = tf.filter($"id".isin(0L, 1L, 8L))
      .join(dfs, "term").crossJoin(broadcast(nd))
      .select($"id".as("q_id"), $"term",
        ($"tf".cast("double") * log($"n_docs".cast("double") / $"df")).as("w"))
      .groupBy($"q_id")
      .agg(slice(sort_array(collect_list(struct(
        (-$"w").as("nw"), $"term".as("t")))), 1, 3).as("v"))
      .select($"q_id", explode($"v.t").as("term"))
      .as[(Long, String)].collect().toSet
    assert(qIdx.nonEmpty && qIdx == qOff)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(EventStreams.trainingPairIngest(idx, shs, out, 3, 5, 10, 0.3))
      .outputMode("update").start()
    try {
      input.addData(seedRows.take(2)); q.processAllAvailable()
      input.addData(seedRows.drop(2)); q.processAllAvailable()
      def streamed() = spark.read.parquet(out)
        .select("seed_id", "doc_id", "label", "rnk")
        .as[(Long, Long, Long, Long)].collect().toSet
      val offline = graft.operators.Retrieval.trainingPairs(tf,
          graft.operators.Retrieval.seedQueriesAgainstIndex(seeds, idx, 3),
          shingled.select($"id", $"sh".as("ss")), 5, 10, 0.3)
        .as[(Long, Long, Long, Long)].collect().toSet
      val s1 = streamed()
      assert(s1.nonEmpty && s1 == offline)
      // positives present: one per seed at rank 0
      assert(Seq(0L, 1L, 8L).forall(i => s1.contains((i, i, 1L, 0L))))
      // replayed batch re-derives identically (read-only frozen artifacts)
      val sink = EventStreams.trainingPairIngest(idx, shs, out, 3, 5, 10, 0.3)
      sink(seedRows.drop(2).toDF("id", "text"), 1)
      assert(streamed() == offline)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("corpusIndexIngest: streamed docs extend the dedup index; replay leaves it identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("corpus-ing").toString
    val d = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select($"doc_id".as("id"), $"text")
    val existing = d.filter($"id" % 10 =!= 7)
    val probeDocs = d.filter($"id" % 10 === 7)
    def probe = graft.operators.Dedup
      .dedupAgainstIndex(probeDocs, idx, 3, 16, 8, 0.8)
      .select("id").as[Long].collect().sorted.toSeq
    // offline build on the initial slice; stream the late slice in
    graft.operators.Dedup.writeCorpusIndexVersioned(
      existing.filter($"id" % 10 =!= 5), idx, 3, 16, 8)
    val late = existing.filter($"id" % 10 === 5)
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "text")
      .writeStream.foreachBatch(EventStreams.corpusIndexIngest(idx, 3, 16, 8))
      .outputMode("update").start()
    try {
      input.addData(late); q.processAllAvailable()
      val p1 = probe
      // streamed build+ingest ≡ the direct cross-corpus dedup
      assert(p1 == graft.operators.Dedup
        .dedupAgainst(probeDocs, existing, 3, 16, 8, 0.8)
        .select("id").as[Long].collect().sorted.toSeq)
      // crash-replay of the streamed batch: identical index contents
      val sink = EventStreams.corpusIndexIngest(idx, 3, 16, 8)
      sink(late.toDF("id", "text"), 0)
      assert(probe == p1)
      // maintenance tick: threshold consulted after commit, probe unchanged
      assert(graft.operators.Dedup
        .compactCorpusIndexIfNeeded(spark, idx, 1).contains(1))
      assert(probe == p1)
    } finally { q.stop(); graft.CacheScope.drain() }
  }

  test("bm25DeleteIngest: streamed deletion requests erase docs; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bm25del").toString
    val idx = s"$base/index"
    val tf = docTf
    graft.operators.Retrieval.writeBm25IndexVersioned(tf, idx, 16)
    // two erasure windows: doc ids ≡1 (mod 7), then ≡2 (mod 7)
    def victims(m: Long) =
      tf.select($"id").distinct().filter($"id" % 7 === m)
        .as[Long].collect().toSeq
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("id")
      .writeStream.foreachBatch(EventStreams.bm25DeleteIngest(idx))
      .outputMode("update").start()
    try {
      input.addData(victims(1)); q.processAllAvailable()
      input.addData(victims(2)); q.processAllAvailable()
      // probing the index equals the direct path over the survivors —
      // df/stats recounted, the deleted docs gone from every score
      val queries = Seq((0L, "the"), (0L, "data"), (1L, "table"))
        .toDF("q_id", "term")
      val probed = graft.operators.Retrieval.bm25AgainstIndex(queries, idx, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      val direct = graft.operators.Retrieval.bm25TopK(
          tf.filter($"id" % 7 =!= 1 && $"id" % 7 =!= 2), queries, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(probed == direct && probed.nonEmpty)
      // the bytes are gone from the stored postings
      val e = Compaction.currentEpoch(spark, idx)
      val stored = spark.read.parquet(Compaction.epochPath(idx, "lists", e))
      assert(stored.filter($"id" % 7 === 1 || $"id" % 7 === 2).count() == 0)
      // crash-replay of the second window: deletion is idempotent, the
      // index rewrites to identical contents (one epoch further)
      val sink = EventStreams.bm25DeleteIngest(idx)
      sink(victims(2).toDF("id"), 1)
      assert(graft.operators.Retrieval.bm25AgainstIndex(queries, idx, 5)
        .as[(Long, Long, Double, Long)].collect().toSet == probed)
    } finally { q.stop(); graft.CacheScope.drain() }
  }
}
