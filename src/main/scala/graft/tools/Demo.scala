package graft.tools

import org.apache.spark.sql.functions._

import graft.{Counters, Engine, Tables}
import graft.plans.{DagBuilder, Edge}
import graft.streaming.EventStreams

/** End-to-end usage example of the facade surfaces (DAG builder, counters,
  * streaming) over the harness tables — what a user migrating from the
  * reference would write first.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 8, appName = "graft-demo")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val t = Tables(spark, dir)

    // 1. The reference's canonical WordCount DAG, via the DAG facade
    val (top, counters) = Counters.track(spark) {
      DagBuilder.create("wordcount")
        .addSource("docs")(t.documents)
        .addProcessor("tokenizer") { case Seq(d) =>
          d.select(explode(split(col("text"), "\\s+")).as("word"))
        }
        .addProcessor("summer") { case Seq(w) =>
          w.groupBy("word").agg(count(lit(1)).as("cnt"))
        }
        .addEdge("docs", "tokenizer", Edge.oneToOne)
        .addEdge("tokenizer", "summer", Edge.scatterGather("word"))
        .output("summer")
        .orderBy(desc("cnt")).limit(3)
        .collect()
    }
    println(s"[demo] top words: ${top.map(r => s"${r.get(0)}=${r.get(1)}").mkString(", ")}")
    println(s"[demo] counters: tasks=${counters.tasks} shuffleRead=${counters.shuffleReadBytes}B")

    // 2. Streaming sessionization over the events parquet, driven as a
    // bounded stream (one trigger pass over the existing file).
    import spark.implicits._
    val stream = t.eventsStream
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs = 30 * 60000L, delay = "1 minute")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    println(s"[demo] closed sessions so far: ${spark.table("sessions").count()}")

    // 3. SQL workflow: catalog views + custom native functions from SQL
    t.registerViews()
    val sqlRes = spark.sql(
      """SELECT d.lang, count(*) AS docs,
        |       round(avg(cosine_f(e.embedding, e.embedding)), 2) AS self_cos
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY d.lang ORDER BY docs DESC""".stripMargin).collect()
    println(s"[demo] sql+native fns: ${sqlRes.take(2).mkString(" | ")}")

    // 4. One-call corpus dedup (exact + MinHash near-dup, keep lowest id)
    val docs = t.documents.select(col("doc_id").as("id"), col("text"))
    val kept = graft.operators.Dedup.dedupCorpus(docs, threshold = 0.8).count()
    println(s"[demo] dedupCorpus kept $kept of ${docs.count()} docs")

    // 5. Near-dup cluster ids (transitive closure) + a stable train split —
    // the dataset-assembly tail of a training pipeline
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, 3, 64, 16, 0.8)
    val clusters = graft.operators.Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
    println(s"[demo] near-dup clusters: ${clusters.select("comp").distinct().count()}")
    val splitSizes = graft.operators.Sampling.hashSplit(docs, col("id"),
      Seq("train" -> 90, "heldout" -> 10))
      .groupBy("split").count().collect()
    println(s"[demo] split sizes: ${splitSizes.mkString(" ")}")

    // 6. Text read through the bring-your-own-InputFormat adapter
    val textPath = graft.sources.FileFormats.nationTextPath(t)
    val lines = graft.sources.HadoopInput.textLines(spark, textPath).count()
    println(s"[demo] TextInputFormat adapter read $lines nation lines")

    // 7. Warehouse maintenance: keyed MERGE + Bloom-pruned semi-join +
    // Z-order layout — the round-4 surface in three calls
    val base = t.customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val batch = base.limit(5).withColumn("c_acctbal", col("c_acctbal") + 1.0)
    println(s"[demo] upsert merged rows: ${graft.operators.Merge.upsert(base, batch, "c_custkey").count()}")
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    println(s"[demo] bloom-pruned semi-join survivors: ${
      graft.operators.BloomPrune.semiJoin(t.lineitem, "l_orderkey", urgent, "o_orderkey").count()}")
    println(s"[demo] z-order key of (42, 7): ${graft.functions.NativeKernels.zValue16(42L, 7L)}")
    spark.stop()
  }
}
