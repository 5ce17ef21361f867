package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Fanout, Tables}
import graft.operators.{Dedup, TextOps}

/** Dev-only scratch main for inspecting schemas/plans/stage timings. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val textDocs = Fanout(t.documents.select(col("doc_id").as("id"), col("text")))
    val docs = TextOps.withShingles(textDocs, col("text"), 3, "shingles")
      .select(col("id"), col("shingles"))

    time("warmup")(t.documents.count())
    for (round <- 1 to 3) {
      time(s"r$round q31-minhash")(Dedup.minhashLshPairs(textDocs, 3, 64, 16, 0.7).count())
      spark.catalog.clearCache()
      time(s"r$round q33-jaccard")(Dedup.ngramJaccardPairs(docs, 0.7).count())
      spark.catalog.clearCache()
      time(s"r$round q32-simhash") {
        val fps = Dedup.simhashFingerprints(
          Fanout(t.documents).select(col("doc_id").as("id"),
            split(lower(col("text")), """\s+""").as("tokens")))
        Dedup.simhashPairs(fps, 3).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
