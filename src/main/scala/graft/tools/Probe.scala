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

    val docs = TextOps.withShingles(
      Fanout(t.documents.select(col("doc_id").as("id"), col("text"))),
      col("text"), 3, "shingles").select(col("id"), col("shingles"))

    time("warmup")(t.documents.count())
    val sized = docs.withColumn("n_sh", size(col("shingles"))).filter(col("n_sh") > 0)
    val sig = Dedup.minhashSignatures(sized.select(col("id"), col("shingles")), 64)
    time("signatures")(sig.count())
    time("full-minhash")(Dedup.minhashLshPairs(docs, 64, 16, 0.7).count())

    // narrow variant: hash array materialized once, 64 array_min over attr
    val xsDf = sized.select(col("id"), col("shingles"))
      .withColumn("xs", transform(col("shingles"), s => Dedup.SharedHash.hash28(s)))
    val sigNarrow = xsDf.select(
      (col("id") +: (0 until 64).map { i =>
        array_min(transform(col("xs"), x =>
          (lit(Dedup.hashA(i)) * x + lit(Dedup.hashB(i))) % lit(Dedup.P))).as(s"m$i")
      }): _*)
    time("sig-narrow")(sigNarrow.count())
    time("sig-narrow-again")(sigNarrow.count())

    val cachedDocs = docs.persist()
    time("docs-cache-fill")(cachedDocs.count())
    time("full-minhash-cacheddocs")(Dedup.minhashLshPairs(cachedDocs, 64, 16, 0.7).count())
    cachedDocs.unpersist()
    spark.stop()
  }
}
