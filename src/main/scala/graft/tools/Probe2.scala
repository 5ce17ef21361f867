package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Fanout, Tables}
import graft.operators.{Dedup, TextOps}

/** Dev-only: q33 inverted-join variance investigation. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "probe2")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $n")
    }

    val docs = TextOps.withShingles(
      Fanout(t.documents.select(col("doc_id").as("id"), col("text"))),
      col("text"), 3, "shingles").select(col("id"), col("shingles"))

    time("warmup")(t.documents.count())
    for (r <- 1 to 5) {
      time(s"r$r q33-default")(Dedup.ngramJaccardPairs(docs, 0.7).count())
      spark.catalog.clearCache()
    }
    // shingle df distribution
    val inv = docs.select(col("id"), explode(col("shingles")).as("s"))
    val dfs = inv.groupBy("s").count().agg(
      max("count").as("max_df"), expr("percentile(count, 0.999)").as("p999"),
      sum(col("count") * col("count")).as("sum_df2")).collect()(0)
    println(s"shingle df: max=${dfs.get(0)} p999=${dfs.get(1)} sum_df2=${dfs.get(2)}")
    spark.stop()
  }
}
