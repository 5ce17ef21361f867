package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}
import graft.operators.TextOps

/** Dev-only: isolate shingle-construction cost. */
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
      t.documents.select(col("doc_id").as("id"), col("text")),
      col("text"), 3, "shingles").select(col("id"), col("shingles"))

    time("warm-scan")(t.documents.count())
    time("sum-size-shingles")(docs.select(sum(size(col("shingles")))).collect()(0))
    time("sum-size-again")(docs.select(sum(size(col("shingles")))).collect()(0))
    time("explode-count")(docs.select(explode(col("shingles"))).count())
    // variant: words built but shingle via simple transform w/o slice
    val d2 = t.documents.select(col("doc_id").as("id"), col("text"))
      .withColumn("w", split(lower(col("text")), """\s+"""))
    time("just-words-sumsize")(d2.select(sum(size(col("w")))).collect()(0))
    val d3 = d2.withColumn("sh",
      transform(col("w"), (e, i) =>
        concat_ws(" ", e, element_at(col("w"), i + 2), element_at(col("w"), i + 3))))
    time("transform-elemat")(d3.select(sum(size(col("sh")))).collect()(0))
    time("explode-elemat")(d3.select(explode(col("sh"))).count())
    docs.select(explode(col("shingles"))).explain("formatted")
    spark.stop()
  }
}
