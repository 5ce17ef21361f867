package graft.tools

import graft.Engine

/** Dev-only scratch main for inspecting schemas/plans during the build. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 4, appName = "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.printSchema()
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    ord.printSchema()
    ord.show(2)
    spark.stop()
  }
}
