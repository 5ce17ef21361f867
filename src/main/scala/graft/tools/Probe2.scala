package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Fanout, Tables}
import graft.operators.{Dedup, TextOps}

/** Dev-only: decompose q31 minhash stage costs. */
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

    val textDocs = Fanout(t.documents.select(col("doc_id").as("id"), col("text")))
    time("warmup")(t.documents.count())

    val sigPlain = textDocs
      .withColumn("__w", split(lower(col("text")), """\s+"""))
      .withColumn("__sig", graft.functions.minhash_words(col("__w"), 3, 64))
      .filter(col("__sig").isNotNull)
      .select(col("id") +: (0 until 64).map(i => element_at(col("__sig"), i + 1).as(s"m$i")): _*)
    time("sig-kernel")(sigPlain.count())
    time("sig-kernel-2")(sigPlain.count())

    val sig = sigPlain.persist()
    time("sig-cache-fill")(sig.count())
    val banded = sig.select(col("id"), explode(array((0 until 16).map { b =>
      struct(lit(b).as("band"), concat_ws("_", (0 until 4).map(r =>
        col(s"m${b * 4 + r}").cast("string")): _*).as("key"))
    }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    time("banded-explode")(banded.count())
    val cand = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("cand-join")(cand.count())

    val sized = TextOps.withShingles(textDocs, col("text"), 3, "shingles")
      .withColumn("n_sh", size(col("shingles"))).filter(col("n_sh") > 0)
    time("shingles-count")(sized.select(sum(size(col("shingles")))).collect()(0))
    val sizedC = sized.persist()
    time("shingles-cache-fill")(sizedC.count())
    val candC = cand.persist(); candC.count()
    val verify = candC
      .join(sizedC.as("a"), col("id_a") === col("a.id"))
      .join(sizedC.as("b"), col("id_b") === col("b.id"))
      .withColumn("n_common", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .filter(col("n_common") > 0)
    time("verify-join")(verify.count())
    time("full-q31")(Dedup.minhashLshPairs(textDocs, 3, 64, 16, 0.7).count())
    spark.stop()
  }
}
