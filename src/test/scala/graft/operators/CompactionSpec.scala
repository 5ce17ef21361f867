package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  test("compactParquet merges a small-files mess into the computed file count") {
    val base = Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(64) // the mess: 64 tiny files
      .write.parquet(in)
    assert(parquetFiles(in).size == 64)
    val total = Compaction.dataBytes(spark, in)
    val n = Compaction.compactParquet(spark, in, out, targetBytes = total / 4)
    assert(parquetFiles(out).size == n && n >= 4 && n <= 6)
    // content identity
    val a = spark.read.parquet(in).orderBy("doc_id").collect()
    val b = spark.read.parquet(out).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("sorted compaction yields non-overlapping per-file ranges (data skipping)") {
    val base = Files.createTempDirectory("graft_compact_sorted").toString
    val in = s"$base/in"; val out = s"$base/out"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(16).write.parquet(in)
    val total = Compaction.dataBytes(spark, in)
    Compaction.compactParquet(spark, in, out, targetBytes = total / 4,
      sortCols = Seq(col("doc_id")))
    // each output file's [min,max] doc_id interval must not overlap another's
    val ranges = parquetFiles(out).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    })
    // a point predicate could therefore skip all but one file
    assert(ranges.size >= 4)
  }
}
