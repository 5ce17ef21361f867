package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** MRInput-parity sources: the bring-your-own-InputFormat adapter (both
  * Hadoop API generations) and the text/CSV/JSON format round-trips.
  */
class HadoopInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val textDir = {
    val d = Files.createTempDirectory("hadoopinput").toString
    (1 to 100).map(i => s"line_$i").toDF("value")
      .write.mode("overwrite").text(d)
    d
  }

  test("new-API TextInputFormat adapter reads the same lines as spark.read.text") {
    val viaAdapter = HadoopInput.textLines(spark, textDir)
      .as[String].collect().sorted.toSeq
    val viaNative = spark.read.text(textDir).as[String].collect().sorted.toSeq
    assert(viaAdapter == viaNative)
    assert(viaAdapter.size == 100)
  }

  test("old-API (mapred) TextInputFormat adapter reads the same lines") {
    val rdd = HadoopInput.oldApi(spark, textDir,
      classOf[org.apache.hadoop.mapred.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text])
    // Writables are reused by the reader — copy before collect
    val lines = rdd.map(_._2.toString).collect().sorted.toSeq
    assert(lines == (1 to 100).map(i => s"line_$i").sorted.toSeq)
  }

  test("InputFormat splits drive partitioning (one partition per split)") {
    // two files → TextInputFormat plans at least two splits
    val d = Files.createTempDirectory("splits").toString
    (1 to 50).map(i => s"a_$i").toDF("v").coalesce(1).write.mode("overwrite").text(s"$d/f1")
    (1 to 50).map(i => s"b_$i").toDF("v").coalesce(1).write.mode("overwrite").text(s"$d/f2")
    val rdd = HadoopInput.newApi(spark, s"$d/f1,$d/f2",
      classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
      classOf[org.apache.hadoop.io.LongWritable],
      classOf[org.apache.hadoop.io.Text])
    assert(rdd.getNumPartitions >= 2)
    assert(rdd.count() == 100)
  }

  test("malformed records: PERMISSIVE nulls and captures, FAILFAST raises") {
    // the data-quality surface a real text/CSV pipeline needs: bad rows
    // must be quarantineable, not silently dropped or fatal by surprise
    val d = Files.createTempDirectory("badcsv").toString
    Seq("id,v", "1,10", "2,notanumber", "3,30").toDF("value")
      .coalesce(1).write.mode("overwrite").text(d)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt", org.apache.spark.sql.types.StringType)))
    // cache: Spark disallows querying ONLY the corrupt column off the raw
    // file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parse once, then ask
    val permissive = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(d)
      .cache()
    val rows = permissive.collect()
    assert(rows.length == 3)
    val bad = permissive.filter(col("_corrupt").isNotNull)
      .select("_corrupt").as[String].collect()
    assert(bad.toSeq == Seq("2,notanumber")) // quarantined, value preserved
    assertThrows[org.apache.spark.SparkException] {
      spark.read.schema(org.apache.spark.sql.types.StructType(schema.dropRight(1)))
        .option("header", "true").option("mode", "FAILFAST").csv(d).collect()
    }
  }

  test("CSV and JSON derived sources round-trip the parquet tables exactly") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val csvBack = FileFormats.customerCsv(t)
      .orderBy("c_custkey").collect().toSeq
    val parquetRows = t.customer
      .select(FileFormats.customerCsvSchema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("c_custkey").collect().toSeq
    assert(csvBack == parquetRows)

    val jsonBack = FileFormats.ordersJson(t).orderBy("o_orderkey").collect().toSeq
    val ordersRows = t.orders
      .select(FileFormats.ordersJsonSchema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("o_orderkey").collect().toSeq
    assert(jsonBack == ordersRows)
  }
}
