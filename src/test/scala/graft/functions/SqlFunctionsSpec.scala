package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration path: the native kernels must be
  * callable from plain SQL in a session built with GraftFunctionExtensions.
  */
class SqlFunctionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate may return the suite-shared session; install() covers
    // that path (withExtensions only applies to a fresh session)
    val s = SparkSession.builder().master("local[2]")
      .appName("graft-sql-ext")
      .withExtensions(new graft.GraftFunctionExtensions)
      .getOrCreate()
    graft.functions.install(s)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("native kernels are callable from SQL") {
    import spark.implicits._
    Seq((1L, Seq("a", "b", "a", "c"), Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("id", "toks", "v1", "v2").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT size(minhash_sig(transform(toks, x -> length(x) * 7L), 8)) AS n,
        |       simhash_fp(transform(toks, x -> length(x) * 7L)) AS fp,
        |       cosine_f(v1, v2) AS cos,
        |       lsh_bucket(v1, 4) AS bucket,
        |       size(shingles_of(toks, 2)) AS nsh
        |FROM t""".stripMargin).head()
    assert(row.getAs[Int]("n") == 8)
    assert(row.getAs[Double]("cos") == 0.0)
    assert(row.getAs[Long]("bucket") >= 0L && row.getAs[Long]("bucket") < 16L)
    assert(row.getAs[Int]("nsh") == 3) // "a b","b a","a c"
  }

  test("round-4 kernels are callable from SQL") {
    import spark.implicits._
    Seq((5L, 3L, Seq("a", "b", "c", "d"))).toDF("x", "y", "ws")
      .createOrReplaceTempView("r4t")
    val row = spark.sql(
      """SELECT z_value16(x, y) AS z, md5_windows(ws, 2) AS hs FROM r4t""").head()
    assert(row.getAs[Long]("z") == 27L)
    val hs = row.getSeq[String](1)
    assert(hs.length == 3 && hs.forall(_.matches("[0-9a-f]{32}")))
  }

  test("mistyped calls fail at analysis; INT inputs widen identically in both eval paths") {
    import spark.implicits._
    // an array can never be a Morton key — clear analysis error, not a
    // runtime ClassCastException (strings follow the built-ins: implicit
    // cast to LONG, so a non-numeric string errors at runtime under ANSI)
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT z_value16(array(1L), 2L)").head()
    }
    // md5_windows over a non-array errors at analysis too
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_windows('not an array', 2)").head()
    }
    // INT columns get an analysis-inserted cast to LONG, so interpreted
    // eval agrees with codegen (previously interpreted eval CCE'd)
    Seq((5, 3)).toDF("xi", "yi").createOrReplaceTempView("zints")
    assert(spark.sql("SELECT z_value16(xi, yi) AS z FROM zints")
      .head().getAs[Long]("z") == 27L)
  }

  test("SQL results match the Column API") {
    import spark.implicits._
    val df = Seq((Array(0.5f, 0.5f), Array(0.5f, -0.1f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_f(a, b) AS c FROM vecs").as[Double].head()
    val viaCol = df.select(graft.functions.cosine_f($"a", $"b").as("c")).as[Double].head()
    assert(viaSql == viaCol)
  }
}
