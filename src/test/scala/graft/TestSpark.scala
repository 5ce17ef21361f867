package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (mirrors the reference's session
  * mode: TezClient.java:313 — one long-lived client, warm containers).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Engine
      .configure(SparkSession.builder().master("local[4]").appName("graft-test"), 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
