package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EnrichedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-static join enriches events with the dimension per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("uid", "segment")
    val input = MemoryStream[(Timestamp, Long)]
    val out = EventStreams.enriched(
      input.toDF().toDF("ts", "user_id"), dim, "user_id", "uid")
    val q = out.writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      input.addData((new Timestamp(60000), 1L), (new Timestamp(61000), 3L))
      q.processAllAvailable()
      val rows = spark.table("enr").select("user_id", "segment")
        .as[(Long, Option[String])].collect().toMap
      assert(rows == Map(1L -> Some("alpha"), 3L -> None)) // left join keeps unmatched
    } finally q.stop()
  }
}
