package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EnrichedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream-stream interval join matches only within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600000L + min * 60000L)
    val clicks = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long)]
    val joined = EventStreams.intervalJoin(
      clicks.toDF().toDF("ts", "user_id"),
      buys.toDF().toDF("rts", "user_id"),
      "user_id", delay = "1 minute", within = "10 MINUTES")
      .select($"l.user_id", $"ts", $"rts")
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L))
      buys.addData((ts(5), 1L), (ts(30), 2L)) // 2L buys too late to attribute
      q.processAllAvailable()
      val rows = spark.table("ssj").as[(Long, Timestamp, Timestamp)].collect().toSeq
      assert(rows == Seq((1L, ts(0), ts(5))))
    } finally q.stop()
  }

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
