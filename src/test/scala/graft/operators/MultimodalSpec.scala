package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Multimodal.withMediaColumn(
    Seq((1L, "hello media"), (2L, "")).toDF("doc_id", "text"), "text")

  test("withMediaColumn attaches binary payload + typed metadata") {
    val r = media.select($"doc_id", octet_length($"media"), $"media_meta.n_bytes", $"media_meta.format")
      .as[(Long, Int, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((11, 11L, "utf8-blob")))
    assert(r(2L) == ((0, 0L, "utf8-blob")))
  }

  test("decodeFeatures: deterministic stub features, schema appended") {
    val d = Multimodal.decodeFeatures(media, "media")
    assert(d.schema.fieldNames.takeRight(4).toSeq ==
      Seq("media_checksum", "n_bytes", "width", "height"))
    val rows = d.select($"doc_id", $"media_checksum", $"n_bytes", $"width", $"height")
      .as[(Long, String, Long, Int, Int)].collect().sortBy(_._1)
    val expectedCk = Multimodal.StubCodec.md5Hex("hello media".getBytes("UTF-8"))
    assert(rows(0)._2 == expectedCk && rows(0)._3 == 11L)
    assert(rows(0)._4 >= 16 && rows(0)._4 < 16 + 1024)
    // same run twice -> identical output (decode is pure)
    val again = Multimodal.decodeFeatures(media, "media")
      .select($"doc_id", $"media_checksum", $"n_bytes", $"width", $"height")
      .as[(Long, String, Long, Int, Int)].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
  }

  test("resize preserves aspect ratio within the bounding box") {
    val d = Multimodal.resize(
      Seq((2000, 1000), (100, 50)).toDF("width", "height"), 256)
    val r = d.select($"width", $"out_w", $"out_h").as[(Int, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(2000) == ((256, 128))) // scaled down
    assert(r(100) == ((100, 50)))   // untouched, already inside box
  }

  test("sampleFrames explodes every stride-th frame index") {
    val base = Seq((1L, 10L)).toDF("doc_id", "n_bytes")
    val frames = Multimodal.sampleFrames(base, 4)
      .select($"frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 4, 8)) // n_frames = 10 % 240 + 1 = 11
  }
}
