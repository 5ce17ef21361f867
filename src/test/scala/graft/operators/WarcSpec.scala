package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(id: Long, source: String, html: String,
      malformEvery: Int = 0): String = {
    val df = Seq((id, source, html)).toDF("doc_id", "source", "html")
    Warc.withWarcRecord(df, $"doc_id", $"source", $"html", "rec",
      malformEvery).select($"rec").as[String].head()
  }

  private def parse(warcFile: String) = {
    val df = Seq((0L, warcFile)).toDF("file_id", "warc")
    Warc.parseFields(Warc.records(df, $"warc"), $"rec")
      .select($"warc_version", $"url", $"status", $"content_type",
        $"html", $"malformed")
      .as[(Option[String], Option[String], Option[Int], Option[String],
        Option[String], Boolean)]
      .collect().toSeq
  }

  test("record synthesis: Content-Length framing is exact at both layers") {
    val r = rec(7L, "src1", "<p>seven</p>")
    assert(r.startsWith("WARC/1.0\r\n"))
    // WARC Content-Length counts the full HTTP payload
    val cl = "\r\nContent-Length: ([0-9]+)\r\n\r\n".r
      .findFirstMatchIn(r).get.group(1).toInt
    val header = r.substring(0, r.indexOf("\r\n\r\n"))
    assert(r.length == header.length + 4 + cl)
    // HTTP Content-Length counts the body
    val http = r.substring(header.length + 4)
    val hh = http.substring(0, http.indexOf("\r\n\r\n"))
    val hcl = "Content-Length: ([0-9]+)".r
      .findFirstMatchIn(hh).get.group(1).toInt
    assert(http.substring(hh.length + 4) == "<p>seven</p>")
    assert(hcl == "<p>seven</p>".length)
  }

  test("multi-record file round-trips; a payload embedding 'WARC/1.0' cannot desync the framing") {
    // record 2's html EMBEDS a full fake record — marker-scanning would
    // split inside it; Content-Length arithmetic must sail past
    val trap = "WARC/1.0\r\nContent-Length: 0\r\n\r\n"
    val r1 = rec(1L, "s", "<p>one</p>")
    val r2 = rec(2L, "s", s"<p>$trap</p>")
    val r3 = rec(3L, "s", "<p>three</p>")
    val file = Seq(r1, r2, r3).mkString("", "\r\n\r\n", "\r\n\r\n")
    val out = parse(file)
    assert(out.size == 3)
    assert(out.forall(!_._6))
    assert(out.map(_._2.get) == Seq(1L, 2L, 3L)
      .map(i => s"http://example.com/s/$i"))
    assert(out(1)._5.get == s"<p>$trap</p>")
    assert(out.forall(r => r._3.contains(200) &&
      r._4.contains("text/html; charset=utf-8")))
  }

  test("corrupted version line quarantines THAT record only (length-preserving corruption)") {
    val r1 = rec(0L, "s", "<p>zero</p>", malformEvery = 23) // 0 % 23 == 0
    val r2 = rec(1L, "s", "<p>one</p>", malformEvery = 23)
    val file = Seq(r1, r2).mkString("", "\r\n\r\n", "\r\n\r\n")
    val out = parse(file)
    assert(out.size == 2)
    assert(out(0) == ((Some("WARC/9.9"), None, None, None, None, true)))
    assert(out(1)._6 == false && out(1)._2.contains("http://example.com/s/1"))
  }

  test("truncated payload: earlier records parse, the remainder quarantines as ONE malformed tail") {
    val r1 = rec(1L, "s", "<p>first is fine</p>")
    val r2 = rec(2L, "s", "<p>second gets truncated</p>")
    val file = r1 + "\r\n\r\n" + r2.substring(0, r2.length - 10)
    val out = parse(file)
    assert(out.size == 2)
    assert(out(0)._6 == false && out(0)._2.contains("http://example.com/s/1"))
    // the tail LOOKS like a record prefix (version parses, URI parses)
    // but its actual length disagrees with the declared Content-Length —
    // the framing check quarantines it
    assert(out(1)._6 == true && out(1)._1.contains("WARC/1.0") &&
      out(1)._2.isEmpty && out(1)._5.isEmpty)
  }

  test("missing record separator: framing stops; the remainder re-validates on its own merits") {
    val r1 = rec(1L, "s", "<p>ok</p>")
    val r2 = rec(2L, "s", "<p>follows without separator</p>")
    val r3 = rec(3L, "s", "<p>third</p>")
    // remainder == exactly one complete record: its own framing checks
    // out, so the field parser RECOVERS it (malformed = false)
    val solo = parse(r1 + r2)
    assert(solo.size == 2 && solo(0)._6 == false && solo(1)._6 == false &&
      solo(1)._2.contains("http://example.com/s/2"))
    // remainder carrying MORE than one record: its length disagrees with
    // the first record's declared Content-Length — quarantined whole,
    // records after the break are lost to the tail (the documented
    // poison-the-rest cost of a framing break)
    val multi = parse(r1 + r2 + "\r\n\r\n" + r3 + "\r\n\r\n")
    assert(multi.size == 2 && multi(0)._6 == false && multi(1)._6 == true)
  }

  test("garbage file: one malformed record, nothing thrown") {
    val out = parse("this is not a warc file at all")
    assert(out == Seq((None, None, None, None, None, true)))
  }
}
