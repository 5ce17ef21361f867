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
    Warc.parseFields(Warc.records(df, "warc"), $"rec")
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

  // ===== byte-true + gzip path ============================================

  private def recBytes(id: Long, uri: String, html: String, cs: String,
      malformEvery: Int = 0): Array[Byte] = {
    val df = Seq((id, uri, html, cs)).toDF("doc_id", "uri", "html", "cs")
    Warc.withWarcRecordBytes(df, $"doc_id", $"uri", $"html", $"cs", "rec",
      malformEvery).select($"rec").as[Array[Byte]].head()
  }

  private val Sep = "\r\n\r\n".getBytes("US-ASCII")

  private def member(rec: Array[Byte]): Array[Byte] =
    graft.functions.NativeKernels.gzipMember(rec ++ Sep)

  private def parseBin(file: Array[Byte]) = {
    val df = Seq((0L, file)).toDF("file_id", "warc")
    Warc.parseFieldsBinary(Warc.recordsGz(df, "warc"), $"rec")
      .select($"warc_version", $"url", $"record_id", $"status",
        $"charset", $"html", $"malformed")
      .as[(Option[String], Option[String], Option[String], Option[Int],
        Option[String], Option[String], Boolean)]
      .collect().toSeq
  }

  test("byte synthesis: Content-Lengths count OCTETS, not chars (multibyte UTF-8 payload)") {
    val html = "<p>café €</p>" // é = 2 bytes, € = 3 bytes in UTF-8
    val r = recBytes(5L, "http://example.com/s/5", html, "utf-8")
    val s = new String(r, "ISO-8859-1") // byte-transparent view
    val header = s.substring(0, s.indexOf("\r\n\r\n"))
    val cl = "\r\nContent-Length: ([0-9]+)".r
      .findFirstMatchIn(header).get.group(1).toInt
    // record length checks out in BYTES (chars would be 3 short)
    assert(r.length == header.length + 4 + cl)
    assert(html.length != html.getBytes("UTF-8").length) // the trap is live
    val hcl = "Content-Length: ([0-9]+)".r
      .findFirstMatchIn(s.substring(header.length + 4)).get.group(1).toInt
    assert(hcl == html.getBytes("UTF-8").length)
  }

  test("gzip file round-trip: members decompress, octet framing splits, charset decodes (incl. latin-1 high bytes)") {
    val h1 = "<p>plain ascii</p>"
    val h2 = "<p>café € multibyte</p>"
    val h3 = "<p>café latin</p>" // é = single 0xE9 byte under latin-1
    val file =
      member(recBytes(1L, "http://e.com/1", h1, "utf-8")) ++
        member(recBytes(2L, "http://e.com/2", h2, "utf-8")) ++
        member(recBytes(3L, "http://e.com/3", h3, "iso-8859-1"))
    val out = parseBin(file)
    assert(out.size == 3)
    assert(out.forall(!_._7))
    assert(out.map(_._6.get) == Seq(h1, h2, h3))
    assert(out.map(_._5.get) == Seq("utf-8", "utf-8", "iso-8859-1"))
    assert(out.map(_._3.get) ==
      Seq("urn:graft:1", "urn:graft:2", "urn:graft:3"))
    // a charset-oblivious (utf-8-everything) decode would have mangled
    // h3's 0xE9 byte into U+FFFD
    assert(!out(2)._6.get.contains('\uFFFD'))
  }

  test("corrupt gzip member header: prior records survive intact, the stream ends there") {
    val df = Seq(
      (0L, "http://e.com/0", "<p>zero</p>", "utf-8"),
      (1L, "http://e.com/1", "<p>one</p>", "utf-8"))
      .toDF("doc_id", "uri", "html", "cs")
    val recs = Warc.withWarcRecordBytes(df, $"doc_id", $"uri", $"html",
      $"cs", "rec")
    // docsPerFile = 2, corruptEveryFile = 1 → file 0's last slot
    // (doc 1) gets its gzip magic zeroed
    val files = Warc.withWarcFilesGz(recs, $"doc_id", $"rec",
      docsPerFile = 2, corruptEveryFile = 1)
    val out = Warc.parseFieldsBinary(Warc.recordsGz(files, "warc"), $"rec")
      .select($"url", $"malformed")
      .as[(Option[String], Boolean)].collect().toSeq
    assert(out == Seq((Some("http://e.com/0"), false)))
  }

  test("truncated deflate stream: deterministic partial remainder quarantines; prior records parse") {
    val h1 = "<p>first record is fine</p>"
    // long, low-redundancy body so truncating the member leaves a
    // non-empty partial inflate
    val h2 = "<p>" + (0 until 400).map(i => s"w$i").mkString(" ") + "</p>"
    val m2 = member(recBytes(2L, "http://e.com/2", h2, "utf-8"))
    val file = member(recBytes(1L, "http://e.com/1", h1, "utf-8")) ++
      m2.dropRight(12)
    val out = parseBin(file)
    assert(out.head._2.contains("http://e.com/1") && !out.head._7)
    // the partial record's framing cannot check out → quarantined tail
    assert(out.size == 2 && out.last._7)
  }

  test("payload digest: header round-trips, verify recomputes from the carried body, mangled digest flags false") {
    val html = "<p>café €</p>" // multibyte: digest is over the OCTETS
    val df = Seq((0L, html), (13L, html), (5L, html))
      .toDF("doc_id", "html")
    val recs = Warc.withWarcRecordBytes(df, $"doc_id",
      concat(lit("http://e.com/"), $"doc_id"), $"html", lit("utf-8"),
      "rec", digest = true, corruptDigestEvery = 13)
    val file = recs.orderBy($"doc_id").select($"rec").as[Array[Byte]]
      .collect().map(member).reduce(_ ++ _)
    val out = Warc.verifyPayloadDigest(
      Warc.parseFieldsBinary(Warc.recordsGz(
        Seq((0L, file)).toDF("file_id", "warc"), "warc"), $"rec"))
      .select($"record_id", $"payload_digest", $"digest_ok")
      .as[(String, String, Option[Boolean])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = "sha256:" + java.security.MessageDigest
      .getInstance("SHA-256").digest(html.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // docs 0 and 13 hit the %13 trap (stored digest mangled, content
    // fine); doc 5 carries the true digest and verifies
    assert(out("urn:graft:5") == ((expected, Some(true))))
    assert(out("urn:graft:0")._1 != expected &&
      out("urn:graft:0")._2 == Some(false))
    assert(out("urn:graft:13")._2 == Some(false))
    // a record synthesized WITHOUT digest parses digest-less: null
    // claim, null verdict (nothing to verify — never a quarantine)
    val plain = Warc.verifyPayloadDigest(
      Warc.parseFieldsBinary(Warc.recordsGz(
        Seq((0L, member(recBytes(1L, "http://e.com/1", "<p>x</p>",
          "utf-8")))).toDF("file_id", "warc"), "warc"), $"rec"))
      .select($"payload_digest", $"digest_ok")
      .as[(Option[String], Option[Boolean])].head()
    assert(plain == ((None, None)))
  }

  test("char/byte parity: identical fields on an all-ASCII corpus") {
    val htmls = Seq("<p>alpha</p>", "<p>beta gamma</p>")
    val charOut = {
      val rs = htmls.zipWithIndex.map { case (h, i) =>
        rec(i.toLong, "s", h)
      }
      parse(rs.mkString("", "\r\n\r\n", "\r\n\r\n"))
    }
    val binOut = {
      val file = htmls.zipWithIndex.map { case (h, i) =>
        member(recBytes(i.toLong, s"http://example.com/s/$i", h, "utf-8"))
      }.reduce(_ ++ _)
      parseBin(file)
    }
    assert(charOut.map(r => (r._1, r._2, r._3, r._5, r._6)) ==
      binOut.map(r => (r._1, r._2, r._4, r._6, r._7)))
  }
}
