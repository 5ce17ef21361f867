package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val page =
    "<html><head><title>t</title>" +
      "<style>p { color: red; } /* <p>style trap</p> */</style>" +
      "<script>if (1 < 2) { var s = \"</div> trap\"; }</script>" +
      "</head><body>" +
      "<!-- comment trap <p>ghost</p> -->" +
      "<nav><a href=\"/\">home</a> | <a href=\"/x\">about</a></nav>" +
      "<h1>alpha &amp; beta</h1>" +
      "<p>one   two\n three</p>" +
      "<p>encoded &lt;b&gt; stays &quot;text&quot;</p>" +
      "<p>   </p>" + // whitespace-only block: dropped
      "<ul><li>it&#39;s here</li><li>a&nbsp;b</li></ul>" +
      "<div class=\"footer\">contact us</div>" +
      "</body></html>"

  test("extractBlocks: drops script/style/comment, segments, strips, decodes, normalizes") {
    val df = Seq((1L, page)).toDF("id", "html")
    val out = Html.extractBlocks(df, $"html")
      .select($"block_type", $"block_idx", $"block_text")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(
      ("nav", 0L, "home | about"),
      ("h1", 0L, "alpha & beta"),
      // in-block "\n" survives normalization (runs containing a newline
      // collapse to ONE newline; horizontal runs to one space)
      ("p", 0L, "one two\nthree"),
      ("p", 1L, "encoded <b> stays \"text\""),
      // p idx 2 (whitespace-only) dropped, but indices of earlier blocks
      // are stable — the pre-drop occurrence index contract
      ("li", 0L, "it's here"),
      ("li", 1L, "a b"),
      ("div", 0L, "contact us")))
  }

  test("extractText: content blocks only (nav/div chrome dropped), newline-joined in order") {
    val df = Seq((1L, page)).toDF("id", "html")
    val txt = Html.extractText(df, $"html", "ctext")
      .select($"ctext").as[String].head()
    assert(txt ==
      "alpha & beta\none two\nthree\nencoded <b> stays \"text\"\nit's here\na b")
  }

  test("decode order: &amp; decodes LAST so &amp;lt; yields literal &lt; not <") {
    val df = Seq((1L, "<p>&amp;lt;keep&amp;gt;</p>")).toDF("id", "html")
    val out = Html.extractBlocks(df, $"html")
      .select($"block_text").as[String].head()
    assert(out == "&lt;keep&gt;")
  }

  test("withHtmlColumn: synthesis wraps every word; round-trip recovers every block family") {
    val text = (1 to 17).map(i => s"w$i").mkString(" ") // 17 words
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val html = Html.withHtmlColumn(df, $"text", "html")
    val blocks = Html.extractBlocks(html.select($"doc_id", $"html"), $"html")
      .select($"block_type", $"block_idx", $"block_text")
      .as[(String, Long, String)].collect().toSeq
    assert(blocks.filter(_._1 == "h1").map(_._3) == Seq("w1 & w2 & w3"))
    // decimal numeric ref decodes (em dash); hex ref in the second li
    assert(blocks.filter(_._1 == "h2").map(_._3) == Seq("section — overview"))
    assert(blocks.filter(_._1 == "blockquote").map(_._3) == Seq("quoted words here"))
    // paras: words 4..13, 14..17 with the decoded <eop> marker, then the
    // static <br> para (newline preserved), then the div-nested para the
    // p pass CLAIMS from the footer (priority chain — no double-count)
    assert(blocks.filter(_._1 == "p").map(_._3) == Seq(
      (4 to 13).map(i => s"w$i").mkString(" ") + " <eop>",
      (14 to 17).map(i => s"w$i").mkString(" ") + " <eop>",
      "line one\nline two",
      "div nested para"))
    assert(blocks.filter(_._1 == "li").map(_._3) ==
      Seq("w16 w17", "it's \"quoted\""))
    assert(blocks.filter(_._1 == "td").map(_._3) == Seq("cell A text"))
    // nav claims its nested <p> (never emitted as content); the <abbr>
    // strips as residual inline markup
    assert(blocks.filter(_._1 == "nav").map(_._3) ==
      Seq("HT home | aboutnested menu item"))
    // the footer div keeps only its OWN text — the nested para went to
    // the p pass; then the divNestTrap: the stack kernel pairs same-tag
    // nesting by DEPTH, so the outer trap div's raw rejoins around the
    // carved-out inner ("outer scope  tail text" — the double space
    // collapses in the clean pass) and the inner emits its own block
    assert(blocks.filter(_._1 == "div").map(_._3) ==
      Seq("contact us", "outer scope tail text", "inner scope"))
    // the script/style/comment/<pre>/<link> traps never leak into any
    // block ("raw & code" would appear if <p\b> matched <pre>; css would
    // appear if <li\b> matched <link>)
    assert(blocks.forall(b => !b._3.contains("ghost") &&
      !b._3.contains("alert") && !b._3.contains("color") &&
      !b._3.contains("raw & code") && !b._3.contains("css")))
  }

  test("numeric refs: valid decimal/hex decode; invalid, out-of-range and surrogate refs stay literal") {
    val df = Seq((1L,
      "<p>a &#65; b &#x42; c &#x; d &#999999999; e &#xD800; f &#0; g &amp;#39;</p>"))
      .toDF("id", "html")
    val out = Html.extractBlocks(df, $"html").select($"block_text").as[String].head()
    // &amp;#39; renders as the literal &#39; (amp decodes LAST, after
    // numeric — never double-decoded)
    assert(out == "a A b B c &#x; d &#999999999; e &#xD800; f &#0; g &#39;")
  }

  test("stack kernel: same-tag nesting pairs by depth; strays and unterminated markup stay lenient") {
    // three-deep same-tag nesting: each div emits its OWN block, the
    // outer raws rejoin around the carved-out inner (the old regex
    // chain paired the outermost open with the FIRST close)
    val deep = "<div>a <div>b <div>c</div> d</div> e</div>"
    val df = Seq((1L, deep)).toDF("id", "html")
    val blocks = Html.extractBlocks(df, $"html")
      .select($"block_idx", $"block_text").as[(Long, String)].collect().toSeq
    assert(blocks == Seq((0L, "a e"), (1L, "b d"), (2L, "c")))
    // a stray close outside any block is dropped; an unclosed block
    // emits leniently at EOF; a bare '<' (not a tag) is literal text;
    // emission order is (rank, idx): p (rank 8) before div (rank 11)
    val messy = Seq((1L, "</p><div>kept text<p>tail < 3")).toDF("id", "html")
    val out = Html.extractBlocks(messy, $"html")
      .select($"block_type", $"block_text").as[(String, String)].collect().toSeq
    assert(out == Seq(("p", "tail < 3"), ("div", "kept text")))
  }

  test("extractLinks: one row per anchor; quoted hrefs both styles; traps never match") {
    val df = Seq((7L, "irrelevant")).toDF("doc_id", "text")
    val page = Html.withLinkHtml(df.select($"doc_id"), $"doc_id", "html")
    val links = Html.extractLinks(page, $"html")
      .select($"link_idx", $"href", $"anchor_text")
      .as[(Long, Option[String], String)].collect().toSeq
    // doc_id 7: d%5=2 d%3=1 d%11=7 d%7=0, g=2: (g+1)%5=3 g%5=2
    assert(links == Seq(
      (0L, Some("http://w2.ex1.net/p/7"), "first bold link"), // <b> stripped
      (1L, Some("https://site3.com/x/2"), "cross&site"), // &amp; decoded
      (2L, Some("//cdn.site2.com/lib.js"), "cdn asset"), // single-quoted href
      (3L, Some("/r/0"), "root rel"), // &nbsp; → space
      (4L, Some("next/1"), "path rel"),
      (5L, Some("?page=2"), "next page"),
      (6L, Some("#top"), "back to top"),
      (7L, Some("mailto:op@site2.com"), "mail"),
      (8L, None, "no href"))) // href-less named anchor: NULL href, still a row
    // the script-string ghost anchor and the <img>/<link> hrefs never leak
    assert(!links.flatMap(_._2).exists(h =>
      h.contains("ghost") || h.contains("img.ex0") || h.contains(".css")))
  }

  test("priority chain: a <p> inside <nav> is chrome (extractText drops it with the nav)") {
    val df = Seq((1L,
      "<html><body><nav>menu<p>nested link list</p></nav><p>real content here</p></body></html>"))
      .toDF("id", "html")
    val txt = Html.extractText(df, $"html", "ctext").select($"ctext").as[String].head()
    assert(txt == "real content here")
    // and the block table emits the nested text under the NAV block only
    val blocks = Html.extractBlocks(df, $"html")
      .select($"block_type", $"block_text").as[(String, String)].collect().toSeq
    assert(blocks == Seq(("nav", "menunested link list"), ("p", "real content here")))
  }

  test("blockSignals: link-density catches the link farm the tag rule misses; footer by tag only") {
    val farm = "<html><body>" +
      "<p>read <a href=\"/a\">this whole article here</a> and <a href=\"/b\">also this one</a></p>" + // mostly anchor text
      "<p>a normal paragraph with one <a href=\"/c\">link</a> in plenty of prose around it</p>" +
      "<nav><a href=\"/\">home</a> | <a href=\"/x\">about</a></nav>" +
      "<div>plain footer text</div>" +
      "</body></html>"
    val df = Seq((1L, farm)).toDF("id", "html")
    val out = Html.blockSignals(df, $"html")
      .select($"block_type", $"block_idx", $"link_chars", $"text_chars", $"boilerplate")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // p0: "read this whole article here and also this one" (46 chars);
    // links: "this whole article here"(23) + "also this one"(13) = 36
    assert(out(("p", 0L)) == (("p", 0L, 36L, 46L, true)),
      s"link farm must flag: ${out(("p", 0L))}")
    // p1: link "link"(4) in 74 chars of prose — content
    val p1 = out(("p", 1L))
    assert(p1._5 == false && p1._3 == 4L)
    // nav: both rules; div: tag rule alone (zero link chars)
    assert(out(("nav", 0L))._5 == true)
    assert(out(("div", 0L)) == (("div", 0L, 0L, 17L, true)))
  }

  test("withHtmlColumn: short docs (under 4 / under 2 words) stay total") {
    val df = Seq((1L, "solo"), (2L, "two words"), (3L, "a b c")).toDF("doc_id", "text")
    val blocks = Html.extractBlocks(
      Html.withHtmlColumn(df, $"text", "html").select($"doc_id", $"html"),
      $"html")
      .select($"doc_id", $"block_type", $"block_text")
      .as[(Long, String, String)].collect()
    // no DYNAMIC <p> blocks below 4 words — only the fixture's two
    // static traps (the <br> para and the div-nested para) remain; the
    // one-word doc gets the fallback li
    assert(blocks.filter(b => b._1 == 1L && b._2 == "p").map(_._3).toSeq ==
      Seq("line one\nline two", "div nested para"))
    assert(blocks.filter(b => b._1 == 1L && b._2 == "li").map(_._3).toSeq ==
      Seq("item only", "it's \"quoted\""))
    assert(blocks.filter(b => b._1 == 2L && b._2 == "li").map(_._3).toSeq ==
      Seq("two words", "it's \"quoted\""))
    assert(blocks.filter(b => b._1 == 3L && b._2 == "h1").map(_._3).toSeq ==
      Seq("a & b & c"))
  }
}
