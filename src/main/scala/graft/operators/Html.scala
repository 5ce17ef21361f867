package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup TEXT EXTRACTION — the entry-point stage of every
  * published curation pipeline (C4, CCNet, RefinedWeb and Dolma all
  * start from crawled HTML, not plain text): a deterministic
  * tag-strip / entity-decode / block-segmentation extractor in the
  * resiliparse-lite shape, expressed entirely as codegen'd Catalyst
  * string expressions so the whole stage is ONE narrow zero-shuffle
  * pass over the scan — at 100 TB the extractor IS the scan, and any
  * join or shuffle here would dominate the whole pipeline.
  *
  * The extraction contract (applied identically by the DuckDB oracle):
  *
  *  1. DROP non-content subtrees: `<script>…</script>`,
  *     `<style>…</style>` and `<!-- … -->` comments (dotall,
  *     non-greedy — the standard first pass; anything inside them,
  *     including tag-looking text, never reaches the output).
  *  2. SEGMENT into blocks by container element — `nav`, `h1`, `p`,
  *     `li`, `div` — keeping each block's element type and its
  *     occurrence index within that type. Blocks are emitted in
  *     (type-rank, index) order with ranks nav=0 < h1=1 < p=2 < li=3
  *     < div=4.
  *  3. STRIP residual inline tags (`<a>`, … → removed) inside each
  *     block.
  *  4. DECODE entities — `&lt; &gt; &quot; &#39; &nbsp;` first,
  *     `&amp;` LAST (the standard order: decoding `&amp;` first would
  *     double-decode `&amp;lt;`). Decoding happens AFTER tag-strip, so
  *     an encoded literal like `&lt;b&gt;` survives as visible text —
  *     exactly what a browser renders.
  *  5. NORMALIZE whitespace per block (collapse runs, trim) and drop
  *     blocks that normalize to empty.
  *
  * Reference: the reference runtime ships text through opaque per-row
  * user processors (tez-mapreduce/src/main/java/org/apache/tez/
  * mapreduce/processor/map/MapProcessor.java — arbitrary record
  * transforms the engine cannot see into); extraction-as-expression is
  * the Spark-native replacement — no UDF, no per-row interpreter,
  * whole-stage codegen end to end, and Catalyst can prune/push through
  * it. The extraction RULES come from the public pipeline literature
  * (C4 — Raffel et al. 2020 §2.2; CCNet — Wenzek et al. 2019;
  * RefinedWeb — Penedo et al. 2023; Dolma — Soldaini et al. 2024;
  * resiliparse/jusText as the deterministic extractor family).
  */
object Html {

  /** Block-level container tags recognized by the segmenter, with
    * their emission ranks. `nav` and `div` are BOILERPLATE types
    * (navigation chrome, footers); `h1`/`p`/`li` are CONTENT — the
    * split [[extractText]] uses.
    */
  val blockTags: Seq[(String, Int)] =
    Seq(("nav", 0), ("h1", 1), ("p", 2), ("li", 3), ("div", 4))

  /** Content ranks: blocks contributing to [[extractText]]'s document
    * text (boilerplate nav/footer chrome excluded — the C4/RefinedWeb
    * main-content rule in its deterministic teaching form).
    */
  val contentRanks: Set[Int] = Set(1, 2, 3)

  private val entitySteps: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Pass 1: drop script/style/comment subtrees. */
  def dropNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?s)<script\\b[^>]*>.*?</script>", ""),
      "(?s)<style\\b[^>]*>.*?</style>", ""),
      "(?s)<!--.*?-->", "")

  /** Pass 3: strip residual tags inside a block. */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  /** Pass 4: entity decode, `&amp;` last. */
  def decodeEntities(c: Column): Column =
    entitySteps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** Pass 5: whitespace normalization. */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full per-block clean: strip → decode → normalize. */
  def cleanBlock(raw: Column): Column =
    normalizeWs(decodeEntities(stripTags(raw)))

  /** All blocks of the document as one in-order array of
    * (rank, block_type, block_idx, raw) structs — the shared core of
    * [[extractBlocks]] and [[extractText]]. Array order IS
    * (rank, idx) order by construction, so no sort is ever needed.
    */
  private def blockStructs(html: Column): Column = {
    val cleaned = dropNonContent(html)
    concat(blockTags.map { case (tag, rank) =>
      transform(
        regexp_extract_all(cleaned, lit(s"(?s)<$tag[^>]*>(.*?)</$tag>"),
          lit(1)),
        (x, i) => struct(lit(rank).as("rank"), lit(tag).as("block_type"),
          i.as("block_idx"), x.as("raw")))
    }: _*)
  }

  /** BLOCK TABLE extraction: one output row per non-empty block —
    * (input columns…, block_type, block_idx, block_text), the
    * structured form a block-level quality model consumes. `block_idx`
    * is the occurrence index within the block's type (before
    * empty-block dropping, so indices are stable under content edits
    * that empty a block).
    */
  def extractBlocks(df: DataFrame, html: Column): DataFrame =
    df.withColumn("__b", explode(blockStructs(html)))
      .withColumn("block_text", cleanBlock(col("__b.raw")))
      .filter(length(col("block_text")) > 0)
      .select((df.columns.map(col) ++ Seq(
        col("__b.block_type").as("block_type"),
        col("__b.block_idx").cast("long").as("block_idx"),
        col("block_text"))): _*)

  /** BLOCK SIGNALS — the link-density boilerplate heuristic every
    * published extractor runs (jusText / trafilatura / resiliparse:
    * a block whose text is mostly anchor text is navigation chrome
    * regardless of its tag): per block, `link_chars` = Σ length of the
    * cleaned inner text of its `<a>` elements, `text_chars` = length
    * of the cleaned block text, and
    * `boilerplate` = chrome-by-tag (nav/div) OR 2·link_chars >
    * text_chars (link density > ½, exact integers — no float
    * boundary). The tag rule catches footers with no links; the
    * density rule catches link farms inside content tags — the spec
    * pins each firing alone. Same one narrow pass as
    * [[extractBlocks]]; empty blocks drop.
    *
    * Output: input columns + (block_type, block_idx, link_chars,
    * text_chars, block_text, boilerplate).
    */
  def blockSignals(df: DataFrame, html: Column): DataFrame = {
    val aInner = (raw: Column) =>
      regexp_extract_all(raw, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1))
    df.withColumn("__b", explode(blockStructs(html)))
      .withColumn("block_text", cleanBlock(col("__b.raw")))
      .filter(length(col("block_text")) > 0)
      .withColumn("link_chars",
        aggregate(transform(aInner(col("__b.raw")), x => cleanBlock(x)),
          lit(0L), (a, x) => a + length(x).cast("long")))
      .withColumn("text_chars", length(col("block_text")).cast("long"))
      .select((df.columns.map(col) ++ Seq(
        col("__b.block_type").as("block_type"),
        col("__b.block_idx").cast("long").as("block_idx"),
        col("link_chars"), col("text_chars"), col("block_text"),
        (col("__b.rank").isin(0, 4) ||
          lit(2L) * col("link_chars") > col("text_chars"))
          .as("boilerplate"))): _*)
  }

  /** DOCUMENT TEXT extraction: the content blocks (h1/p/li — nav and
    * div chrome dropped as boilerplate) cleaned and joined with
    * newlines in (rank, idx) order, appended as `out`. The shape the
    * tagger table / dedup / tokenizer stages consume — raw crawled
    * HTML in, pipeline-ready text out, zero shuffles.
    */
  def extractText(df: DataFrame, html: Column, out: String): DataFrame = {
    // content ranks are the contiguous h1=1..li=3 band (nav=0/div=4 chrome)
    val content = filter(blockStructs(html),
      b => b.getField("rank") >= 1 && b.getField("rank") <= 3)
    df.withColumn(out,
      array_join(
        filter(transform(content, b => cleanBlock(b.getField("raw"))),
          t => length(t) > 0), "\n"))
  }

  /** Deterministic HTML FIXTURE synthesis (the [[Multimodal]]
    * `withImageColumn` discipline for markup): wrap a plain-text
    * document into an HTML page — head with style + script traps
    * (tag-looking content that must be dropped), a comment trap, nav
    * chrome, an `<h1>` from the first three words with `&amp;`
    * separators, `<p>` blocks of ten words each carrying an encoded
    * `&lt;eop&gt;` literal, a two-item `<ul>` (last two words joined
    * by `&nbsp;`, plus an entity-quoting item), and a `<div>` footer.
    * Every extraction rule has a trap that breaks the oracle hash if
    * the rule drifts; the DuckDB oracle replays this exact
    * concatenation arithmetic.
    */
  def withHtmlColumn(df: DataFrame, text: Column, out: String): DataFrame = {
    val ws = regexp_extract_all(text, lit("""\S+"""), lit(0))
    val n = size(ws)
    val title = array_join(slice(ws, 1, 3), " &amp; ")
    val paras = when(n >= 4,
      concat_ws("", transform(
        sequence(lit(0), floor((n - lit(4)) / lit(10)).cast("int")),
        k => concat(lit("<p>"),
          array_join(slice(ws, k * 10 + 4, lit(10)), " "),
          lit(" &lt;eop&gt;</p>"))))).otherwise(lit(""))
    val li1 = when(n >= 2, array_join(slice(ws, n - 1, lit(2)), "&nbsp;"))
      .otherwise(lit("item&nbsp;only"))
    df.withColumn(out, concat(
      lit("<html><head><title>fixture</title>" +
        "<style>p { color: #fff; }</style>" +
        "<script>if (1 < 2) { alert(\"x &amp; y\"); }</script>" +
        "</head><body><!-- <p>ghost block</p> -->" +
        "<nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>" +
        "<h1>"),
      title, lit("</h1>"), paras,
      lit("<ul><li>"), li1,
      lit("</li><li>it&#39;s &quot;quoted&quot;</li></ul>" +
        "<div class=\"footer\">contact us</div></body></html>")))
  }
}
