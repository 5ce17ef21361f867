package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC crawl-container ingestion — the format Common Crawl actually
  * ships (ISO 28500): a WARC file is a concatenation of records, each
  * `WARC/1.0` version line + header lines + blank line + a payload of
  * exactly `Content-Length` units, records separated by two CRLFs; a
  * `response` record's payload is itself an HTTP response (status line +
  * headers + blank line + body — the crawled HTML). This module is the
  * "crawl in" entry point ahead of [[Html]]: file → records → typed
  * fields (url, status, content type, html), malformed records
  * quarantined AS DATA (null fields + a `malformed` flag — the
  * [[Multimodal]] corrupt-payload convention, never a dropped row or a
  * thrown task).
  *
  * Framing is exact offset arithmetic ([[graft.functions.NativeKernels
  * .warcSplitRecords]]) — Content-Length-driven, never marker-scanning,
  * so a payload containing the literal text `WARC/1.0` cannot desync
  * the stream. TEACHING SIMPLIFICATION (documented, like [[Html]]'s
  * regex segmenter): lengths and offsets are CHARS over a string
  * column, which equals bytes on the ASCII fixture corpus; the
  * byte-true production variant is the same arithmetic over a binary
  * column. Field parsing requires the framing to CHECK OUT — a record
  * whose actual length disagrees with its declared Content-Length (the
  * malformed tail a broken file yields) quarantines even when its
  * prefix looks parseable.
  *
  * Reference: this is the reference's "adapt any InputFormat as a root
  * input" story (tez-mapreduce/src/main/java/org/apache/tez/mapreduce/
  * input/MRInput.java:84 — bring-your-own record reader under the
  * engine's splits) applied to the crawl container; the Spark-native
  * form keeps record splitting and field extraction as expressions so
  * the whole ingest is scan → one generator → narrow projections, and
  * at 100 TB the per-file record split parallelizes by file exactly as
  * WARC is designed to (files are the split unit; records never span
  * files).
  *
  * 100 TB design: zero joins, zero shuffles downstream of the file
  * scan — `explode(warc_records(file))` is the only generator, field
  * parsing is codegen'd string expressions, and quarantine keeps
  * per-record failures from poisoning the file's remaining records
  * (everything before the first framing break parses normally).
  */
object Warc {

  /** The fixture's WARC version marker corruption rule: when
    * `malformEvery` > 0, every doc_id divisible by it gets version
    * `WARC/9.9` — length-preserving, so the framing arithmetic (and
    * every OTHER record in the file) is unaffected; only the
    * quarantine rule fires. The oracle replays the same modulus.
    */
  def versionFor(docId: Column, malformEvery: Int): Column =
    if (malformEvery > 0)
      when(docId % malformEvery === 0, lit("WARC/9.9"))
        .otherwise(lit("WARC/1.0"))
    else lit("WARC/1.0")

  /** Deterministic WARC RECORD synthesis from (doc_id, source, html) —
    * the [[Html.withHtmlColumn]] discipline one container out: a
    * `response` record whose payload is an HTTP 200 response carrying
    * the page, every Content-Length computed from the actual payload,
    * identity carried ONLY inside the record (the target URI), exactly
    * like a real crawl. Appended as column `out`.
    */
  def withWarcRecord(df: DataFrame, docId: Column, source: Column,
      html: Column, out: String, malformEvery: Int = 0): DataFrame = {
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Content-Length: "),
      length(html).cast("string"), lit("\r\n\r\n"), html)
    df.withColumn(out, concat(
      versionFor(docId, malformEvery),
      lit("\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:"),
      docId.cast("string"),
      lit(">\r\nWARC-Target-URI: http://example.com/"),
      source, lit("/"), docId.cast("string"),
      lit("\r\nContent-Type: application/http; msgtype=response\r\n" +
        "Content-Length: "),
      length(http).cast("string"), lit("\r\n\r\n"), http))
  }

  /** Pack records into multi-record FILES — ⌊doc_id/docsPerFile⌋ is the
    * file key, records concatenated in ascending doc_id order with the
    * mandatory two-CRLF separator after EVERY record (the spec's
    * record terminator, so a file ends `\r\n\r\n`). The shuffle is the
    * fixture's, not the operator's — real WARC files arrive as files.
    * Output: (file_id, warc).
    */
  def withWarcFiles(df: DataFrame, docId: Column, rec: Column,
      docsPerFile: Int = 16): DataFrame =
    df.select(floor(docId / docsPerFile).cast("long").as("file_id"),
        struct(docId.as("doc_id"), rec.as("rec")).as("r"))
      .groupBy(col("file_id"))
      .agg(concat(concat_ws("\r\n\r\n",
        transform(array_sort(collect_list(col("r"))), x => x.getField("rec"))),
        lit("\r\n\r\n")).as("warc"))

  /** File → one row per record (split by exact Content-Length
    * framing). Keeps `file_id` plus the raw record as `rec`.
    */
  def records(df: DataFrame, file: Column): DataFrame =
    df.select(col("file_id"),
      explode(graft.functions.warc_records(file)).as("rec"))

  /** Record → typed fields: (warc_version, url, status, content_type,
    * html, malformed). A record quarantines (all-null fields,
    * malformed = true, version kept as evidence) when ANY of the
    * contract checks fail: version ≠ WARC/1.0, framing arithmetic
    * disagrees with the declared Content-Length (a malformed tail), no
    * target URI, unparseable HTTP status line, or HTTP body length
    * disagreeing with the HTTP Content-Length. Every check is an
    * expression over the record string — no UDF, no exceptions.
    */
  def parseFields(df: DataFrame, rec: Column): DataFrame = {
    // the payload = everything after the header terminator; framing is
    // valid iff its length equals the declared Content-Length exactly
    df.withColumn("__rec", rec)
      .withColumn("__header", substring_index(col("__rec"), "\r\n\r\n", 1))
      .withColumn("__version",
        regexp_extract(col("__rec"), "^(WARC/[0-9.]+)\r\n", 1))
      .withColumn("__cl",
        nullif(regexp_extract(col("__header"),
          "\r\nContent-Length: ([0-9]{1,9})(?:\r|$)", 1), lit("")).cast("long"))
      .withColumn("__uri",
        regexp_extract(col("__header"), "\r\nWARC-Target-URI: ([^\r\n]+)", 1))
      .withColumn("__http",
        col("__rec").substr(length(col("__header")) + 5, length(col("__rec"))))
      .withColumn("__status",
        nullif(regexp_extract(col("__http"), "^HTTP/1\\.1 ([0-9]{3}) ", 1),
          lit("")).cast("int"))
      .withColumn("__hh", substring_index(col("__http"), "\r\n\r\n", 1))
      .withColumn("__ctype",
        regexp_extract(col("__hh"), "\r\nContent-Type: ([^\r\n]+)", 1))
      .withColumn("__hcl",
        nullif(regexp_extract(col("__hh"),
          "\r\nContent-Length: ([0-9]{1,9})(?:\r|$)", 1), lit("")).cast("long"))
      .withColumn("__body",
        col("__http").substr(length(col("__hh")) + 5, length(col("__http"))))
      .withColumn("malformed",
        col("__version") =!= "WARC/1.0" ||
          col("__cl").isNull ||
          length(col("__rec")) =!= length(col("__header")) + 4 + col("__cl") ||
          col("__uri") === "" ||
          col("__status").isNull ||
          col("__hcl").isNull ||
          length(col("__body")) =!= col("__hcl"))
      .withColumn("warc_version",
        when(col("__version") === "", lit(null)).otherwise(col("__version")))
      .withColumn("url", when(col("malformed"), lit(null)).otherwise(col("__uri")))
      .withColumn("status", when(col("malformed"), lit(null)).otherwise(col("__status")))
      .withColumn("content_type", when(col("malformed"), lit(null)).otherwise(col("__ctype")))
      .withColumn("html", when(col("malformed"), lit(null)).otherwise(col("__body")))
      .drop("__rec", "__header", "__version", "__cl", "__uri", "__http",
        "__status", "__hh", "__ctype", "__hcl", "__body")
  }
}
