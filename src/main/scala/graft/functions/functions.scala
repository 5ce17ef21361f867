package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}

import graft.functions.{CosineFExpr, LshBucketExpr, MinHashSigExpr, MinHashWordsExpr, RepetitionSignalsExpr, ShinglesExpr, SimHashFpExpr, SimHashWordsExpr, SortedIntersectCountExpr, TopKByScore, WinnowExpr}
import graft.operators.Dedup

/** Column-level entry points for the native kernels (Scala API), plus the
  * SparkSessionExtensions installer that exposes them to SQL.
  */
package object functions {

  def minhash_sig(xs: Column, num: Int): Column =
    ExpressionUtils.column(MinHashSigExpr(ExpressionUtils.expression(xs), num))

  def simhash_fp(hs: Column, bits: Int = Dedup.SimHashBits): Column =
    ExpressionUtils.column(SimHashFpExpr(ExpressionUtils.expression(hs), bits))

  def cosine_f(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineFExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def lsh_bucket(emb: Column, planes: Int): Column =
    ExpressionUtils.column(LshBucketExpr(ExpressionUtils.expression(emb), planes))

  def shingles_of(words: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(words), n))

  def minhash_words(words: Column, n: Int, num: Int): Column =
    ExpressionUtils.column(MinHashWordsExpr(ExpressionUtils.expression(words), n, num))

  def simhash_words(tokens: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashWordsExpr(ExpressionUtils.expression(tokens), bits))

  def winnow(words: Column, n: Int, w: Int): Column =
    ExpressionUtils.column(WinnowExpr(ExpressionUtils.expression(words), n, w))

  def repetition_signals(words: Column, n: Int): Column =
    ExpressionUtils.column(RepetitionSignalsExpr(ExpressionUtils.expression(words), n))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCountExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** HTML numeric character reference decode (`&#123;` / `&#x1F;`) — one
    * codegen'd scan ([[graft.functions.DecodeNumericRefsExpr]]).
    */
  def decode_numeric_refs(s: Column): Column =
    ExpressionUtils.column(graft.functions.DecodeNumericRefsExpr(
      ExpressionUtils.expression(s)))

  /** WARC file → array of records, exact Content-Length framing
    * ([[graft.functions.WarcRecordsExpr]]).
    */
  def warc_records(file: Column): Column =
    ExpressionUtils.column(graft.functions.WarcRecordsExpr(
      ExpressionUtils.expression(file)))

  /** Stack-based HTML block segmentation → array of (rank, block_type,
    * block_idx, raw) structs in (rank, idx) order
    * ([[graft.functions.HtmlBlocksExpr]]).
    */
  def html_blocks(html: Column): Column =
    ExpressionUtils.column(graft.functions.HtmlBlocksExpr(
      ExpressionUtils.expression(html)))

  /** Crawl-frontier canonical URL form; null when no `scheme://`
    * ([[graft.functions.UrlCanonExpr]]).
    */
  def url_canonicalize(url: Column): Column =
    ExpressionUtils.column(graft.functions.UrlCanonExpr(
      ExpressionUtils.expression(url)))

  /** Lowercased host of a URL; "" when no `scheme://`
    * ([[graft.functions.UrlHostExpr]]).
    */
  def url_host(url: Column): Column =
    ExpressionUtils.column(graft.functions.UrlHostExpr(
      ExpressionUtils.expression(url)))

  /** Registrable domain of a lowercased host
    * ([[graft.functions.UrlRegDomainExpr]]).
    */
  def url_registered_domain(host: Column): Column =
    ExpressionUtils.column(graft.functions.UrlRegDomainExpr(
      ExpressionUtils.expression(host)))

  /** href resolved against its page's base URL; null = not a crawlable
    * outlink ([[graft.functions.UrlResolveExpr]]).
    */
  def url_resolve(base: Column, href: Column): Column =
    ExpressionUtils.column(graft.functions.UrlResolveExpr(
      ExpressionUtils.expression(base), ExpressionUtils.expression(href)))

  /** Byte-true WARC file → array<binary> of records, exact
    * Content-Length OCTET framing ([[graft.functions.WarcRecordsBytesExpr]]).
    */
  def warc_records_bin(file: Column): Column =
    ExpressionUtils.column(graft.functions.WarcRecordsBytesExpr(
      ExpressionUtils.expression(file)))

  /** Concatenated-gzip-member decompression (`.warc.gz` layout), bytes
    * up to the first failure ([[graft.functions.GunzipMembersExpr]]).
    */
  def warc_gunzip(file: Column): Column =
    ExpressionUtils.column(graft.functions.GunzipMembersExpr(
      ExpressionUtils.expression(file)))

  /** One deterministic gzip member — fixture synthesis side
    * ([[graft.functions.GzipMemberExpr]]).
    */
  def gzip_member(b: Column): Column =
    ExpressionUtils.column(graft.functions.GzipMemberExpr(
      ExpressionUtils.expression(b)))

  /** concat(array<binary>) → binary ([[graft.functions.ConcatBinaryExpr]]). */
  def concat_binary(arr: Column): Column =
    ExpressionUtils.column(graft.functions.ConcatBinaryExpr(
      ExpressionUtils.expression(arr)))

  /** Per-row-charset decode (binary, name) → string; unknown names →
    * UTF-8, malformed bytes → U+FFFD ([[graft.functions.DecodeCharsetExpr]]).
    */
  def decode_charset(b: Column, cs: Column): Column =
    ExpressionUtils.column(graft.functions.DecodeCharsetExpr(
      ExpressionUtils.expression(b), ExpressionUtils.expression(cs)))

  /** Per-row-charset encode (string, name) → binary — synthesis twin of
    * [[decode_charset]] ([[graft.functions.EncodeCharsetExpr]]).
    */
  def encode_charset(s: Column, cs: Column): Column =
    ExpressionUtils.column(graft.functions.EncodeCharsetExpr(
      ExpressionUtils.expression(s), ExpressionUtils.expression(cs)))

  /** All stride-1 n-word window md5s (duplicates kept, window order) —
    * the passage-hash kernel for [[graft.operators.Dedup.duplicatePassages]].
    */
  def md5_windows(words: Column, n: Int): Column =
    ExpressionUtils.column(graft.functions.Md5WindowsExpr(
      ExpressionUtils.expression(words), n))

  /** Morton (Z-order) interleave of the low 16 bits of two long columns —
    * the layout key for multi-dimensional data skipping
    * ([[graft.operators.Compaction.zOrderParquet]]).
    */
  def z_value16(a: Column, b: Column): Column =
    ExpressionUtils.column(graft.functions.ZValue16Expr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** BPE tokenization with the merge table as expression DATA — one tree
    * node looping the merges at runtime ([[graft.functions.BpeEncodeExpr]]);
    * plan depth constant in |merges|.
    */
  def bpe_encode(word: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    ExpressionUtils.column(graft.functions.BpeEncodeExpr(
      ExpressionUtils.expression(word), merges, byteLevel))

  /** Unigram-LM Viterbi tokenization with the piece table as expression
    * DATA ([[graft.functions.UnigramEncodeExpr]]); all DP comparisons on
    * exact integers, plan depth constant in |vocab|.
    */
  def unigram_encode(word: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int, unkScore: Long): Column =
    ExpressionUtils.column(graft.functions.UnigramEncodeExpr(
      ExpressionUtils.expression(word), vocab, maxPieceLen, unkScore))

  /** WordPiece greedy longest-match-first tokenization with the
    * vocabulary as expression DATA ([[graft.functions.WordPieceEncodeExpr]]);
    * plan depth constant in |vocab|.
    */
  def wordpiece_encode(word: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    ExpressionUtils.column(graft.functions.WordPieceEncodeExpr(
      ExpressionUtils.expression(word), vocab, unk))

  /** PQ-encode an embedding against per-subspace L2 codebooks carried as
    * expression data ([[graft.functions.PqEncodeExpr]]).
    */
  def pq_encode(emb: Column, cb: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(graft.functions.PqEncodeExpr(
      ExpressionUtils.expression(emb), cb))

  /** ADC lookup-table fold Σ_m lut[m·nCodes + codes[m]]
    * ([[graft.functions.PqAdcExpr]]).
    */
  def pq_adc(codes: Column, lut: Column, nCodes: Int): Column =
    ExpressionUtils.column(graft.functions.PqAdcExpr(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), nCodes))

  /** Bounded per-group top-k aggregate (score desc, id asc) — O(k) state,
    * partial+final; see [[graft.functions.TopKByScore]].
    */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(
      ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
      .toAggregateExpression())

  /** Misra-Gries frequent-items summary — one pass, O(k) state per group
    * at every aggregation stage; see [[graft.functions.ApproxTopItems]].
    */
  def approx_top_items(item: Column, k: Int): Column =
    ExpressionUtils.column(ApproxTopItems(
      ExpressionUtils.expression(item), k).toAggregateExpression())

  /** Register the SQL functions into an already-running session
    * (getOrCreate ignores withExtensions when a session exists).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.ColumnBridge.registerFunctions(spark, Register.entries)
}

package functions {

  /** SQL registration: `spark.sql.extensions=graft.GraftFunctionExtensions`
    * (or `Builder.withExtensions`) makes `minhash_sig(xs, 64)`,
    * `simhash_fp(hs)`, `cosine_f(a, b)` callable from SQL — the engine's
    * extension mechanism of record (SparkSessionExtensions.injectFunction).
    */
  private[graft] object Register {
    private def lit(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }

    val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
        (args: Seq[Expression]) => MinHashSigExpr(args.head, if (args.size > 1) lit(args(1)) else 64)),
      (FunctionIdentifier("simhash_fp"),
        new ExpressionInfo(classOf[SimHashFpExpr].getName, "simhash_fp"),
        (args: Seq[Expression]) => SimHashFpExpr(args.head, if (args.size > 1) lit(args(1)) else Dedup.SimHashBits)),
      (FunctionIdentifier("cosine_f"),
        new ExpressionInfo(classOf[CosineFExpr].getName, "cosine_f"),
        (args: Seq[Expression]) => CosineFExpr(args.head, args(1))),
      (FunctionIdentifier("lsh_bucket"),
        new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
        (args: Seq[Expression]) => LshBucketExpr(args.head, lit(args(1)))),
      (FunctionIdentifier("shingles_of"),
        new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles_of"),
        (args: Seq[Expression]) => ShinglesExpr(args.head, if (args.size > 1) lit(args(1)) else 3)),
      (FunctionIdentifier("minhash_words"),
        new ExpressionInfo(classOf[MinHashWordsExpr].getName, "minhash_words"),
        (args: Seq[Expression]) => MinHashWordsExpr(args.head,
          if (args.size > 1) lit(args(1)) else 3, if (args.size > 2) lit(args(2)) else 64)),
      (FunctionIdentifier("simhash_words"),
        new ExpressionInfo(classOf[SimHashWordsExpr].getName, "simhash_words"),
        (args: Seq[Expression]) => SimHashWordsExpr(args.head,
          if (args.size > 1) lit(args(1)) else Dedup.SimHashBits)),
      (FunctionIdentifier("repetition_signals"),
        new ExpressionInfo(classOf[RepetitionSignalsExpr].getName, "repetition_signals"),
        (args: Seq[Expression]) => RepetitionSignalsExpr(args.head,
          if (args.size > 1) lit(args(1)) else 2)),
      (FunctionIdentifier("z_value16"),
        new ExpressionInfo(classOf[ZValue16Expr].getName, "z_value16"),
        (args: Seq[Expression]) => ZValue16Expr(args.head, args(1))),
      (FunctionIdentifier("md5_windows"),
        new ExpressionInfo(classOf[Md5WindowsExpr].getName, "md5_windows"),
        (args: Seq[Expression]) => Md5WindowsExpr(args.head, lit(args(1)))))
  }
}

/** Zero-arg extensions class usable via spark.sql.extensions. */
class GraftFunctionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.Register.entries.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
  }
}
