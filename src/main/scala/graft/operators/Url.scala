package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the stage every crawl
  * pipeline runs BEFORE content dedup (the cheapest ~40% of raw crawl
  * duplicates are URL-variant re-fetches of the same page: case-shifted
  * hosts, default ports, fragments, tracking parameters). Sits between
  * [[Warc]] ("crawl in" — real target URIs out of the container) and
  * the content stages ([[Html]] extraction, [[Dedup]]).
  *
  * Every operator here is ONE native Catalyst expression over a tight
  * string kernel ([[graft.functions.NativeKernels]] — codegen'd via
  * doGenCode, no UDF, no row conversion). They started as composable
  * regexp-chain Columns; those ~30-80-node trees MULTIPLY under
  * composition (canonicalize(resolve(..)) at Column construction, then
  * again under CollapseProject / filter-pushdown alias substitution)
  * into five-figure-node projections — tens of optimizer seconds and
  * whole-stage-codegen fallback, measured on the q261 edge build
  * (8+ min → sub-second as kernels). The 1-node form is immune by
  * construction: there is no tree to substitute. Canonicalization:
  * scheme and host lowercase, default port stripped (:80 for
  * http, :443 for https — any other port kept), fragment stripped,
  * empty path → `/`, tracking query parameters removed
  * ([[trackingParamRx]]: `utm_*`, click ids, `ref`), remaining
  * parameters KEPT IN ORDER (reordering `?b=2&a=1` would merge URLs a
  * server may distinguish), a left-empty query dropped entirely. A
  * string with no `scheme://` prefix canonicalizes to NULL — quarantine
  * is data ([[Multimodal]] convention), not a thrown task; callers
  * filter or count the nulls. Not handled (documented): userinfo
  * (`user@host`), percent-encoding normalization, IDN/punycode — none
  * synthesizable by the fixture's oracle and all rare in crawl frontier
  * practice relative to the rules above.
  *
  * Registered-domain extraction ([[registeredDomain]]) uses an embedded
  * excerpt of the multi-part public suffixes ([[multiPartSuffixes]] —
  * `co.uk` and friends): last two host labels when the final pair is
  * not a multi-part suffix, last three when it is. At production scale
  * the full Public Suffix List is ~9k rules — load it as a broadcast
  * table and join, exactly like the stored-model families; the
  * expression form here keeps the rule codegen'd and oracle-replayable.
  *
  * Reference: the reference has no URL notion (untyped KV edges); this
  * extends the LLM-pipeline surface (SURVEY.md §2.25) on the crawl
  * front door, composed with [[Warc]]'s parsed target URIs.
  *
  * 100 TB design: canonicalization is a narrow projection (zero
  * shuffle); [[urlGroups]] is ONE hash-partitioned aggregate on the
  * canonical string — partial aggregation map-side, shuffle volume =
  * |distinct canonical URLs| not |rows|, the same canonical plan as
  * [[Dedup.exactGroups]].
  */
object Url {

  /** Fixed-name query parameters dropped by canonicalization (ad-click
    * ids and bare referral tags); `utm_*` campaign tags are the rule's
    * wildcard half. ONE source for the kernel
    * ([[graft.functions.NativeKernels.isTrackingParam]]) and the
    * documentation regex [[trackingParamRx]].
    */
  val trackingFixedNames: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src")

  /** The tracking-parameter rule as a regex (prefix-anchored, name then
    * `=`) — generated from [[trackingFixedNames]].
    */
  val trackingParamRx: String =
    "^(utm_[A-Za-z0-9_]*|" + trackingFixedNames.mkString("|") + ")="

  /** Embedded multi-part public-suffix excerpt (see scaladoc). */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "co.in",
    "co.za", "com.mx", "com.ar", "com.tr")

  /** Lowercased host of a raw URL (empty string when there is no
    * `scheme://` prefix — pair with [[canonicalize]]'s null contract).
    */
  def hostOf(url: Column): Column = graft.functions.url_host(url)

  /** Canonical form of a raw URL (null when no `scheme://` prefix). */
  def canonicalize(url: Column): Column =
    graft.functions.url_canonicalize(url)

  /** Registrable domain of a lowercased host: last two labels, or last
    * three when the final pair is a multi-part public suffix.
    */
  def registeredDomain(host: Column): Column =
    graft.functions.url_registered_domain(host)

  /** Resolve an href AGAINST ITS PAGE's base URL — the crawl-frontier
    * step between [[Html.extractLinks]] (raw href attributes out of the
    * markup) and [[canonicalize]] (most real outlinks are relative; an
    * unresolved `next/2` has no canonical identity). RFC 3986 reference
    * resolution in its frontier subset, each rule a fixture witness:
    *
    *  - absolute `http(s)://…` href → itself (base not consulted — an
    *    absolute link survives even an unparseable base; a NULL base or
    *    href is NULL out, standard null-safe expression semantics);
    *  - any OTHER scheme (`mailto:`, `javascript:`, `ftp:`…) → NULL —
    *    not a crawlable outlink (quarantine is data);
    *  - relative forms against a base with no `scheme://` → NULL;
    *  - `//host/…` (scheme-relative) → base scheme + `:` + href;
    *  - `/path` (root-relative) → base origin + href;
    *  - `?query` → origin + base path + href (base query replaced);
    *  - `#frag` → origin + base path + base query + href (same-document
    *    reference — [[canonicalize]] downstream strips the fragment);
    *  - empty href → the base itself (path + query, fragment dropped);
    *  - anything else (path-relative) → origin + base DIRECTORY (path
    *    up to and including its last `/`, `/` when the path is bare)
    *    + href.
    *
    * The origin keeps the base port verbatim and only case-folds —
    * resolution never canonicalizes; that division of labor keeps each
    * stage's oracle independently checkable. Dot-segment normalization
    * (`../`) is not handled (documented, same tier as [[canonicalize]]'s
    * userinfo/percent-encoding exclusions).
    */
  def resolve(base: Column, href: Column): Column =
    graft.functions.url_resolve(base, href)

  /** URL-exact dedup groups over the CANONICAL form: one row per
    * distinct canonical URL with group size and the survivor id (min)
    * — [[Dedup.exactGroups]]'s contract with canonicalization fused in.
    * Rows whose URL fails to canonicalize (null) are excluded — they
    * have no canonical identity to group under; count them upstream if
    * the malformed rate matters.
    */
  def urlGroups(df: DataFrame, url: Column, id: Column): DataFrame =
    df.select(canonicalize(url).as("url_canon"), id.as("__id"))
      .filter(col("url_canon").isNotNull)
      .groupBy(col("url_canon"))
      .agg(count(lit(1)).as("n_dups"), min(col("__id")).as("keep_id"))
}
