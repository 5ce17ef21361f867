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
  * Canonicalization is a pure codegen'd expression chain (no UDF, no
  * kernel): scheme and host lowercase, default port stripped (:80 for
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

  /** Query parameters dropped by canonicalization: analytics campaign
    * tags (`utm_*`), ad-click ids, and bare referral tags.
    */
  val trackingParamRx: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)="

  /** Embedded multi-part public-suffix excerpt (see scaladoc). */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "co.in",
    "co.za", "com.mx", "com.ar", "com.tr")

  /** Lowercased host of a raw URL (empty string when there is no
    * `scheme://` prefix — pair with [[canonicalize]]'s null contract).
    */
  def hostOf(url: Column): Column = {
    val rest = regexp_extract(substring_index(trim(url), "#", 1),
      "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    lower(substring_index(regexp_extract(rest, "^([^/?]*)", 1), ":", 1))
  }

  /** Canonical form of a raw URL (null when no `scheme://` prefix). */
  def canonicalize(url: Column): Column = {
    val nofrag = substring_index(trim(url), "#", 1)
    val scheme = lower(regexp_extract(nofrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    val hostport = regexp_extract(rest, "^([^/?]*)", 1)
    val host = lower(substring_index(hostport, ":", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val pathq = rest.substr(length(hostport) + 1, length(rest))
    val path0 = substring_index(pathq, "?", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathq, "^[^?]*\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      x => x =!= "" && !x.rlike(trackingParamRx))
    val qpart = when(query === "" || size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(scheme === "", lit(null)).otherwise(
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, qpart))
  }

  /** Registrable domain of a lowercased host: last two labels, or last
    * three when the final pair is a multi-part public suffix.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    when(n >= 3 && array_join(slice(labels, -2, 2), ".")
        .isin(multiPartSuffixes: _*),
      array_join(slice(labels, -3, 3), "."))
      .when(n >= 2, last2)
      .otherwise(host)
  }

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
