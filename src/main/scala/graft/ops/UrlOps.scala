package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and link extraction — the web-curation steps
  * between a crawl archive and a link graph: fold scheme/host case,
  * drop fragments and default ports, strip tracking parameters,
  * collapse duplicate path slashes. Reference scope: the reference
  * scrapes fixed listing URLs (`jobs/propnex_selenium.py:139-166`) and
  * never normalizes them; this is part of the LLM-pipeline brief (a
  * crawl-frontier dedup or host-level analysis is wrong without it).
  *
  * Every step is a per-row regexp at scan speed — shuffle-free,
  * whole-stage-codegen'd. The REGEX PATTERNS are shared constants
  * between the Column chain and the DuckDB CTE twin (only the
  * replacement syntax differs: `$1` vs `\1`), so the two engines
  * cannot drift pattern-wise; both engines' replace scans are
  * leftmost non-overlapping. Patterns avoid lookarounds — RE2 (the
  * oracle's engine) has none, so port stripping captures the optional
  * tail instead of asserting it. */
object UrlOps {

  // Shared pattern constants (Java regex ∩ RE2 — no lookarounds, no
  // engine-specific classes). Single-quote-free so they embed directly
  // in SQL literals.
  //
  // Edge trimming uses the pinned 5-char whitespace class (TextOps
  // convention) instead of trim(): trim strips spaces only, and a
  // trailing newline would make every later $-anchored step DIVERGE —
  // Java's default $ also matches before a final line terminator,
  // RE2's never does. With terminator-free ends (this strip matches
  // to absolute end in both engines — the class contains the
  // terminators), the remaining $ anchors behave identically; internal
  // newlines match in neither engine ('.' crosses them in neither).
  private val EdgeWsRe = "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$"
  private val FragRe = "#[\\s\\S]*$"
  private val SchemeHostRe = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
  private val Http80Re = "^(http://[^/?#:]*):80([/?#].*)?$"
  private val Https443Re = "^(https://[^/?#:]*):443([/?#].*)?$"
  private val UtmAmpRe = "&utm_[^&#]*"
  private val UtmQAmpRe = "[?]utm_[^&#]*&"
  private val UtmQEndRe = "[?]utm_[^&#]*$"
  private val DupSlashRe = "([^:])/{2,}"
  private val TrailRe = "[/?&]+$"
  private val HostRe = "^[a-z][a-z0-9+.-]*://([^/?#:]*)"
  private val HrefRe = "href=\"([^\"]*)\""

  /** Canonical form of a URL: trim → drop fragment → lowercase
    * scheme+authority (path/query case is significant, left alone) →
    * strip default ports (:80 http, :443 https) → strip `utm_*`
    * tracking parameters → collapse duplicate slashes outside the
    * scheme → strip trailing `/?&` runs. Non-URL strings (no
    * `scheme://`) pass through the fragment/utm/slash steps unchanged
    * in shape — the op is total. */
  def canonicalizeUrl(c: Column): Column = {
    val nf = regexp_replace(regexp_replace(c, EdgeWsRe, ""), FragRe, "")
    val sh = regexp_extract(nf, SchemeHostRe, 1)
    val lowered = when(sh === "", nf)
      .otherwise(concat(lower(sh), nf.substr(length(sh) + 1, length(nf))))
    val ports = regexp_replace(
      regexp_replace(lowered, Http80Re, "$1$2"), Https443Re, "$1$2")
    val utm = regexp_replace(regexp_replace(
      regexp_replace(ports, UtmAmpRe, ""), UtmQAmpRe, "?"), UtmQEndRe, "")
    // edge-strip again: fragment/utm stripping on non-URL text can
    // expose trailing whitespace the leading strip ran too early to see
    regexp_replace(
      regexp_replace(regexp_replace(utm, DupSlashRe, "$1/"), TrailRe, ""),
      EdgeWsRe, "")
  }

  /** The lowercase host of a canonicalized URL ('' when schemeless). */
  def hostOf(canon: Column): Column = regexp_extract(canon, HostRe, 1)

  /** All `href="..."` values of an HTML fragment, in document order. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit(HrefRe), lit(1))

  /** DuckDB twin of [[canonicalizeUrl]] as a staged CTE chain over
    * `rel`: passes `keys` through and canonicalizes `urlExpr` into
    * column `u` of the final CTE `<p>canon`. Same pattern constants as
    * the Spark chain; 'g' on the two steps Spark (always-global)
    * applies repeatedly. */
  def canonicalizeUrlCtes(rel: String, keys: String, urlExpr: String,
                          p: String): String =
    s"""${p}u0 AS (SELECT $keys, regexp_replace(
       |    regexp_replace($urlExpr, '$EdgeWsRe', '', 'g'),
       |    '$FragRe', '') AS u FROM $rel),
       |${p}u1 AS (SELECT $keys, CASE WHEN sh = '' THEN u
       |    ELSE lower(sh) || substr(u, length(sh) + 1) END AS u
       |  FROM (SELECT $keys, u,
       |    regexp_extract(u, '$SchemeHostRe', 1) AS sh FROM ${p}u0)),
       |${p}u2 AS (SELECT $keys, regexp_replace(regexp_replace(u,
       |    '$Http80Re', '\\1\\2'), '$Https443Re', '\\1\\2') AS u
       |  FROM ${p}u1),
       |${p}u3 AS (SELECT $keys, regexp_replace(regexp_replace(
       |    regexp_replace(u, '$UtmAmpRe', '', 'g'),
       |    '$UtmQAmpRe', '?', 'g'), '$UtmQEndRe', '') AS u FROM ${p}u2),
       |${p}canon AS (SELECT $keys, regexp_replace(
       |    regexp_replace(regexp_replace(u,
       |      '$DupSlashRe', '\\1/', 'g'), '$TrailRe', ''),
       |    '$EdgeWsRe', '', 'g') AS u
       |  FROM ${p}u3)""".stripMargin

  /** DuckDB twin of [[hostOf]]. */
  def hostOfSql(e: String): String = s"regexp_extract($e, '$HostRe', 1)"

  /** DuckDB twin of [[hrefs]] (list of capture group 1). */
  def hrefsSql(e: String): String =
    s"""regexp_extract_all($e, 'href="([^"]*)"', 1)"""
}
