package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus ingestion — the FIRST dedup a
  * crawl pipeline runs (URL-level, before any content hashing; Common
  * Crawl's index and every public crawl recipe key on a normalized
  * URL). Rules are RFC 3986 §6 syntax-based normalization plus the
  * tracking-parameter strip every production normalizer adds:
  *
  *  - scheme and host lowercase
  *  - default port removed (http:80, https:443)
  *  - fragment dropped
  *  - tracking params dropped (utm_*, fbclid, gclid), remaining query
  *    params SORTED (param order is semantically irrelevant), `?`
  *    dropped when nothing survives
  *  - trailing path slashes stripped; empty path becomes "/"
  *
  * Everything is row-local regexp + array built-ins — codegen'd, no
  * UDF, no shuffle; both engines share the regexes and binary string
  * collation, so the mapping hash-checks. Percent-encoding
  * normalization and internal duplicate-slash collapse are documented
  * non-goals (rarely applied by crawl normalizers because they can
  * change semantics on exotic servers).
  */
object UrlNormalize {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*"
  private val QueryRe = "\\?([^#]*)"
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** Canonical form of `url` (absolute http(s)/other-scheme URLs; a
    * string that does not parse as scheme://... returns unchanged). */
  def norm(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostport = regexp_extract(url, HostPortRe, 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path = regexp_extract(url, PathRe, 1)
    val query = regexp_extract(url, QueryRe, 1)

    val normPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val stripped = regexp_replace(path, "/+$", "")
    val normPath = when(stripped === "", "/").otherwise(stripped)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe)))
    val normQuery = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(params, "&")))

    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, normPort, normPath,
        normQuery))
  }

  /** DuckDB twin of [[norm]] over SQL expression `c`. */
  def normSql(c: String): String = {
    val scheme = s"lower(regexp_extract($c, '$SchemeRe', 1))"
    val hostport = s"regexp_extract($c, '$HostPortRe', 1)"
    val host = s"lower(regexp_extract($hostport, '^([^:]*)', 1))"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val path = s"regexp_extract($c, '$PathRe', 1)"
    val query = s"regexp_extract($c, '\\?([^#]*)', 1)"
    val normPort = s"""CASE WHEN $port = ''
      OR ($scheme = 'http' AND $port = '80')
      OR ($scheme = 'https' AND $port = '443')
      THEN '' ELSE ':' || $port END"""
    val stripped = s"regexp_replace($path, '/+$$', '')"
    val normPath = s"CASE WHEN $stripped = '' THEN '/' ELSE $stripped END"
    val params = s"""list_sort(list_filter(string_split($query, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '$TrackingRe')))"""
    val normQuery = s"""CASE WHEN len($params) = 0 THEN ''
      ELSE '?' || array_to_string($params, '&') END"""
    s"""CASE WHEN $scheme = '' THEN $c
       ELSE $scheme || '://' || $host || $normPort || $normPath ||
         $normQuery END"""
  }
}
