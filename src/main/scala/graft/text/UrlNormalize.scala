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
  *  - percent-encoding normalized in path and query (§6.2.2): hex
  *    triplets uppercased, unreserved characters (ALPHA / DIGIT /
  *    "-" / "." / "_" / "~") decoded; reserved characters stay
  *    encoded (decoding them would change the URL's structure), and
  *    a '%' not followed by two hex digits passes through untouched
  *  - tracking params dropped (utm_*, fbclid, gclid), remaining query
  *    params SORTED (param order is semantically irrelevant), `?`
  *    dropped when nothing survives
  *  - trailing path slashes stripped; empty path becomes "/"
  *
  * URLs whose authority carries an IPv6 literal or userinfo ('[' or
  * '@' in the hostport) pass through UNCHANGED — the same conservative
  * passthrough as non-URL strings. The simple host/port split below
  * would otherwise truncate `[2001:db8::1]` at the first ':' and
  * collapse DISTINCT hosts onto one canonical key (silent data loss in
  * URL-level dedup, invisible to the oracle because both engines would
  * agree).
  *
  * Everything is row-local regexp + array built-ins — codegen'd, no
  * UDF, no shuffle; both engines share the regexes and binary string
  * collation, so the mapping hash-checks. Internal duplicate-slash
  * collapse is a documented non-goal (rarely applied by crawl
  * normalizers because it can change semantics on exotic servers).
  */
object UrlNormalize {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*"
  private val QueryRe = "\\?([^#]*)"
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** §6.2.2 tokenizer: a valid percent triplet, a run of non-'%'
    * characters, or a lone '%' (malformed triplet — left untouched).
    * Ordered alternation; leftmost-first in Java regex and RE2 alike. */
  private val PctTokRe = "%[0-9A-Fa-f]{2}|[^%]+|%"
  private val PctTripletRe = "^%[0-9A-Fa-f]{2}$"

  /** Percent-encoding normalization of one URL component: uppercase
    * valid triplets, decode the unreserved set (RFC 3986 §2.3:
    * ALPHA / DIGIT / - . _ ~). Reserved characters ('/', '&', '=', …)
    * are never in that set, so decoding cannot change component
    * structure — safe BEFORE the query split and slash strip. */
  private def pctNorm(c: Column): Column =
    array_join(
      transform(regexp_extract_all(c, lit(PctTokRe), lit(0)), t => {
        val code = conv(substring(t, 2, 2), 16, 10).cast("int")
        val unreserved =
          (code >= 48 && code <= 57) || (code >= 65 && code <= 90) ||
            (code >= 97 && code <= 122) || code === 45 || code === 46 ||
            code === 95 || code === 126
        when(t.rlike(PctTripletRe),
          when(unreserved, call_function("chr", code)).otherwise(upper(t)))
          .otherwise(t)
      }), "")

  /** Canonical form of `url` (absolute http(s)/other-scheme URLs; a
    * string that does not parse as scheme://..., or whose authority
    * carries '[' or '@', returns unchanged). */
  def norm(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostport = regexp_extract(url, HostPortRe, 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path = pctNorm(regexp_extract(url, PathRe, 1))
    val query = pctNorm(regexp_extract(url, QueryRe, 1))

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

    when(scheme === "" ||
        instr(hostport, "[") > 0 || instr(hostport, "@") > 0, url)
      .otherwise(concat(scheme, lit("://"), host, normPort, normPath,
        normQuery))
  }

  /** DuckDB twin of [[pctNorm]] over SQL expression `x`. The triplet
    * value comes from hex-digit positions (strpos arithmetic) instead
    * of Spark's conv — same integers, engine-local spelling. The
    * coalesce matters: DuckDB's tokenize-and-rejoin yields NULL (not
    * '') on an EMPTY component — every query-less URL — where Spark's
    * array_join yields ''. */
  private def pctNormSql(x: String): String = {
    val code = "((strpos('0123456789abcdef', substr(lower(t), 2, 1)) - 1)" +
      " * 16 + strpos('0123456789abcdef', substr(lower(t), 3, 1)) - 1)"
    s"""coalesce(array_to_string(list_transform(
       regexp_extract_all($x, '$PctTokRe'),
       t -> CASE WHEN regexp_matches(t, '$PctTripletRe')
         THEN CASE WHEN ($code BETWEEN 48 AND 57)
             OR ($code BETWEEN 65 AND 90)
             OR ($code BETWEEN 97 AND 122)
             OR $code IN (45, 46, 95, 126)
           THEN chr(CAST($code AS INTEGER)) ELSE upper(t) END
         ELSE t END), ''), '')"""
  }

  /** DuckDB twin of [[norm]] over SQL expression `c`. */
  def normSql(c: String): String = {
    val scheme = s"lower(regexp_extract($c, '$SchemeRe', 1))"
    val hostport = s"regexp_extract($c, '$HostPortRe', 1)"
    val host = s"lower(regexp_extract($hostport, '^([^:]*)', 1))"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val path = pctNormSql(s"regexp_extract($c, '$PathRe', 1)")
    val query = pctNormSql(s"regexp_extract($c, '\\?([^#]*)', 1)")
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
    s"""CASE WHEN $scheme = '' OR strpos($hostport, '[') > 0
         OR strpos($hostport, '@') > 0 THEN $c
       ELSE $scheme || '://' || $host || $normPort || $normPath ||
         $normQuery END"""
  }
}
