package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-SCOPE classification — the ingest-side URL gate a crawler (or
  * a WARC re-processor deciding what to even fetch/parse) runs before
  * any content work. The published practice (Heritrix scope rules,
  * Common Crawl's fetch policies, CCNet's ingestion filters) reduces
  * to a handful of URL-shape heuristics; each is a row-local
  * regexp/array test shared verbatim with the oracle:
  *
  *  - scheme scope: only http/https are fetchable
  *  - binary extension: a path ending in a known non-text extension
  *    never yields trainable text (media/archives/code assets)
  *  - path depth: more than [[MaxDepth]] segments is a generated-tree
  *    signature (calendars, faceted drill-downs)
  *  - repeated-segment trap: the same path segment three or more
  *    times is the classic crawler-trap loop (/a/b/a/b/a/...). RE2
  *    has no backreferences, so the test is an array count over the
  *    split path (row-local, O(depth^2) on a bounded-depth array) —
  *    NOT a \\1 regex, which only one engine could run
  *  - query explosion: more than [[MaxParams]] parameters marks
  *    session/faceted-search URL families that multiply without new
  *    content
  *
  * First failing rule (in the order above) is THE reason — a fixed
  * priority makes the verdict deterministic and hash-checkable.
  * Everything codegen'd builtins; no UDF, no shuffle.
  */
object UrlScope {

  val MaxDepth = 8
  val MaxParams = 5

  /** Non-text extensions (lowercased match on the path tail). */
  val BinaryExts: Seq[String] = Seq(
    "jpg", "jpeg", "png", "gif", "bmp", "ico", "svg", "webp",
    "css", "js", "woff", "woff2", "ttf",
    "pdf", "zip", "gz", "tgz", "tar", "rar", "7z", "exe", "dmg",
    "mp3", "ogg", "wav", "mp4", "avi", "mov", "mkv", "webm")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*"
  private val QueryRe = "\\?([^#]*)"
  private def extRe = "\\.(" + BinaryExts.mkString("|") + ")$"

  /** (in_scope BOOLEAN, reason STRING) as a struct column; reason is
    * 'ok' when in scope. */
  def classify(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val path = regexp_extract(url, PathRe, 1)
    val segs = filter(split(path, "/"), s => s =!= "")
    val nParams = size(filter(
      split(regexp_extract(url, QueryRe, 1), "&"), p => p =!= ""))
    val trapped = exists(segs,
      s => size(filter(segs, t => t === s)) >= 3)
    val reason =
      when(!scheme.isin("http", "https"), "scheme")
        .when(lower(path).rlike(extRe), "ext")
        .when(size(segs) > MaxDepth, "depth")
        .when(trapped, "trap")
        .when(nParams > MaxParams, "params")
        .otherwise("ok")
    struct((reason === "ok").as("in_scope"), reason.as("reason"))
  }

  /** DuckDB twin of [[classify]]'s reason (same rules, same order). */
  def reasonSql(url: String): String = {
    val scheme = s"lower(regexp_extract($url, '$SchemeRe', 1))"
    val path = s"regexp_extract($url, '$PathRe', 1)"
    val segs = s"list_filter(string_split($path, '/'), s -> s <> '')"
    val nParams = s"len(list_filter(string_split(" +
      s"regexp_extract($url, '$QueryRe', 1), '&'), p -> p <> ''))"
    val trapped = s"len(list_filter($segs, " +
      s"s -> len(list_filter($segs, t -> t = s)) >= 3)) > 0"
    s"""CASE WHEN $scheme NOT IN ('http', 'https') THEN 'scheme'
       |  WHEN regexp_matches(lower($path), '$extRe') THEN 'ext'
       |  WHEN len($segs) > $MaxDepth THEN 'depth'
       |  WHEN $trapped THEN 'trap'
       |  WHEN $nParams > $MaxParams THEN 'params'
       |  ELSE 'ok' END""".stripMargin.replace("\n", " ")
  }
}
