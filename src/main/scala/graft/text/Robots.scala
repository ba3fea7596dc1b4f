package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and the fetch gate (RFC 9309, the Robots
  * Exclusion Protocol) — the LAST gate a polite crawler runs before a
  * URL leaves the frontier. Everything is declarative: line
  * attribution is a window `last(..., ignoreNulls)` over line order,
  * agent-group selection a per-host flag, and the verdict the RFC's
  * longest-match rule as a lexicographic struct-max — so the whole
  * gate shares its logic with the DuckDB twin and hash-checks.
  *
  * Semantics (RFC 9309 §2.2):
  *  - a group is a `User-agent:` line followed by `Allow:` /
  *    `Disallow:` rules; rules attach to the MOST RECENT user-agent
  *    line (the RFC's stacked-UA grouping is simplified to
  *    one-UA-per-group — a documented, deterministic restriction);
  *  - the crawler obeys its own agent's group when one exists for the
  *    host, else the `*` group, else everything is allowed;
  *  - per URL the MOST SPECIFIC (longest-prefix) matching rule wins;
  *    on a length tie Allow beats Disallow (§2.2.2);
  *  - empty-pattern rules match nothing and are dropped; `#` starts a
  *    comment; matching is plain prefix (the `*`/`$` wildcard
  *    extension is a documented non-goal).
  *
  * Scale shape: robots bodies are host-sized (one small text per
  * host); the parsed rule relation is model-sized and BROADCASTS to
  * the frontier — the gate itself is a broadcast join plus a
  * per-(url) struct-max, no frontier shuffle.
  */
object Robots {

  /** The agent token this crawler matches in User-agent lines. */
  val Agent = "graftbot"

  private val LineRe =
    "(?i)^\\s*(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(\\S*).*$"

  /** Parse a (host, robots) relation into the effective rule set for
    * [[Agent]]: (host, ua, rule, prefix, rule_len, line_no). Only the
    * governing group's rules survive (agent group if the host has
    * one, else `*`). */
  def rules(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("robots"), "\n")).as(Seq("line_no", "raw")))
      .select(col("host"), col("line_no"),
        regexp_replace(col("raw"), "#.*$", "").as("line"))
      .select(col("host"), col("line_no"),
        lower(regexp_extract(col("line"), LineRe, 1)).as("kind"),
        regexp_extract(col("line"), LineRe, 2).as("value"))
    val wAttr = Window.partitionBy(col("host")).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = lines
      .withColumn("ua", last(
        when(col("kind") === "user-agent", lower(col("value"))),
        ignoreNulls = true).over(wAttr))
      .filter(col("kind").isin("allow", "disallow") &&
        col("value") =!= "" && col("ua").isNotNull)
    val wHost = Window.partitionBy(col("host"))
    attributed
      .withColumn("has_agent",
        max(when(col("ua") === Agent, 1).otherwise(0)).over(wHost))
      .filter((col("has_agent") === 1 && col("ua") === Agent) ||
        (col("has_agent") === 0 && col("ua") === "*"))
      .select(col("host"), col("ua"), col("kind").as("rule"),
        col("value").as("prefix"),
        length(col("value")).cast("long").as("rule_len"),
        col("line_no").cast("long").as("line_no"))
  }

  /** DuckDB twin of [[rules]] over relation `robotsRel(host, robots)`
    * — same window attribution, same group selection. */
  def rulesSql(robotsRel: String): String =
    s"""WITH __lines AS (
       |  SELECT host, l.i - 1 AS line_no,
       |    regexp_replace(l.raw, '#.*$$', '') AS line
       |  FROM $robotsRel,
       |    LATERAL (SELECT unnest(string_split(robots, chr(10))) AS raw,
       |      generate_subscripts(string_split(robots, chr(10)), 1) AS i)
       |      AS l),
       |__parsed AS (
       |  SELECT host, line_no,
       |    lower(regexp_extract(line, '$LineRe', 1)) AS kind,
       |    regexp_extract(line, '$LineRe', 2) AS value
       |  FROM __lines),
       |__attr AS (
       |  SELECT host, line_no, kind, value,
       |    last_value(CASE WHEN kind = 'user-agent'
       |      THEN lower(value) END IGNORE NULLS)
       |      OVER (PARTITION BY host ORDER BY line_no
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua
       |  FROM __parsed),
       |__ruled AS (
       |  SELECT * FROM __attr
       |  WHERE kind IN ('allow', 'disallow') AND value != ''
       |    AND ua IS NOT NULL),
       |__flagged AS (
       |  SELECT *, max(CASE WHEN ua = '$Agent' THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY host) AS has_agent
       |  FROM __ruled)
       |SELECT host, ua, kind AS rule, value AS prefix,
       |  length(value) AS rule_len, line_no
       |FROM __flagged
       |WHERE (has_agent = 1 AND ua = '$Agent')
       |   OR (has_agent = 0 AND ua = '*')""".stripMargin

  /** Crawl-delay extraction — the de-facto politeness extension most
    * robots.txt files carry (not standardized by RFC 9309 but honored
    * by Yandex/Bing-class crawlers; Google ignores it): per host the
    * GOVERNING group's LAST numeric `Crawl-delay:` line, in seconds.
    * Same line attribution and agent-override selection as [[rules]];
    * non-numeric values drop (the conservative read). */
  def delays(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("robots"), "\n")).as(Seq("line_no", "raw")))
      .select(col("host"), col("line_no"),
        regexp_replace(col("raw"), "#.*$", "").as("line"))
      .select(col("host"), col("line_no"),
        lower(regexp_extract(col("line"), LineRe, 1)).as("kind"),
        regexp_extract(col("line"), LineRe, 2).as("value"))
    val wAttr = Window.partitionBy(col("host")).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = lines
      .withColumn("ua", last(
        when(col("kind") === "user-agent", lower(col("value"))),
        ignoreNulls = true).over(wAttr))
      .filter(col("kind") === "crawl-delay" &&
        col("value").rlike("^\\d+$") && col("ua").isNotNull)
    val wHost = Window.partitionBy(col("host"))
    attributed
      .withColumn("has_agent",
        max(when(col("ua") === Agent, 1).otherwise(0)).over(wHost))
      .filter((col("has_agent") === 1 && col("ua") === Agent) ||
        (col("has_agent") === 0 && col("ua") === "*"))
      .groupBy(col("host"))
      .agg(max(struct(col("line_no"), col("value"))).as("w"))
      .select(col("host"), col("w.value").cast("long").as("delay_s"))
  }

  /** DuckDB twin of [[delays]] over `robotsRel(host, robots)`. */
  def delaysSql(robotsRel: String): String =
    s"""WITH __dlines AS (
       |  SELECT host, l.i - 1 AS line_no,
       |    regexp_replace(l.raw, '#.*$$', '') AS line
       |  FROM $robotsRel,
       |    LATERAL (SELECT unnest(string_split(robots, chr(10))) AS raw,
       |      generate_subscripts(string_split(robots, chr(10)), 1) AS i)
       |      AS l),
       |__dparsed AS (
       |  SELECT host, line_no,
       |    lower(regexp_extract(line, '$LineRe', 1)) AS kind,
       |    regexp_extract(line, '$LineRe', 2) AS value
       |  FROM __dlines),
       |__dattr AS (
       |  SELECT host, line_no, kind, value,
       |    last_value(CASE WHEN kind = 'user-agent'
       |      THEN lower(value) END IGNORE NULLS)
       |      OVER (PARTITION BY host ORDER BY line_no
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua
       |  FROM __dparsed),
       |__druled AS (
       |  SELECT * FROM __dattr
       |  WHERE kind = 'crawl-delay' AND regexp_matches(value, '^\\d+$$')
       |    AND ua IS NOT NULL),
       |__dflagged AS (
       |  SELECT *, max(CASE WHEN ua = '$Agent' THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY host) AS has_agent
       |  FROM __druled)
       |SELECT host,
       |  CAST(max(struct_pack(line_no := line_no, value := value)).value
       |    AS BIGINT) AS delay_s
       |FROM __dflagged
       |WHERE (has_agent = 1 AND ua = '$Agent')
       |   OR (has_agent = 0 AND ua = '*')
       |GROUP BY host""".stripMargin

  /** Politeness fetch plan: per-host FIFO slots over a pending-URL
    * relation `(norm_url, src_doc)`, each slot offset by the host's
    * crawl delay (milliseconds; `defaultDelayMs` where no delay is
    * declared) — what a fetch scheduler enqueues. The delay relation
    * is host-sized and broadcast; the window is per-host (the
    * [[graft.streaming.FrontierJob.pendingBudget]] shape). */
  def fetchPlan(
      pending: DataFrame,
      parsedDelays: DataFrame,
      defaultDelayMs: Long): DataFrame = {
    val w = Window
      .partitionBy(regexp_extract(col("norm_url"),
        "^[a-z]+://([^/]+)", 1))
      .orderBy(col("src_doc"), col("norm_url"))
    pending
      .withColumn("host",
        regexp_extract(col("norm_url"), "^[a-z]+://([^/]+)", 1))
      .withColumn("slot", row_number().over(w).cast("long"))
      .join(broadcast(parsedDelays), Seq("host"), "left")
      .select(col("host"), col("norm_url"), col("slot"),
        ((col("slot") - 1) *
          coalesce(col("delay_s") * 1000, lit(defaultDelayMs)))
          .as("offset_ms"))
  }

  /** Gate a URL relation `(url, ...)` with the parsed rules: longest
    * matching prefix wins, Allow beats Disallow on length ties, no
    * match means allowed. Adds (host, path, allowed, matched). The
    * rules side is broadcast — frontier rows never shuffle. */
  def gate(urls: DataFrame, parsedRules: DataFrame): DataFrame = {
    val withPath = urls
      .withColumn("host",
        regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .withColumn("path", coalesce(
        nullif(regexp_extract(col("url"),
          "^[a-z]+://[^/]+(/.*)$", 1), lit("")), lit("/")))
    val joined = withPath
      .join(broadcast(parsedRules), Seq("host"), "left")
      .withColumn("m",
        when(col("prefix").isNotNull &&
          col("path").startsWith(col("prefix")),
          struct(col("rule_len"),
            when(col("rule") === "allow", 1L).otherwise(0L).as("al"),
            col("prefix"))))
    joined
      .groupBy(col("url"), col("host"), col("path"))
      .agg(max(col("m")).as("best"))
      .select(col("url"), col("host"), col("path"),
        coalesce(col("best.al") === 1L, lit(true)).as("allowed"),
        col("best.prefix").as("matched"))
  }

  /** DuckDB twin of [[gate]] over `urlsRel(url)` and a rules
    * relation named `rules`. */
  def gateSql(urlsRel: String): String =
    s"""SELECT url, host, path,
       |  coalesce(best.al = 1, TRUE) AS allowed,
       |  best.prefix AS matched
       |FROM (
       |  SELECT url, host, path,
       |    max(CASE WHEN prefix IS NOT NULL
       |      AND starts_with(path, prefix)
       |      THEN {'rule_len': rule_len,
       |            'al': CASE WHEN rule = 'allow' THEN 1 ELSE 0 END,
       |            'prefix': prefix} END) AS best
       |  FROM (
       |    SELECT u.url,
       |      regexp_extract(u.url, '^[a-z]+://([^/]+)', 1) AS host,
       |      coalesce(nullif(regexp_extract(u.url,
       |        '^[a-z]+://[^/]+(/.*)$$', 1), ''), '/') AS path,
       |      r.prefix, r.rule_len, r.rule
       |    FROM $urlsRel u LEFT JOIN rules r
       |      ON r.host = regexp_extract(u.url, '^[a-z]+://([^/]+)', 1)
       |  ) __j
       |  GROUP BY url, host, path) __g""".stripMargin
}
