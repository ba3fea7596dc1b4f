package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing pass
  * every training-data pipeline runs before a corpus ships (C4 strips
  * "bad words" pages; production pipelines additionally strip emails,
  * phone numbers, bare IPs, and payment-card numbers from retained
  * text).
  *
  * Design: four anchored regular expressions in the Java∩RE2 dialect
  * subset (no backreferences, no lookaround) so the SAME pattern string
  * runs under Spark's codegen'd `regexp_extract_all`/`regexp_replace`
  * and under the DuckDB oracle. Detection and redaction are row-local
  * narrow projections — zero shuffle, whole-stage-codegen'd, and
  * embarrassingly parallel at 100 TB (the scan partitioning IS the
  * parallelism; no operator state, no driver traffic).
  *
  * Redaction applies in a FIXED order (email → card → phone → ip) so
  * the output is deterministic even if a future pattern pair could
  * overlap; with these four the match sets are disjoint by
  * construction (emails contain `@`, cards are space-separated digit
  * groups, phones are dash-separated, IPs are dot-separated).
  */
object PiiScrub {

  /** RFC-shaped but deliberately conservative: one token, one `@`, a
    * dotted domain with an alphabetic TLD of length >= 2. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix dashed form: +C[C]-NNN-NNN-NNNN. */
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Dotted-quad IPv4. The `\b` anchors bound DIGIT runs only: the quad
    * cannot start or end mid-number (no firing inside `91.2.3.4` as
    * `1.2.3.4`), but a DOT is a word boundary after a digit, so in a
    * longer dotted run like `1.2.3.4.5` the quad DOES fire on the
    * `1.2.3.4` prefix (→ `[IP].5`). That over-redaction is the accepted
    * contract — pinned verbatim by PiiScrubSpec ("5-part dotted
    * version") and identical in both engines since the pattern is
    * shared; excluding it would need lookaround, which the Java∩RE2
    * dialect subset deliberately forbids. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** 16-digit payment-card number in 4x4 space-grouped form. */
  val CardRe = "\\b\\d{4} \\d{4} \\d{4} \\d{4}\\b"

  /** Per-type occurrence count (long, to match the oracle's BIGINT). */
  def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** All four PII classes replaced by their type tags, in the fixed
    * order documented above. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "[EMAIL]")
    val c = regexp_replace(e, CardRe, "[CARD]")
    val p = regexp_replace(c, PhoneRe, "[PHONE]")
    regexp_replace(p, Ipv4Re, "[IP]")
  }

  /** DuckDB twin of [[countOf]] — `len(regexp_extract_all(...))` is
    * BIGINT, matching the Spark side's explicit cast. */
  def countSql(expr: String, re: String): String =
    s"len(regexp_extract_all($expr, '$re'))"

  /** DuckDB twin of [[redact]]. DuckDB's `regexp_replace` replaces only
    * the FIRST match by default — the 'g' flag makes it global like
    * Spark's. Same fixed order. */
  def redactSql(expr: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    $expr, '$EmailRe', '[EMAIL]', 'g'),
       |    '$CardRe', '[CARD]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g'),
       |    '$Ipv4Re', '[IP]', 'g')""".stripMargin
}
