package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The C4 cleaning battery (Raffel et al. 2020, arXiv:1910.10683,
  * §2.2) — the other canonical published heuristic corpus filter next
  * to [[GopherRules]]. Where Gopher scores a document as a whole, C4
  * first DROPS individual lines (terminal-punctuation rule, short-line
  * rule, "javascript" rule) and then gates the page on what survived
  * (sentence floor) plus raw-page content rules (lorem ipsum, curly
  * brace, badword list).
  *
  * All rules are row-local single-pass column expressions — zero
  * shuffle, zero UDF, whole-stage-codegen friendly — so the filter
  * runs at scan speed on a 100 TB corpus. Published thresholds are the
  * defaults; the badword list is a caller-supplied parameter (the
  * published filter uses the externally-maintained LDNOOBW list, which
  * is data, not engine — the unit fixture plants its own stand-ins).
  *
  * Derivation notes vs the published description:
  *  - "terminal punctuation" = `.` `!` `?` optionally followed by a
  *    closing quote, at end of line (the paper names the end-quote
  *    case explicitly);
  *  - sentence count is the count of terminal punctuation marks in the
  *    RETAINED text (the reference implementation counts
  *    sentence-tokenizer output; a punctuation count is the faithful
  *    engine-neutral form of the same floor and is what both engines
  *    can compute bit-identically).
  */
object C4Rules {

  /** Published line floor: lines with fewer words are dropped. */
  val MinWordsPerLine = 5L

  /** Published page floor: pages with fewer retained sentences drop. */
  val MinSentences = 3L

  /** A retained line ends in terminal punctuation, carries at least
    * [[MinWordsPerLine]] words, and does not mention javascript. */
  def lineKept(l: Column): Column =
    l.rlike("[.!?][\"']?\\s*$") &&
      size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= MinWordsPerLine &&
      !lower(l).contains("javascript")

  /** The page text after C4 line filtering (retained lines re-joined
    * with newlines). `text` must be non-null. */
  def retained(text: Column): Column =
    array_join(filter(split(text, "\n"), l => lineKept(l)), "\n")

  /** (flag name, flag column) in rule order over the raw page `text`;
    * a page passes C4 when every flag holds. `badwords` are matched as
    * whole lowercase word tokens anywhere on the raw page. */
  def flags(text: Column, badwords: Seq[String]): Seq[(String, Column)] = {
    val sentences = regexp_count(retained(text), lit("[.!?]"))
    Seq(
      "sentences_ok" -> (sentences >= MinSentences),
      "lorem_ok" -> !lower(text).contains("lorem ipsum"),
      "brace_ok" -> !text.contains("{"),
      "badwords_ok" -> !arrays_overlap(
        regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)),
        array(badwords.map(lit): _*)))
  }

  /** Conjunction of all four page flags. */
  def pass(text: Column, badwords: Seq[String]): Column =
    flags(text, badwords).map(_._2).reduce(_ && _)

  // ---- DuckDB twins (same rules as SQL over column `text`) ----------

  /** Line-retention predicate over a line expression `l`. */
  def lineKeptSql(l: String): String =
    s"""(regexp_matches($l, '[.!?]["'']?\\s*$$')
       |  AND len(regexp_extract_all($l, '\\S+')) >= $MinWordsPerLine
       |  AND NOT contains(lower($l), 'javascript'))""".stripMargin

  /** Retained-text expression (line filter + newline re-join). */
  def retainedSql: String =
    s"""array_to_string(list_filter(string_split(text, chr(10)),
       |    l -> ${lineKeptSql("l")}), chr(10))""".stripMargin

  /** The four page flags as (name, SQL) pairs. */
  def oracleFlagsSql(badwords: Seq[String]): Seq[(String, String)] = {
    val sentences = s"len(regexp_extract_all($retainedSql, '[.!?]'))"
    val badList = badwords.map(w => s"'$w'").mkString("[", ", ", "]")
    Seq(
      "sentences_ok" -> s"($sentences >= $MinSentences)",
      "lorem_ok" -> "(NOT contains(lower(text), 'lorem ipsum'))",
      "brace_ok" -> "(NOT contains(text, '{'))",
      "badwords_ok" -> ("(NOT list_has_any(" +
        s"regexp_extract_all(lower(text), '[a-z0-9]+'), $badList))"))
  }
}
