package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446,
  * Appendix A.1.1) — the published heuristic document filter that
  * public corpus recipes (MassiveText, RefinedWeb, Dolma) apply before
  * any learned scoring. Seven row-local rules; every ratio is a
  * quotient of two integers, so both engines compute bit-identical
  * doubles and the comparisons are hash-exact with no rounding step.
  * Zero shuffle, zero UDF: one whole-stage-codegen map over the corpus.
  *
  * Thresholds are the paper's — including the 50-word floor, so a
  * library caller gets published behavior by default. Callers gating a
  * corpus whose documents are uniformly shorter (like the synthetic
  * fixture, where 50 would fail every row alike and gate nothing) pass
  * an explicit `minWords` at the call site.
  */
object GopherRules {

  /** Minimum word count — the paper's published value. */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MaxBulletLineRatio = 0.9
  val MaxEllipsisLineRatio = 0.3
  val MinAlphaWordRatio = 0.8
  val MinStopwordKinds = 2

  /** The paper's stop-word list. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  private def lines(text: Column): Column = split(text, "\n")

  /** (flag name, flag column) in rule order; `text` must be non-null.
    * `minWords` overrides the word-count floor for short-document
    * corpora and `minStopKinds` the distinct-stop-word floor for
    * synthetic-vocabulary corpora (the fixture corpus contains "the"
    * but none of the other seven stop words, so the paper's 2 would
    * fail every row alike and gate nothing — the same fixture-scaling
    * situation as the word-count floor); every other threshold is
    * fixed at the paper's value. */
  def flags(text: Column, minWords: Long = MinWords,
      minStopKinds: Int = MinStopwordKinds): Seq[(String, Column)] = {
    val wc = size(words(text)).cast("long")
    val nchars = length(regexp_replace(text, "\\s+", ""))
    val nlines = size(lines(text))
    val nsym = regexp_count(text, lit("#|\\.\\.\\."))
    val nbullet = size(filter(lines(text),
      l => l.rlike("^\\s*[-*]")))
    val nellipsis = size(filter(lines(text),
      l => l.rlike("\\.\\.\\.\\s*$")))
    val nalpha = size(filter(words(text),
      w => w.rlike("[A-Za-z]")))
    val nstop = Stopwords
      .map(s => when(regexp_count(text,
          lit(s"(?i)\\b$s\\b")) > 0, 1).otherwise(0))
      .reduce(_ + _)
    Seq(
      "wc_ok" -> (wc >= minWords && wc <= MaxWords),
      "wlen_ok" -> (wc > 0 &&
        nchars.cast("double") / wc >= MinMeanWordLen &&
        nchars.cast("double") / wc <= MaxMeanWordLen),
      "sym_ok" -> (wc > 0 &&
        nsym.cast("double") / wc < MaxSymbolRatio),
      "bullet_ok" ->
        (nbullet.cast("double") / nlines < MaxBulletLineRatio),
      "ellipsis_ok" ->
        (nellipsis.cast("double") / nlines < MaxEllipsisLineRatio),
      "alpha_ok" -> (wc > 0 &&
        nalpha.cast("double") / wc >= MinAlphaWordRatio),
      "stop_ok" -> (nstop >= minStopKinds))
  }

  /** Conjunction of all seven flags. */
  def pass(text: Column, minWords: Long = MinWords,
      minStopKinds: Int = MinStopwordKinds): Column =
    flags(text, minWords, minStopKinds).map(_._2).reduce(_ && _)

  /** DuckDB twin: the same flags as a SQL select list over column
    * `text`. chr(10) splits lines like Spark's split on \n. */
  def oracleFlagsSql(minWords: Long = MinWords,
      minStopKinds: Int = MinStopwordKinds): Seq[(String, String)] = {
    val wc = "len(regexp_extract_all(text, '\\S+'))"
    val nchars = "length(regexp_replace(text, '\\s+', '', 'g'))"
    val nlines = "len(string_split(text, chr(10)))"
    val nsym = "len(regexp_extract_all(text, '#|\\.\\.\\.'))"
    val nbullet =
      """len(list_filter(string_split(text, chr(10)),
        |      l -> regexp_matches(l, '^\s*[-*]')))""".stripMargin
    val nellipsis =
      """len(list_filter(string_split(text, chr(10)),
        |      l -> regexp_matches(l, '\.\.\.\s*$')))""".stripMargin
    val nalpha =
      """len(list_filter(regexp_extract_all(text, '\S+'),
        |      w -> regexp_matches(w, '[A-Za-z]')))""".stripMargin
    val nstop = Stopwords
      .map(s =>
        s"CASE WHEN len(regexp_extract_all(text, '(?i)\\b$s\\b')) > 0 " +
          "THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    Seq(
      "wc_ok" -> s"($wc >= $minWords AND $wc <= $MaxWords)",
      "wlen_ok" -> (s"($wc > 0 AND $nchars * 1.0 / $wc >= $MinMeanWordLen " +
        s"AND $nchars * 1.0 / $wc <= $MaxMeanWordLen)"),
      "sym_ok" -> s"($wc > 0 AND $nsym * 1.0 / $wc < $MaxSymbolRatio)",
      "bullet_ok" -> s"($nbullet * 1.0 / $nlines < $MaxBulletLineRatio)",
      "ellipsis_ok" ->
        s"($nellipsis * 1.0 / $nlines < $MaxEllipsisLineRatio)",
      "alpha_ok" -> s"($wc > 0 AND $nalpha * 1.0 / $wc >= $MinAlphaWordRatio)",
      "stop_ok" -> s"($nstop >= $minStopKinds)")
  }
}
