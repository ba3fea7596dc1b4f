package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Czech text normalization — the reference's `preprocess_text`
  * (reference: dags/utils/correct_names.py:13-18) re-expressed as a
  * composition of codegen'd Spark built-ins (no UDF), plus a plain-Scala
  * twin used inside the name-correction UDF where the trie needs the exact
  * same normalization on the driver/executor side.
  *
  * Semantics (order matters, mirrors the reference exactly):
  *   1. delete tab / newline / `|`; NBSP (U+00A0) becomes a space
  *   2. strip leading/trailing whitespace
  *   3. lowercase
  *   4. transliterate 31 Czech diacritic characters to ASCII
  *      (reference: dags/utils/correct_names.py:6-9)
  *   5. replace any remaining non-ASCII character with a space
  *      (note: no final trim — trailing spaces introduced by step 5 stay,
  *      as in the reference)
  */
object CzechText {
  /** 1:1 diacritic fold (reference: dags/utils/correct_names.py:6-9). */
  val CzechSrc = "áčçďéěíňóřšťúůýž" +
    "ÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ"
  val CzechDst = "accdeeinorstuuyz" + "ACDEEINORSTUUYZ"

  /** Column form — pure built-ins so it stays inside whole-stage codegen. */
  def normalizeCzech(c: Column): Column = {
    // translate deletes chars whose replacement is absent: NBSP -> ' ',
    // tab/newline/pipe -> deleted.
    val cleaned = translate(c, "\u00A0\t\n|", " ")
    val stripped = regexp_replace(regexp_replace(cleaned, "^\\s+", ""), "\\s+$", "")
    val folded = translate(lower(stripped), CzechSrc, CzechDst)
    regexp_replace(folded, "[^\\x00-\\x7F]", " ")
  }

  private val foldMap: Map[Char, Char] = CzechSrc.zip(CzechDst).toMap

  /** Scalar twin of [[normalizeCzech]]; must stay semantically identical. */
  def normalize(s: String): String = {
    if (s == null) return null
    val cleaned = s.flatMap {
      case '\t' | '\n' | '|' => ""
      case '\u00A0'          => " "
      case ch                => ch.toString
    }
    val stripped = cleaned.replaceAll("^\\s+", "").replaceAll("\\s+$", "")
    val folded = stripped.toLowerCase(java.util.Locale.ROOT).map(ch => foldMap.getOrElse(ch, ch))
    folded.map(ch => if (ch > 0x7f) ' ' else ch)
  }
}
