package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.io.Source

/** Dictionary-driven item-name correction — the reference's
  * `process_single_word` (dags/utils/correct_names.py:117-143):
  * normalize -> strip all whitespace -> find every trie substring match ->
  * dynamic-programming best cover -> join with spaces.
  *
  * Scoring (dags/utils/correct_names.py:99-102): words of length <= 3
  * score -10, longer words score +length. Text that cannot be fully covered
  * by dictionary words yields "" (the DP never reaches the end).
  *
  * Divergence note: the reference's hunspell fallback
  * (correct_names.py:127-138) is dead code — every word in the best split
  * came from the trie, so `trie.search(word)` is always true; it is
  * intentionally not replicated.
  *
  * The trie is built once per JVM from the bundled vocabulary (a classpath
  * resource), so executors pay zero serialization/broadcast cost — the
  * right trade at 1000-executor scale for a ~35k-word dictionary.
  */
object NameCorrection extends Serializable {

  final case class Segmentation(score: Double, words: List[String])

  /** DP over (word, start, end) matches, exactly replicating the
    * reference's `best_word_combination` (dags/utils/correct_names.py:105-114)
    * including first-wins tie-breaking (strict `>`). */
  def bestWordCombination(
      words: Seq[(String, Int, Int)],
      textLength: Int): List[String] = {
    val negInf = Double.NegativeInfinity
    val dpScore = Array.fill(textLength + 1)(negInf)
    val dpWords = Array.fill[List[String]](textLength + 1)(Nil)
    dpScore(0) = 0.0
    words.foreach { case (word, start, end) =>
      val score = if (word.length <= 3) -10.0 else word.length.toDouble
      if (dpScore(start) + score > dpScore(end)) {
        dpScore(end) = dpScore(start) + score
        dpWords(end) = word :: dpWords(start) // reversed; flipped on read-out
      }
    }
    dpWords(textLength).reverse
  }

  def correct(text: String, trie: CanonicalTrie): String = {
    if (text == null) return null
    val concatenated =
      CzechText.normalize(text).split("\\s+").mkString("")
    val found = trie.findAllWords(concatenated)
    bestWordCombination(found, concatenated.length).mkString(" ")
  }

  /** Per-JVM vocabulary trie from the bundled resource (the reference's
    * `unique_item_names.txt`, 35,859 lines — see dags/data_pipeline.py:25-33). */
  @transient lazy val defaultTrie: CanonicalTrie = {
    val in = getClass.getResourceAsStream("/graft/unique_item_names.txt")
    require(in != null, "vocabulary resource /graft/unique_item_names.txt missing")
    val src = Source.fromInputStream(in, "UTF-8")
    try CanonicalTrie.fromVocabulary(src.getLines()) finally src.close()
  }

  def correctDefault(text: String): String = correct(text, defaultTrie)

  /** Spark UDF over the default vocabulary. Deterministic and null-safe. */
  val correctNameUdf: UserDefinedFunction =
    udf((s: String) => if (s == null) null else correctDefault(s))

  def correctName(c: Column): Column = correctNameUdf(c)
}
