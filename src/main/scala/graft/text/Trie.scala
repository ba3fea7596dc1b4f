package graft.text

import scala.collection.mutable

/** Prefix trie over the item-name vocabulary with OCR-confusion tolerance.
  *
  * The reference (dags/utils/correct_names.py:24-78) inserts, for every
  * vocabulary word, the full cartesian product of variants substituting
  * within the confusion classes {i, l, 1}, {r, j}, {e, o} at every position,
  * then matches raw text against the expanded trie. That expansion is
  * exponential in the number of substitutable characters; the equivalent
  * (and 100-TB-scale-friendly) formulation used here canonicalizes every
  * character to a class representative at BOTH insert and lookup time:
  * a text word matches iff its canonical form equals the canonical form of
  * some vocabulary word — exactly the membership the expanded trie encodes,
  * at O(len) memory per word instead of O(3^k).
  */
final class TrieNode extends Serializable {
  val children: mutable.Map[Char, TrieNode] = mutable.Map.empty
  var isWord: Boolean = false
}

final class CanonicalTrie extends Serializable {
  val root = new TrieNode

  /** Class representative: i/l/1 -> i, r/j -> r, e/o -> e
    * (reference: dags/utils/correct_names.py:25-33). */
  @inline def canonical(c: Char): Char = c match {
    case 'l' | '1' => 'i'
    case 'j'       => 'r'
    case 'o'       => 'e'
    case other     => other
  }

  def insert(word: String): Unit = {
    var node = root
    var i = 0
    while (i < word.length) {
      val ch = canonical(word.charAt(i))
      node = node.children.getOrElseUpdate(ch, new TrieNode)
      i += 1
    }
    node.isWord = true
  }

  def search(word: String): Boolean = {
    var node = root
    var i = 0
    while (i < word.length) {
      node.children.get(canonical(word.charAt(i))) match {
        case Some(n) => node = n; i += 1
        case None    => return false
      }
    }
    node.isWord
  }

  /** All (word, start, endExclusive) substring matches of `text`, scanning
    * every start position — O(n * maxWordLen), emitted in (start asc,
    * end asc) order exactly as the reference's `find_all_words`
    * (dags/utils/correct_names.py:81-96). The emitted `word` is the RAW
    * text slice (not the canonical form), matching reference behavior.
    */
  def findAllWords(text: String): IndexedSeq[(String, Int, Int)] = {
    val out = IndexedSeq.newBuilder[(String, Int, Int)]
    var start = 0
    while (start < text.length) {
      var node = root
      var end = start
      var continue = true
      while (continue && end < text.length) {
        node.children.get(canonical(text.charAt(end))) match {
          case Some(n) =>
            node = n
            if (n.isWord) out += ((text.substring(start, end + 1), start, end + 1))
            end += 1
          case None => continue = false
        }
      }
      start += 1
    }
    out.result()
  }
}

object CanonicalTrie {
  /** Build from vocabulary lines: each line is normalized then split on
    * whitespace; every resulting token is inserted
    * (reference: dags/data_pipeline.py:25-33). */
  def fromVocabulary(lines: Iterator[String]): CanonicalTrie = {
    val trie = new CanonicalTrie
    lines.foreach { line =>
      CzechText.normalize(line).split("\\s+").foreach { w =>
        if (w.nonEmpty) trie.insert(w)
      }
    }
    trie
  }
}
