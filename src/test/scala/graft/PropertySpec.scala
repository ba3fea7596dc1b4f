package graft

import graft.price.PriceParsers
import graft.text.{CanonicalTrie, CzechText, NameCorrection}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY §5.2). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("parsePrice is total: never throws on arbitrary strings") {
    check(Prop.forAll { (s: String) =>
      PriceParsers.parsePrice(s)
      true
    })
  }

  test("parsePrice cents rule: digit-only strings longer than 2") {
    val digits = Gen.chooseNum(3, 9).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    check(Prop.forAll(digits) { d =>
      val expected = (d.dropRight(2) + "." + d.takeRight(2)).toDouble
      PriceParsers.parsePrice(d).contains(expected)
    })
  }

  test("dispatcher is total over arbitrary shop/class/text") {
    val shops = Gen.oneOf("Lidl", "Penny", "Billa", "Makro", "Globus",
      "Ratio", "Kaufland", "NoSuchShop", "")
    val classes = Gen.oneOf("item_price", "item_member_price",
      "item_initial_price", "other", "")
    check(Prop.forAll(shops, classes, Gen.asciiPrintableStr) { (sh, cl, tx) =>
      PriceParsers.processPriceByClassId(sh, tx, cl)
      true
    })
  }

  test("segmentation recovers a cover for any concatenation of long vocab words") {
    val trie = new CanonicalTrie
    val vocab = Seq("smetanovy", "jogurt", "mleko", "cokolada", "kureci")
    vocab.foreach(trie.insert)
    val words = Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.take(5))
    check(Prop.forAll(words) { ws =>
      val text = ws.mkString("")
      val out = NameCorrection.correct(text, trie)
      // a full cover exists, so the DP must produce one (score >= generating
      // split since every vocab word here scores +len > 0)
      out.nonEmpty && out.split(" ").mkString("") == text
    })
  }

  test("uncoverable text yields empty segmentation") {
    val trie = new CanonicalTrie
    trie.insert("abc")
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf('x', 'y', 'z')).map(_.mkString)) {
      t => NameCorrection.correct(t, trie).isEmpty
    })
  }

  test("normalize is idempotent on its own output modulo edge whitespace") {
    check(Prop.forAll { (s: String) =>
      val once = CzechText.normalize(s)
      val twice = CzechText.normalize(once)
      // a second pass may only strip edge spaces introduced by the
      // non-ASCII -> space replacement (the reference behaves identically)
      twice == once.replaceAll("^\\s+", "").replaceAll("\\s+$", "")
    })
  }

  test("canonical trie matches any confusion-variant of an inserted word") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    val subst = Map('i' -> "il1", 'l' -> "il1", '1' -> "il1",
      'r' -> "rj", 'j' -> "rj", 'e' -> "eo", 'o' -> "eo")
    def variantGen(w: String): Gen[String] =
      Gen.sequence[List[Char], Char](w.map { c =>
        subst.get(c).map(opts => Gen.oneOf(opts.toList)).getOrElse(Gen.const(c))
      }.toList).map(_.mkString)
    check(Prop.forAll(word) { w =>
      val trie = new CanonicalTrie
      trie.insert(w)
      Prop.forAll(variantGen(w)) { v => trie.search(v) }
    })
  }
}
