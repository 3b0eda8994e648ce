package graft

import graft.lm.{CharLm, Scorer}
import org.scalatest.funsuite.AnyFunSuite

class ScorerSpec extends AnyFunSuite {

  test("LM score is deterministic across calls and cache states") {
    val t = "die bedeutung der finanziellen interessen"
    val a = CharLm.score(t)
    val b = CharLm.score(t)
    val c = Scorer.score(t) // through LRU
    assert(a == b && b == c)
    assert(a > 0)
  }

  test("empty text scores +inf; singleScore special-cases one char") {
    assert(CharLm.score("") == Double.PositiveInfinity)
    assert(Scorer.singleScore("x") == Double.PositiveInfinity)
    assert(Scorer.singleScore("xy") < Double.PositiveInfinity)
  }

  test("newline_or_not single-char special cases (dehyphen_wrapper.py:51-54)") {
    assert(Scorer.newlineOrNot("x", "anything at all"))
    assert(!Scorer.newlineOrNot("anything at all", "y"))
  }

  test("dehyphen: drop hyphen when joined word is in the dictionary") {
    val out = Scorer.dehyphenParagraph(List(
      List("die", "bedeutung", "der", "finan- "),
      List("ziellen", "interessen")))
    assert(out == List(List("die", "bedeutung", "der", "finanziellen", "interessen")))
  }

  test("dehyphen: keep hyphen for a compound of two dictionary words") {
    val out = Scorer.dehyphenParagraph(List(
      List("auch", "andere", "EU- "),
      List("Staaten", "wie")))
    assert(out == List(List("auch", "andere", "EU-Staaten", "wie")))
  }

  test("dehyphen: glue token of the merged word is dropped with the break") {
    val out = Scorer.dehyphenParagraph(List(
      List("finan-\n"),
      List("ziellen", "rest ")))
    assert(out == List(List("finanziellen", "rest ")))
  }

  test("dehyphen: chained merges re-examine the merged line") {
    val out = Scorer.dehyphenParagraph(List(
      List("finan-"), List("ziel-"), List("len", "x")))
    assert(out == List(List("finanziellen", "x")))
  }

  test("dehyphen: non-hyphenated lines pass through untouched") {
    val in = List(List("a", "b "), List("c", "d"))
    assert(Scorer.dehyphenParagraph(in) == in)
    // a bare "-" word (core length 1) is not a hyphenation
    val dash = List(List("a", "- "), List("b"))
    assert(Scorer.dehyphenParagraph(dash) == dash)
  }

  test("joinSplitLines joins a strong junction, refuses a weak one") {
    // junction present verbatim in the corpus -> join wins
    val j = Scorer.joinSplitLines(
      List("nach", "ansicht", "der"),
      List("verbände", "ist", "eine", "klärung", "erforderlich"))
    assert(j.contains(List("nach", "ansicht", "der", "verbände", "ist",
      "eine", "klärung", "erforderlich")))
    // unrelated page-number-ish boundary -> no join
    val n = Scorer.joinSplitLines(
      List("Seite", "3", "von", "10"),
      List("Die", "Kommission", "hat", "einen", "Bericht", "vorgelegt"))
    assert(n.isEmpty)
    // one-char guard sees through the reflow glue token: "1 " is still a
    // single-char boundary line the LM cannot score
    assert(Scorer.joinSplitLines(List("1 "),
      List("verbände", "ist", "eine", "klärung")).isEmpty)
    assert(Scorer.joinSplitLines(List("nach", "ansicht"), List("2\n")).isEmpty)
  }

  test("scores quantized: equal inputs give bit-equal scores") {
    assert(Scorer.score("Seite 1 von 2") == Scorer.score("Seite 1 von 2"))
    // the dedup tie case: '1' and '2' are both unseen digits -> same score
    assert(Scorer.score("Seite 1 von 2") == Scorer.score("Seite 2 von 2"))
  }

  test("lang selection: monolingual models prefer their own language") {
    // German sentence scores better (lower) under the de model than en
    val deText = "die bedeutung der finanziellen interessen"
    assert(Scorer.score(deText, "de") < Scorer.score(deText, "en"))
    // English sentence scores better under the en model than de
    val enText = "the committee has reviewed the proposal"
    assert(Scorer.score(enText, "en") < Scorer.score(enText, "de"))
    // default/multi behavior unchanged (goldens pin these scores)
    assert(Scorer.score(deText) == Scorer.score(deText, "multi"))
  }

  test("lang canonicalization mirrors the reference's -fast suffix scheme") {
    import graft.lm.CharLm
    // dehyphen_wrapper.py:18-31: lang + optional -fast pick the model
    assert(CharLm.canonicalLang("de") == "de")
    assert(CharLm.canonicalLang("de-fast") == "de")
    assert(CharLm.canonicalLang("en-fast") == "en")
    assert(CharLm.canonicalLang("multi-v0-fast") == "multi")
    assert(CharLm.canonicalLang("fr") == "multi") // unknown -> combined
    // the per-lang kernels: a German hyphenation decided under lang=de
    assert(Scorer.dehyphenParagraph(
      List(List("der", "finan- "), List("ziellen", "betrag")), "de-fast")
      == List(List("der", "finanziellen", "betrag")))
  }
}
