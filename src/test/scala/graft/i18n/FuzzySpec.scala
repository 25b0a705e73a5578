package graft.i18n

import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with Python difflib/fuzzywuzzy behavior — values below
  * computed from the public algorithms' definitions.
  */
class FuzzySpec extends AnyFunSuite {

  test("ratio matches difflib SequenceMatcher on known cases") {
    // difflib: SequenceMatcher(None,'abcd','bcde').ratio() == 0.75
    assert(Fuzzy.ratio("abcd", "bcde") == 0.75)
    assert(Fuzzy.ratio("abc", "abc") == 1.0)
    assert(Fuzzy.ratio("abc", "xyz") == 0.0)
    assert(Fuzzy.ratio("", "") == 1.0)
  }

  test("qratio applies full_process then rounds x100") {
    // 'GERMANY!' vs 'germany' -> processed 'germany'/'germany' -> 100
    assert(Fuzzy.qratio("GERMANY!", "germany") == 100)
    // 'germanyx' vs 'germany': 2*7/15 = 0.9333 -> 93
    assert(Fuzzy.qratio("germanyx", "germany") == 93)
    // empty after processing -> 0
    assert(Fuzzy.qratio("!!!", "abc") == 0)
  }

  test("fullProcess strips punctuation, lowers, collapses spaces") {
    assert(Fuzzy.fullProcess("  Hello, World!  ") == "hello world")
    assert(Fuzzy.fullProcess("a-b_c") == "a b c")
  }

  test("extract honors cutoff and limit, sorted by score") {
    val choices = Seq("germany", "france", "german")
    val got = Fuzzy.extract("germny", choices, limit = 2, cutoff = 80)
    assert(got.nonEmpty && got.head._1 == "germany")
    assert(got.forall(_._2 >= 80))
    assert(Fuzzy.extract("zzz", choices, cutoff = 90).isEmpty)
  }

  test("translateValue: exact hit, fuzzy hit, miss passthrough") {
    val dict = Map(
      "germany" -> Translate.Entry("germany", "en_de", "ar_de"),
      "france" -> Translate.Entry("france", "en_fr", "ar_fr"))
    val t = Translate.translateValue(dict, "GERMANY, francex, unknownia", ",")
    assert(t.f == Seq("germany", "france", "unknownia"))
    assert(t.f__en == Seq("en_de", "en_fr", "unknownia"))
    assert(t.misses == Seq("unknownia"))
  }
}
