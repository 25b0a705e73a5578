package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultiReplaceSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics: leftmost scan, longest-first alternation —
    * the exact formulation q117's DuckDB oracle uses.
    */
  private def regexRef(text: String, terms: Seq[String], repl: String): String = {
    val pat = terms.sortBy(t => (-t.length, t))
      .map(Pattern.quote).mkString("|")
    Pattern.compile(pat).matcher(text)
      .replaceAll(Matcher.quoteReplacement(repl))
  }

  test("longest term wins at a shared start; scan resumes after the match") {
    val r = MultiReplaceKernel.replaceAll("xabcabx", Seq("ab", "abc"), "#")
    assert(r == "x##x")
    assert(r == regexRef("xabcabx", Seq("ab", "abc"), "#"))
  }

  test("phrases (terms with spaces) match across token boundaries") {
    assert(MultiReplaceKernel.replaceAll(
      "the big data set", Seq("big data", "data"), "~") == "the ~ set")
  }

  test("adjacent and repeated matches, and a match at the very end") {
    assert(MultiReplaceKernel.replaceAll("ababab", Seq("ab"), ".") == "...")
    assert(MultiReplaceKernel.replaceAll("xyab", Seq("ab"), ".") == "xy.")
    assert(MultiReplaceKernel.replaceAll("no hits here", Seq("zz"), ".") == "no hits here")
  }

  test("a term that is a suffix of another is found via fail links") {
    // "cab" fails mid-"ca|b..." — the automaton must still report "ab"
    assert(MultiReplaceKernel.replaceAll("xcab", Seq("cax", "ab"), "#") == "xc#")
  }

  test("property: kernel == longest-first-alternation regex on random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc "
    for (_ <- 1 to 300) {
      val text = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val nTerms = 1 + rnd.nextInt(6)
      val terms = Seq.fill(nTerms)(
        Seq.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(3))).mkString).distinct
      val got = MultiReplaceKernel.replaceAll(text, terms, "#")
      val want = regexRef(text, terms, "#")
      assert(got == want, s"text='$text' terms=$terms: got '$got' want '$want'")
    }
  }

  test("column expression runs inside codegen and matches the kernel") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", lower($"text").as("t"))
    val terms = Seq("data", "the", "big data")
    val out = df.select($"doc_id",
      MultiReplaceExpr.multiReplace($"t", terms, "§").as("s"),
      $"t").collect()
    out.foreach { r =>
      assert(r.getString(1) ==
        MultiReplaceKernel.replaceAll(r.getString(2), terms, "§"))
    }
  }

  test("automaton scales: 10k terms, one pass, no per-term cost blowup") {
    val rnd = new scala.util.Random(7)
    val terms = (1 to 10000).map(i => s"term${i}x${rnd.nextInt(1000)}").distinct
    val text = ("filler " * 2000) + terms(5000) + " tail"
    val r = MultiReplaceKernel.replaceAll(text, terms, "#")
    assert(r.contains("# tail") && !r.contains(terms(5000)))
  }
}
