package graft.dedup

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], pct: Int = 80,
      minGrams: Int = 10, maxDf: Int = 100) =
    Dedup.containmentPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
        pct, minGrams, maxDf)
      .orderBy("contained_id", "container_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq

  test("a quote inside a long document scores one direction only") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val container = s"unrelated preamble text sits here first. $quote " +
      "and then a very long unrelated epilogue continues for quite a " +
      "while with plenty of additional distinct wording to dilute overlap"
    val got = run(Seq(1L -> quote, 2L -> container))
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 95) // near-total gram coverage of the quote
  }

  test("identical documents contain each other at 100%") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val got = run(Seq(1L -> t, 2L -> t))
    assert(got == Seq((1L, 2L, 100L), (2L, 1L, 100L)))
  }

  test("disjoint documents never pair") {
    val got = run(Seq(
      1L -> "aaa bbb ccc ddd eee fff ggg hhh",
      2L -> "mmm nnn ooo ppp qqq rrr sss ttt"))
    assert(got.isEmpty)
  }

  test("df cap removes boilerplate grams from the universe, not just the index") {
    // a tail shared by every doc would otherwise dilute nothing/everything;
    // with maxDf = 2 the shared tail leaves both numerators AND denominators
    val tail = " shared boilerplate footer common to all documents here"
    val docs = Seq(
      1L -> ("unique first document body with its own words" + tail),
      2L -> ("unique first document body with its own words extended further" + tail),
      3L -> ("completely different third text altogether" + tail))
    val capped = run(docs, pct = 80, minGrams = 5, maxDf = 2)
    // doc1's own grams are inside doc2; doc3 shares only the pruned tail
    assert(capped.exists(t => t._1 == 1L && t._2 == 2L))
    assert(!capped.exists(t => t._1 == 3L || t._2 == 3L))
  }

  test("minGrams suppresses tiny documents") {
    val got = run(Seq(1L -> "tiny", 2L -> "tiny"), minGrams = 10)
    assert(got.isEmpty)
  }
}
