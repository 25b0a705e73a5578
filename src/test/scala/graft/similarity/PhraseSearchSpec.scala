package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrases: Seq[(Long, Seq[String])]) = {
    val d = docs.toDF("doc_id", "text")
    val p = phrases.toDF("query_id", "ph")
    PhraseSearch.matches(
        PhraseSearch.postings(d, "text", "doc_id"),
        PhraseSearch.phraseTerms(p, "query_id", "ph"))
      .orderBy("query_id", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("adjacency is strict: gaps and reorderings do not match") {
    val docs = Seq(
      1L -> "the new york times today",
      2L -> "new in york times",      // gap
      3L -> "york new times",         // reorder
      4L -> "prefix words then new york again")
    val got = run(docs, Seq(10L -> Seq("new", "york")))
    assert(got == Seq((10L, 1L, 1L, 2L), (10L, 4L, 1L, 4L)))
  }

  test("overlapping occurrences all count; first_pos is the earliest anchor") {
    val got = run(Seq(7L -> "a a a a b"), Seq(1L -> Seq("a", "a")))
    assert(got == Seq((1L, 7L, 3L, 1L)))
  }

  test("repeated phrase terms need every offset satisfied") {
    val docs = Seq(
      1L -> "x a b a y",   // matches "a b a" at anchor 2
      2L -> "x a b b a")   // does not
    val got = run(docs, Seq(5L -> Seq("a", "b", "a")))
    assert(got == Seq((5L, 1L, 1L, 2L)))
  }

  test("multiple queries resolve independently; absent phrases yield no rows") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "beta gamma delta")
    val got = run(docs,
      Seq(1L -> Seq("beta", "gamma"), 2L -> Seq("gamma", "beta"),
        3L -> Seq("delta", "epsilon")))
    assert(got == Seq((1L, 1L, 1L, 2L), (1L, 2L, 1L, 1L)))
  }

  test("tokenization is the shared lowercase-whitespace contract") {
    val got = run(Seq(1L -> "The  Quick\tBrown fox"),
      Seq(1L -> Seq("quick", "brown")))
    assert(got == Seq((1L, 1L, 1L, 2L)))
  }

  test("matchesRareFirst is row-for-row equal to matches") {
    val docs = Seq(
      1L -> "a b c a b c a b",       // repeated phrase, hot terms
      2L -> "a a a a a a",           // degenerate hot
      3L -> "x y z q r s",           // rare terms
      4L -> "b c a b c x",           // overlap
      5L -> "z z y x w")
    val phrases = Seq(
      10L -> Seq("a", "b", "c"),     // multi-anchor
      11L -> Seq("x"),               // single-term phrase (no verify leg)
      12L -> Seq("a", "a"),          // repeated term in the phrase
      13L -> Seq("nope", "b"),       // absent term -> zero-df seed
      14L -> Seq("z", "z", "y"))
    val d = docs.toDF("doc_id", "text")
    val p = phrases.toDF("query_id", "ph")
    val post = PhraseSearch.postings(d, "text", "doc_id")
    val terms = PhraseSearch.phraseTerms(p, "query_id", "ph")
    val a = PhraseSearch.matches(post, terms)
      .orderBy("query_id", "doc_id").collect().toSeq
    val b = PhraseSearch.matchesRareFirst(post, terms)
      .orderBy("query_id", "doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty) // the law must bite on real matches

    // the persisted-index path (q165b): save postings + derived term-df,
    // reload, probe with the precomputed stats — row-for-row equal again
    val path = java.nio.file.Files
      .createTempDirectory("graft-postidx-spec").toString
    PhraseSearch.saveIndex(post, path)
    val (rp, rtdf) = PhraseSearch.loadIndex(spark, path)
    val c = PhraseSearch.matchesRareFirstWithStats(rp, rtdf, terms)
      .orderBy("query_id", "doc_id").collect().toSeq
    assert(a == c)
  }
}
