package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Viterbi unigram-tokenizer laws ([[Unigram]] /
  * [[graft.functions.UnigramKernel]]); q123 carries the DuckDB
  * recursive-CTE oracle.
  */
class UnigramSpec extends SparkSpec {

  private val vocab = Seq(
    "a" -> 10L, "b" -> 10L, "c" -> 10L, "ab" -> 10L, "bc" -> 10L,
    "abc" -> 500L, "e" -> 90L, "t" -> 100L, "h" -> 110L,
    "th" -> 140L, "he" -> 145L, "the" -> 150L)
  private val Unk = 400L

  private def enc(words: String*): Map[String, Seq[String]] = {
    val s = spark
    import s.implicits._
    Unigram.encode(words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text"), "text", vocab, Unk)
      .select("doc_id", "tidx", "token")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (id, rs) =>
        words(id.toInt) -> rs.sortBy(_._2).map(_._3).toSeq }
  }

  /** Exponential reference: enumerate EVERY segmentation, keep the
    * min-cost ones, then apply the backward-longest tie-break (compare
    * piece length sequences from the END, longer wins).
    */
  private def reference(word: String): Seq[String] = {
    val costs = vocab.toMap
    def cost(p: String): Option[Long] =
      costs.get(p).orElse(if (p.codePointCount(0, p.length) == 1) Some(Unk) else None)
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to s.length).flatMap { l =>
        val (h, t) = s.splitAt(l)
        if (cost(h).isDefined) segs(t).map(h +: _) else Seq.empty
      }
    val all = segs(word)
    val withCost = all.map(sg => sg -> sg.map(cost(_).get).sum)
    val minC = withCost.map(_._2).min
    val best = withCost.filter(_._2 == minC).map(_._1)
    // backward-longest: lexicographic max on the reversed length sequence
    import scala.math.Ordering.Implicits._
    best.maxBy(sg => sg.reverse.map(_.length).toList)
  }

  test("kernel equals the exhaustive min-cost + backward-longest reference") {
    val words = Seq("abc", "ab", "ba", "the", "thethe", "teeth", "abcabc",
      "xyz", "axc", "heathen")
    val got = enc(words: _*)
    for (w <- words) assert(got(w) === reference(w), s"word=$w")
  }

  test("viterbi beats greedy longest-match where the vocab punishes it") {
    // greedy-longest would take 'abc' (cost 500); the optimal cover is
    // a+bc (20), reconstructed backward-longest as [a, bc] not [ab, c]
    assert(enc("abc")("abc") === Seq("a", "bc"))
  }

  test("multi-char pieces win over singles when cheaper") {
    assert(enc("the")("the") === Seq("the")) // 150 < t+h+e = 310, th+e = 230
  }

  test("unknown codepoints fall back to singles at unkCost; non-BMP is one piece") {
    val got = enc("q😀z")  // q, emoji (non-BMP), z — all UNK
    assert(got("q😀z") === Seq("q", "😀", "z"))
  }

  test("empty and whitespace-only docs produce no rows") {
    val s = spark
    import s.implicits._
    val out = Unigram.encode(Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "text", vocab, Unk)
    assert(out.count() === 0)
  }

  test("pieceCosts: more frequent pieces cost less; all costs non-negative") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(40)("aaa bb").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val costs = Unigram.pieceCosts(df, "text", maxPieceLen = 2, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(costs.values.forall(_ >= 0L))
    assert(costs("a") < costs("b"))   // 120 a's vs 80 b's
    assert(costs("aa") < costs("bb")) // 80 vs 40
  }

  test("a pieceCosts vocabulary drives encode end to end") {
    val s = spark
    import s.implicits._
    val corpus = Seq.fill(10)("banana band").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pieces = Unigram.pieceCosts(corpus, "text", 3, 2L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val out = Unigram.encode(corpus.limit(1), "text", pieces, unkCost = 1 << 21)
      .select("widx", "tidx", "token").collect()
    assert(out.nonEmpty)
    // round-trip: concatenating pieces per word restores the word
    val byWord = out.map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).map { case (w, rs) =>
        w -> rs.sortBy(_._2).map(_._3).mkString }
    assert(byWord(0) === "banana" && byWord(1) === "band")
  }
}
