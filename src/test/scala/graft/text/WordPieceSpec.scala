package graft.text

import graft.SparkSpec
import graft.functions.{WordPieceKernel, WordPieceVocab}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy-encode laws ([[WordPiece]]); q132 carries the
  * recursive-CTE DuckDB oracle.
  */
class WordPieceSpec extends SparkSpec {

  private def enc(word: String, vocab: Seq[String]): Seq[String] = {
    val out = WordPieceKernel.encode(UTF8String.fromString(word),
      new WordPieceVocab(vocab))
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  /** Naive reference: scan lengths longest-first at each position. */
  private def reference(word: String, vocab: Seq[String]): Seq[String] = {
    val set = vocab.toSet
    val maxLen = vocab.map(e =>
      (if (e.startsWith("##")) e.substring(2) else e).length).max
    val cps = word.codePoints().toArray
    def slice(a: Int, b: Int) = new String(cps, a, b - a)
    var p = 0
    var toks = Vector.empty[String]
    while (p < cps.length) {
      val hit = (math.min(maxLen, cps.length - p) to 1 by -1).iterator
        .map(l => if (p == 0) slice(0, l) else "##" + slice(p, p + l))
        .find(set.contains)
      hit match {
        case Some(t) =>
          toks :+= t
          p += (if (t.startsWith("##")) t.length - 2
            else t.codePointCount(0, t.length))
        case None => return Seq("[UNK]")
      }
    }
    toks
  }

  private val v = graft.queries.SearchQueries.q132Vocab

  test("kernel == longest-first reference on random words") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcdefghijklmnopqrstuvwy"
    (0 until 500).foreach { _ =>
      val w = (0 until 1 + rnd.nextInt(12))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(enc(w, v) === reference(w, v), s"word=$w")
    }
  }

  test("greedy commits to the longest piece at each step") {
    assert(enc("table", v) === Seq("table")) // beats "tab" + continuations
    assert(enc("tab", v) === Seq("tab"))
    assert(enc("merge", v) === Seq("me", "##rge")) // ##rge beats ##r
    assert(enc("data", v) === Seq("data")) // beats "da" + "##ta"
    assert(enc("datata", v) === Seq("data", "##ta"))
  }

  test("whole-word [UNK]: a mid-word failure discards emitted pieces") {
    assert(enc("slow", v) === Seq("[UNK]")) // s ##l ##o then ##w missing
    assert(enc("window", v) === Seq("[UNK]"))
    assert(enc("hash", v) === Seq("h", "##a", "##s", "##h"))
  }

  test("continuation form is position-dependent") {
    // "t" exists as a start single and "##t" as continuation — the same
    // letter tokenizes differently by position
    assert(enc("tt", v) === Seq("t", "##t"))
  }

  test("greedy differs from Viterbi where lookahead pays") {
    // vocab: "ab" tempts greedy, leaving "c" uncoverable as ##c is
    // absent; the min-cost cover "a ##bc" exists and Viterbi finds it
    val trap = Seq("ab", "a", "##bc")
    assert(enc("abc", trap) === Seq("[UNK]"))
    val viterbi = graft.functions.UnigramKernel.encode(
      UTF8String.fromString("abc"),
      new graft.functions.UnigramVocab(Seq("ab" -> 1L, "a" -> 5L, "bc" -> 5L), 1000L))
    assert((0 until viterbi.numElements())
      .map(i => viterbi.getUTF8String(i).toString) === Seq("a", "bc"))
  }

  test("codepoints: surrogate pairs segment once, empty word is empty") {
    assert(enc("", v) === Seq.empty)
    assert(enc("😀a", Seq("😀", "##a")) === Seq("😀", "##a"))
    assert(enc("😀", Seq("a")) === Seq("[UNK]"))
  }
}
