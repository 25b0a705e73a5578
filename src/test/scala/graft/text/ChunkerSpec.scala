package graft.text

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int, stride: Int) =
    Chunker.slidingWindows(docs.toDF("doc_id", "text"), "text", "doc_id",
        window, stride)
      .orderBy("doc_id", "chunk_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq

  test("overlap covers boundaries: every window-straddling pair co-occurs") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = run(Seq((1L, words)), window = 4, stride = 2)
    assert(got.map(_._6) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10",
      "w9 w10"))
    assert(got.map(t => (t._3, t._4)) ==
      Seq((1L, 4L), (3L, 6L), (5L, 8L), (7L, 10L), (9L, 10L)))
    // every adjacent token pair appears together in at least one chunk
    val pairs = (1 to 9).map(i => (s"w$i", s"w${i + 1}"))
    assert(pairs.forall(p => got.exists(c =>
      c._6.contains(p._1 + " ") && c._6.contains(p._2))))
  }

  test("stride == window tiles without overlap; short docs emit one chunk") {
    val got = run(Seq((1L, "a b c d e")), window = 2, stride = 2)
    assert(got.map(_._6) == Seq("a b", "c d", "e"))
    val short = run(Seq((2L, "only three words")), window = 64, stride = 48)
    assert(short == Seq((2L, 0L, 1L, 3L, 3L, "only three words")))
  }

  test("empty and whitespace-only documents emit nothing") {
    assert(run(Seq((1L, ""), (2L, "   ")), 4, 2).isEmpty)
  }

  test("tokenization is the repo's canonical form (lowercase, ws-split)") {
    val got = run(Seq((1L, "  Foo\tBAR  baz\n")), 2, 2)
    assert(got.map(_._6) == Seq("foo bar", "baz"))
  }

  test("rejects bad window/stride") {
    intercept[IllegalArgumentException] {
      Chunker.slidingWindows(Seq((1L, "a")).toDF("doc_id", "text"),
        "text", "doc_id", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Chunker.slidingWindows(Seq((1L, "a")).toDF("doc_id", "text"),
        "text", "doc_id", 0, 0)
    }
  }
}
