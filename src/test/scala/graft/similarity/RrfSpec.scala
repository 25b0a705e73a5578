package graft.similarity

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("query_id", "doc_id", "rank")

  private def run(lists: Seq[Seq[(Long, Long, Long)]], k0: Long = 60L,
      topK: Int = 10) =
    Rrf.fuse(lists.map(df), k0, topK).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("hand case: contributions are exact 2^16 floors and they add") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L))
    val sem = Seq((1L, 11L, 1L), (1L, 12L, 2L))
    val got = run(Seq(lex, sem))
    val c1 = 65536L / 61; val c2 = 65536L / 62
    // doc 11 in both lists (rank 2 + rank 1) beats single-list docs
    assert(got.map(t => (t._3, t._4, t._5)) == Seq(
      (11L, c2 + c1, 2L), (10L, c1, 1L), (12L, c2, 1L)))
    assert(got.map(_._2) == Seq(1, 2, 3))
  }

  test("a doc present in both lists outranks a #1 in just one") {
    // doc 20 is #1 lexically only; doc 21 is #3 in BOTH lists
    val lex = Seq((1L, 20L, 1L), (1L, 21L, 3L))
    val sem = Seq((1L, 22L, 1L), (1L, 21L, 3L))
    val got = run(Seq(lex, sem))
    assert(got.head._3 == 21L && got.head._5 == 2L)
  }

  test("rrf ties break by doc_id, deterministically") {
    val lex = Seq((1L, 30L, 1L), (1L, 31L, 1L)) // impossible in one list,
    val got = run(Seq(lex))                      // but fusion must not care
    assert(got.map(_._3) == Seq(30L, 31L))
    assert(got(0)._4 == got(1)._4)
  }

  test("topK bounds each query independently; queries don't mix") {
    val lex = (1L to 8L).map(r => (1L, 100L + r, r)) ++
      (1L to 8L).map(r => (2L, 200L + r, r))
    val got = run(Seq(lex), topK = 3)
    assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 3)
    assert(got.filter(_._1 == 2L).map(_._3) == Seq(201L, 202L, 203L))
  }

  test("k0 flattens: a bigger constant shrinks the rank-1 advantage") {
    val lex = Seq((1L, 40L, 1L), (1L, 41L, 10L))
    val small = run(Seq(lex), k0 = 1L)
    val big = run(Seq(lex), k0 = 1000L)
    def gap(s: Seq[(Long, Int, Long, Long, Long)]) =
      s.find(_._3 == 40L).get._4 - s.find(_._3 == 41L).get._4
    assert(gap(small) > gap(big))
  }

  test("rejects empty input and bad constants") {
    intercept[IllegalArgumentException] { Rrf.fuse(Seq.empty) }
    intercept[IllegalArgumentException] {
      Rrf.fuse(Seq(df(Seq((1L, 1L, 1L)))), k0 = 0L)
    }
  }

  test("partition invariance under a 5-way repartition") {
    val rows = (0L until 200L).map(i => (i % 7, i % 23, i % 9 + 1))
    val a = run(Seq(rows))
    val b = Rrf.fuse(Seq(df(rows).repartition(5)), 60L, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(a.sorted == b.sorted)
  }
}
