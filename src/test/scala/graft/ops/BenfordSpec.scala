package graft.ops

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]) =
    Benford.firstDigit(rows.toDF("k", "v"), "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))).toSeq

  test("the expected-share constants sum to one (2^30, floor slack)") {
    val s = Benford.ExpFix.sum
    assert(s <= (1L << 30) && s > (1L << 30) - 10)
  }

  test("an exactly-Benford sample scores a small TVD; uniform a big one") {
    // counts proportional to Benford over 10000 draws: obs ~ exp
    val benford = Benford.ExpFix.zipWithIndex.flatMap { case (e, i) =>
      Seq.fill(((e * 10000L) >> 30).toInt)((("b", (i + 1).toLong)))
    }
    // uniform first digits 1..9
    val uniform = (0 until 9000).map(i => ("u", (i % 9 + 1).toLong))
    val got = run(benford ++ uniform)
    val b = got.find(_._1 == "b").get
    val u = got.find(_._1 == "u").get
    assert(b._4 < (1L << 30) / 100)   // < 1% TVD
    assert(u._4 > (1L << 30) / 4)     // uniform is way off
    // uniform's worst digit is 1 (expected 30.1%, observed 11.1%)
    assert(u._5 == 1)
  }

  test("first digits come from the decimal rendering, any magnitude") {
    val rows = Seq(("k", 1L), ("k", 19L), ("k", 123456789L), ("k", 2L),
      ("k", 999999999999L))
    val got = run(rows).head
    assert(got._2 == 5L) // digits 1,1,1,2,9
  }

  test("non-positive values are skipped but counted") {
    val rows = Seq(("k", 0L), ("k", -5L), ("k", 7L), ("k", 70L))
    val got = run(rows).head
    assert(got._2 == 2L && got._3 == 2L)
  }

  test("a key whose values are ALL non-positive still surfaces (n=0, NULL stats)") {
    val rows = Seq(("dead", 0L), ("dead", -3L), ("live", 5L))
    val got = Benford.firstDigit(rows.toDF("k", "v"), "k", "v")
      .orderBy("k").collect()
    assert(got.length == 2, "all-non-positive key escaped the audit")
    val dead = got(0)
    assert(dead.getString(0) == "dead" && dead.getLong(1) == 0L &&
      dead.getLong(2) == 2L)
    assert(dead.isNullAt(3) && dead.isNullAt(4) && dead.isNullAt(5),
      "n=0 key must report NULL tvd/worst, not fabricated zeros")
    assert(got(1).getString(0) == "live" && got(1).getLong(1) == 1L)
  }

  test("partition invariance under a 6-way repartition") {
    val rows = (1L until 500L).map(v => (s"g${v % 2}", v * v % 977 + 1))
    val a = run(rows)
    val b = Benford.firstDigit(rows.toDF("k", "v").repartition(6), "k", "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))).toSeq
    assert(a == b)
  }
}
