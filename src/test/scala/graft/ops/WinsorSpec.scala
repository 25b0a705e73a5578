package graft.ops

import graft.SparkSpec

class WinsorSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], lo: Long = 50L, hi: Long = 950L) =
    RobustStats.winsorizedMean(rows.toDF("k", "v"), Seq("k"), "v", lo, hi)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("hand case: fences are data values at rank ceil(p*n/1000)") {
    // n=10, lo rank = ceil(0.5)=1, hi rank = ceil(9.5)=10 at 50/950
    val rows = (1L to 10L).map(("k", _))
    val got = run(rows).head
    assert((got._3, got._4) == ((1L, 10L)))
    // 200/800 permille on n=10: ranks 2 and 8
    val g2 = run(rows, 200L, 800L).head
    assert((g2._3, g2._4) == ((2L, 8L)))
    // winsorized sum = 2+2+3+4+5+6+7+8+8+8 = 53
    assert(g2._5 == 53L * 65536 / 10)
    assert(g2._6 == 55L * 65536 / 10)
  }

  test("a fat-finger extreme cannot move the winsorized mean past hi") {
    val clean = (1L to 99L).map(("k", _))
    val bad = clean :+ (("k", 1000000L))
    val c = run(clean, 100L, 900L).head
    val b = run(bad, 100L, 900L).head
    // raw mean explodes; winsorized mean moves by at most hi/n
    assert(b._6 > 2 * c._6)
    assert(math.abs(b._5 - c._5) < 2L * 65536)
  }

  test("degenerate fences: lo = hi clamps everything to one value") {
    val rows = (1L to 9L).map(("k", _))
    val got = run(rows, 500L, 500L).head // both ranks = ceil(4.5) = 5
    assert(got._3 == 5L && got._4 == 5L && got._5 == 5L * 65536)
  }

  test("negative values: the sign-split floor truncates toward zero") {
    val rows = Seq(("k", -7L), ("k", -8L), ("k", -9L))
    val got = run(rows, 0L, 1000L).head
    // mean -8 exactly; also check a non-exact case
    assert(got._5 == -8L * 65536)
    val g2 = run(Seq(("k", -1L), ("k", -2L)), 0L, 1000L).head
    // |sum|=3, floor(3*65536/2)=98304, sign after → -98304 (not -98305)
    assert(g2._5 == -98304L)
  }

  test("groups are fenced independently; partition invariant") {
    val rows = (1L to 50L).map(v => (s"g${v % 2}", v * (v % 2 * 10 + 1)))
    val a = run(rows)
    val b = RobustStats.winsorizedMean(rows.toDF("k", "v").repartition(7),
      Seq("k"), "v").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(a == b && a.size == 2)
  }
}
