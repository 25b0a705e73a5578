package graft.ops

import graft.SparkSpec

class OlsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Ols.groupTrend(rows.toDF("k", "x", "y"), "k", "x", "y")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq

  test("an exact line is recovered exactly: slope, intercept, r2 ≈ 1") {
    val rows = (0L to 20L).map(x => ("k", x + 100, 3 * x + 7))
    val got = run(rows).head
    // x re-based to min: intercept is y at x = 100, i.e. 7
    assert((got._1, got._2, got._3, got._4) ==
      (("k", 21L, Some(3L * 65536), Some(7L * 65536))))
    // r² through the staged 2^15 floors: cov = 3·vx, vy = 9·vx, so
    // a = 3·2^15 exact, b = floor(2^15/3) — one ulp under a perfect 1
    val r2 = got._5.get
    assert(r2 == (3L * 32768) * (32768L / 3))
    assert(r2 > (1L << 30) - (1L << 17) && r2 <= (1L << 30))
  }

  test("a negative slope floors through the sign split, not past it") {
    val rows = (0L to 9L).map(x => ("k", x, 100 - 2 * x))
    val got = run(rows).head
    assert(got._3 == Some(-2L * 65536) && got._4 == Some(100L * 65536))
    assert(got._5 == Some(1L << 30))
    // non-exact negative slope: y = -x/3-ish via integer data
    val rough = Seq(("k", 0L, 10L), ("k", 3L, 9L), ("k", 6L, 8L))
    val g2 = run(rough).head
    // slope −1/3: magnitude floor(18·2^16/54) = 21845, sign applied AFTER
    // (a flooring division would give −21846)
    assert(g2._3 == Some(-21845L))
  }

  test("constant x gives NULL slope/intercept; constant y gives r2 NULL") {
    val vert = Seq(("k", 5L, 1L), ("k", 5L, 9L))
    assert(run(vert).head._3.isEmpty && run(vert).head._4.isEmpty)
    val flat = (0L to 5L).map(x => ("k", x, 42L))
    val g = run(flat).head
    assert(g._3 == Some(0L) && g._5.isEmpty)
  }

  test("noise shrinks r2 strictly below 1, independence near 0") {
    val noisy = (0L until 40L).map(i => ("k", i, 5 * i + (i * 7919) % 23))
    val g = run(noisy).head
    assert(g._5.get > (1L << 29) && g._5.get < (1L << 30))
    // y independent of x (period-2 alternation over even x steps)
    val indep = (0L until 40L).map(i => ("k", i, (i % 2) * 1000))
    assert(run(indep).head._5.get < (1L << 30) / 100)
  }

  test("groups are independent and sums are partition invariant") {
    val rows = (0L until 60L).flatMap(i => Seq(
      (s"g${i % 3}", i, 2 * i + (i % 5)),
      (s"g${i % 3}", i + 60, 3 * i)))
    val a = run(rows)
    val b = Ols.groupTrend(rows.toDF("k", "x", "y").repartition(7),
      "k", "x", "y").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(a == b && a.size == 3)
  }
}
