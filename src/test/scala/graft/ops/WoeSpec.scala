package graft.ops

import graft.SparkSpec
import graft.functions.FixedLogKernel

class WoeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Int)]) =
    Woe.binsWoe(rows.toDF("bin", "bad"), "bin", "bad")
      .orderBy("bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  /** The spec formula, scalar: smoothed shares → sign-split fixed log. */
  private def woeRef(g: Long, b: Long, gt: Long, bt: Long): (Long, Long) = {
    val rg = math.max(1L, ((g + 1) * (1L << 30)) / (gt + 0))
    val rb = math.max(1L, ((b + 1) * (1L << 30)) / (bt + 0))
    val q = if (rg <= rb) (rg * (1L << 30)) / rb else (rb * (1L << 30)) / rg
    val bits = -FixedLogKernel.log2fix(q, 30, 16)
    val woe = (if (rg <= rb) -1L else 1L) * ((bits * 45426L) / 65536L)
    (woe, ((rg - rb) * woe) / 65536L)
  }

  test("two-bin hand case matches the scalar spec and the true ln") {
    // bin a: 90 good / 10 bad; bin b: 30 good / 70 bad
    val rows = Seq.fill(90)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(30)(("b", 0)) ++ Seq.fill(70)(("b", 1))
    val got = run(rows)
    val gt = 90L + 1 + 30 + 1; val bt = 10L + 1 + 70 + 1
    val (wa, iva) = woeRef(90, 10, gt, bt)
    val (wb, ivb) = woeRef(30, 70, gt, bt)
    assert(got == Seq(("a", 90L, 10L, wa, iva), ("b", 30L, 70L, wb, ivb)))
    // magnitude sits where ln((91/122)/(11/82)) says it should
    val truthA = math.log((91.0 / 122) / (11.0 / 82)) * 65536
    assert(math.abs(wa - truthA) < 200, s"wa=$wa truth=$truthA")
    assert(wa > 0 && wb < 0 && iva > 0 && ivb > 0)
  }

  test("label swap flips every WOE sign exactly and preserves IV") {
    val rows = Seq.fill(80)(("a", 0)) ++ Seq.fill(20)(("a", 1)) ++
      Seq.fill(40)(("b", 0)) ++ Seq.fill(60)(("b", 1))
    val fwd = run(rows)
    val rev = run(rows.map { case (k, l) => (k, 1 - l) })
    assert(fwd.map(_._4) == rev.map(t => -t._4))
    assert(fwd.map(_._5) == rev.map(_._5))
  }

  test("an uninformative feature scores zero WOE in every bin") {
    val rows = (1 to 50).flatMap(_ =>
      Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)))
    assert(run(rows).forall(t => t._4 == 0L && t._5 == 0L))
  }

  test("zero cells survive via Laplace smoothing, never divide by zero") {
    val rows = Seq.fill(50)(("a", 0)) ++ Seq.fill(50)(("b", 1))
    val got = run(rows)
    assert(got.size == 2)
    assert(got.head._4 > 0 && got.last._4 < 0) // pure bins, finite WOE
  }
}
