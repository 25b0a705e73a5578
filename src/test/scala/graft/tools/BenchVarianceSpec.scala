package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ambient-burst detector on the measured SCALING.md §10
  * pattern: the archived-in-prose 314.4 s run had ONE tranche uniformly
  * inflated ~1.33× vs sibling runs while the other four sat near 1.0.
  */
class BenchVarianceSpec extends AnyFunSuite {

  private def tranche(n: Int, ratio: Double, base: Double = 1.0) =
    (1 to n).map(j => (base * j * ratio, base * j))

  test("the §10 burst pattern: one 1.33× tranche flags, siblings don't") {
    val runs = Seq(
      tranche(40, 1.02), tranche(40, 0.97), tranche(40, 1.33),
      tranche(40, 1.01), tranche(40, 0.99))
    val vs = BenchVariance.verdicts(runs)
    assert(vs.map(_.suspect) == Seq(false, false, true, false, false))
    assert(vs(2).geomean.exists(g => math.abs(g - 1.33) < 0.01))
  }

  test("a UNIFORM shift is a code/data change, never a suspect tranche") {
    // everything 1.4× slower: the relative condition must hold it back
    val vs = BenchVariance.verdicts(Seq.fill(5)(tranche(40, 1.4)))
    assert(vs.forall(!_.suspect))
    // and everything faster likewise
    assert(BenchVariance.verdicts(Seq.fill(5)(tranche(40, 0.7)))
      .forall(!_.suspect))
  }

  test("small or incomparable tranches get no verdict, not a clean bill") {
    val vs = BenchVariance.verdicts(Seq(
      tranche(3, 2.0),                      // under MinQueries
      Seq.fill(10)((0.5, 0.0)),             // ref times all ~0
      tranche(40, 1.0)))
    assert(!vs(0).suspect && vs(0).geomean.isDefined)
    assert(!vs(1).suspect && vs(1).geomean.isEmpty)
  }

  test("annotate joins by query name and ignores queries absent in ref") {
    val groups = Seq(Seq("q1", "q2", "q3", "q4", "q5", "q6"),
      Seq("q7", "q8", "q9", "q10", "q11", "q12"))
    val times = groups.flatten.map(_ -> 2.0).toMap
    val ref = (groups.head.map(_ -> 1.5) ++
      groups(1).map(_ -> 2.0)).toMap - "q7" // q7 only in this run
    val vs = BenchVariance.annotate(groups, times, ref)
    assert(vs(0).geomean.exists(g => math.abs(g - 2.0 / 1.5) < 1e-9))
    assert(vs(1).geomean.exists(g => math.abs(g - 1.0) < 1e-9))
    // tranche 0 is 1.33× inflated but over HALF the comparable queries,
    // so the artifact-wide geomean rises with it ((4/3)^(6/11) ≈ 1.17)
    // and the relative gate correctly reads it as not-localized
    assert(vs.map(_.suspect) == Seq(false, false))
  }
}
