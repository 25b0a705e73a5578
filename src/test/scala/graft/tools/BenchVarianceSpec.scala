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

  test("mergeReference: a suspect run leaves the reference's affected " +
      "entries unchanged") {
    val oldRef = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 3.0, "q4" -> 4.0)
    val fresh = Map("q1" -> 1.1, "q2" -> 6.1, "q3" -> 9.2, "q5" -> 5.0,
      "q6" -> 0.5) // q6: suspect AND new this round; q4 left the lineup
    val suspect = Set("q2", "q3", "q6")
    val merged = BenchVariance.mergeReference(oldRef, fresh, suspect)
    // clean queries take the fresh time
    assert(merged("q1") == 1.1 && merged("q5") == 5.0)
    // suspect queries KEEP the old reference time — never the inflated one
    assert(merged("q2") == 2.0 && merged("q3") == 3.0)
    // suspect + no old entry → dropped (unchecked beats inflated)
    assert(!merged.contains("q6"))
    // not in this run at all → dropped (lineup change)
    assert(!merged.contains("q4"))
  }

  test("shouldRetry fires on absolute inflation only, with enough queries") {
    val ref = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val hot = (1 to 10).map(i => s"q$i" -> 1.5).toMap
    val ok = (1 to 10).map(i => s"q$i" -> 1.1).toMap
    assert(BenchVariance.shouldRetry(hot, ref))
    assert(!BenchVariance.shouldRetry(ok, ref))
    // under MinQueries comparable pairs → no verdict, no retry
    assert(!BenchVariance.shouldRetry(hot.take(3), ref))
    // no overlap with the reference → no retry
    assert(!BenchVariance.shouldRetry(hot, Map("other" -> 1.0)))
  }

  test("suspectKind: loaded machine reads ambient, idle reads unexplained") {
    // load at/above the core count around the tranche → outside
    // contention (our own threads can account for at most `cpus`)
    assert(BenchVariance.suspectKind(40.0, 35.0, 32) == "ambient")
    assert(BenchVariance.suspectKind(8.0, 33.0, 32) == "ambient")
    // idle machine → the inflation has no ambient excuse: regression
    assert(BenchVariance.suspectKind(8.5, 9.1, 32) == "unexplained")
    // unreadable load (-1) can never read as ambient
    assert(BenchVariance.suspectKind(-1.0, -1.0, 32) == "unexplained")
  }

  test("keepSecondAttempt compares |log g| distance from 1.0, not raw g") {
    // retry landed outside the burst: 1.05 beats 1.4 → keep second
    assert(BenchVariance.keepSecondAttempt(Some(1.4), Some(1.05)))
    // spuriously-fast retry (warm page cache): 0.6 must NOT beat an
    // honest 1.1 — raw `g2 < g1` would have kept it
    assert(!BenchVariance.keepSecondAttempt(Some(1.1), Some(0.6)))
    // and symmetric distances keep the first (strict <)
    assert(!BenchVariance.keepSecondAttempt(Some(2.0), Some(2.0)))
    // unmeasurable attempts never win / never lose by default
    assert(!BenchVariance.keepSecondAttempt(Some(1.4), None))
    assert(!BenchVariance.keepSecondAttempt(None, Some(1.0)))
  }

  test("trancheGeomeanVsRef drops sub-millisecond references") {
    val ref = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "z" -> 0.0001)
    val t = Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.0, "d" -> 2.0,
      "e" -> 2.0, "z" -> 50.0) // z's 500000× ratio must not count
    val g = BenchVariance.trancheGeomeanVsRef(t, ref)
    assert(g.exists(v => math.abs(v - 2.0) < 1e-9))
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
