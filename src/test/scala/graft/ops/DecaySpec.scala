package graft.ops

import graft.SparkSpec
import graft.functions.FixedLogKernel

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L
  private val HourNs = HourUs * 1000

  private def run(rows: Seq[(String, Long)], halfLifeUs: Long) =
    Decay.decayedCount(rows.toDF("k", "ts_ns"), "k", "ts_ns", halfLifeUs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** Scalar spec: the split exponent through the kernel. */
  private def wRef(ageUs: Long, hUs: Long): Long =
    FixedLogKernel.pow2NegFix(
      math.min(ageUs / hUs, 63L) * 65536 + (ageUs % hUs) * 65536 / hUs)

  test("whole half-lives halve exactly; now weighs 2^31") {
    val rows = Seq(("k", 2 * HourNs), ("k", 1 * HourNs), ("k", 0L))
    val got = run(rows, halfLifeUs = HourUs)
    // ages 0, 1h, 2h at h=1h: weights 2^31, 2^30, 2^29 exactly
    assert(got == Seq(("k", 3L, (1L << 31) + (1L << 30) + (1L << 29))))
  }

  test("fractional ages match the scalar kernel spec") {
    val rows = Seq(("a", 0L), ("a", HourNs / 3), ("b", HourNs * 7 / 5))
    val got = run(rows, HourUs)
    // reference = corpus max ts = b's event
    val refTs = (HourNs * 7 / 5) / 1000
    def age(ns: Long) = refTs - ns / 1000
    val wa = wRef(age(0L), HourUs) + wRef(age(HourNs / 3), HourUs)
    val wb = wRef(0L, HourUs)
    assert(got.find(_._1 == "a").get._3 == wa)
    assert(got.find(_._1 == "b").get._3 == wb)
  }

  test("ancient events decay to exactly zero, never negative") {
    val rows = Seq(("k", 0L), ("k", 100L * 24 * HourNs))
    val got = run(rows, HourUs) // age 2400 half-lives
    assert(got.head._3 == (1L << 31)) // only the reference event survives
    assert(got.head._2 == 2L)
  }

  test("recent burst outranks an old grind (the trending property)") {
    val now = 1000L * HourNs
    val burst = (0 until 5).map(i => ("burst", now - i * HourNs / 10))
    val grind = (0 until 50).map(i => ("grind", now - (200 + i) * HourNs))
    val got = run(burst ++ grind, halfLifeUs = 10 * HourUs)
    assert(got.map(_._1) == Seq("burst", "grind")) // ordered by score
    assert(got(0)._2 == 5L && got(1)._2 == 50L)    // despite 10× the count
  }

  test("scores at a common reference are mergeable: halves sum to whole") {
    val rows = (0 until 40).map(i => (s"k${i % 3}", i.toLong * HourNs))
    // pin the reference by giving every slice the same max event
    val pin = ("k0", 40L * HourNs)
    val whole = run(rows :+ pin, HourUs)
    val e = run(rows.filter(_._2 % (2 * HourNs) == 0) :+ pin, HourUs)
    val o = run(rows.filter(_._2 % (2 * HourNs) != 0) :+ pin, HourUs)
    def m(s: Seq[(String, Long, Long)]) = s.map(t => t._1 -> t._3).toMap
    val merged = (m(e).keySet ++ m(o).keySet).map(k =>
      k -> (m(e).getOrElse(k, 0L) + m(o).getOrElse(k, 0L))).toMap
    // the pin event is double-counted across slices: subtract one copy
    assert(m(whole) == merged.updated("k0", merged("k0") - (1L << 31)))
  }

  test("partition invariance and the half-life bound") {
    val rows = (0 until 90).map(i => (s"k${i % 7}", i.toLong * HourNs / 3))
    val a = run(rows, HourUs)
    val b = Decay.decayedCount(rows.toDF("k", "ts_ns").repartition(8),
      "k", "ts_ns", HourUs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Decay.decayedCount(rows.toDF("k", "ts_ns"), "k", "ts_ns", 0L)
    }
    intercept[IllegalArgumentException] {
      Decay.decayedCount(rows.toDF("k", "ts_ns"), "k", "ts_ns",
        Decay.MaxHalfLifeUs + 1)
    }
  }
}
