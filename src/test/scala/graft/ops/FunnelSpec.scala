package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L

  private def ev(rows: Seq[(String, String, Long)]) =
    rows.zipWithIndex
      .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
      .toDF("user_id", "event_type", "ts_ns", "event_id")

  private def run(rows: Seq[(String, String, Long)], steps: Seq[String]) =
    Funnel.ordered(ev(rows), steps).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq

  private val steps = Seq("signup", "view", "purchase")

  test("hand funnel: out-of-order steps never count") {
    val rows = Seq(
      // u1 walks the full funnel in order
      ("u1", "signup", 0 * S), ("u1", "view", 10 * S), ("u1", "purchase", 20 * S),
      // u2 purchases BEFORE viewing: reaches step 2 only
      ("u2", "signup", 0 * S), ("u2", "purchase", 5 * S), ("u2", "view", 10 * S),
      // u3 never signs up: reaches nothing, its view/purchase are dead
      ("u3", "view", 0 * S), ("u3", "purchase", 10 * S),
      // u4 signs up only
      ("u4", "signup", 0 * S))
    val got = run(rows, steps)
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
    // step 1 has no previous: conv_prev null, conv_first = 1.0
    assert(got(0)._4 == -1L && got(0)._5 == (1L << 30))
    assert(got(1)._4 == (2L * (1L << 30)) / 3L)
    assert(got(2)._4 == (1L << 30) / 2L && got(2)._5 == (1L << 30) / 3L)
  }

  test("a repeat of an earlier step re-arms nothing and breaks nothing") {
    val rows = Seq(
      ("u1", "signup", 0 * S), ("u1", "view", 10 * S),
      ("u1", "signup", 20 * S), ("u1", "purchase", 30 * S))
    // purchase at t=30 is still valid (view happened at t=10)
    assert(run(rows, steps).map(_._3) == Seq(1L, 1L, 1L))
  }

  test("equal timestamps resolve by event_id: same-instant chain counts") {
    val rows = Seq(
      ("u1", "signup", 0 * S), ("u1", "view", 0 * S), ("u1", "purchase", 0 * S))
    assert(run(rows, steps).map(_._3) == Seq(1L, 1L, 1L))
    // reversed arrival order at the same instant does NOT count
    val rev = Seq(
      ("u1", "purchase", 0 * S), ("u1", "view", 0 * S), ("u1", "signup", 0 * S))
    assert(run(rev, steps).map(_._3) == Seq(1L, 0L, 0L))
  }

  test("zero users at step 1 yields null conversions, not a crash") {
    val rows = Seq(("u1", "click", 0 * S), ("u2", "error", 0 * S))
    val got = run(rows, steps)
    assert(got.map(_._3) == Seq(0L, 0L, 0L))
    assert(got.forall(t => t._4 == -1L || t._1 == 1)) // 0-denominator → null
  }

  test("rejects duplicate or too-short step lists") {
    intercept[IllegalArgumentException] {
      Funnel.ordered(ev(Seq(("u", "a", 0L))), Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Funnel.ordered(ev(Seq(("u", "a", 0L))), Seq("a", "a"))
    }
  }

  test("partition invariance under an 11-way repartition") {
    val rows = (0 until 120).map { i =>
      (s"u${i % 17}", Seq("signup", "view", "click", "purchase")(i % 4),
        ((i * 37) % 200) * S)
    }
    val a = Funnel.ordered(ev(rows), steps).collect().toSeq
    val b = Funnel.ordered(ev(rows).repartition(11), steps).collect().toSeq
    assert(a == b)
  }
}
