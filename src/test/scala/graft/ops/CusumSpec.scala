package graft.ops

import graft.SparkSpec

class CusumSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook sequential CUSUM in the same fixed point — the reference
    * the window closed-form must reproduce exactly. */
  private def reference(xs: Seq[Long], slackDiv: Long, thr: Long)
      : Seq[(Long, Long, Int)] = {
    val mu16 = xs.sum * 65536L / xs.size
    val k16 = mu16 / slackDiv
    var sp = 0L; var sn = 0L
    xs.map { x =>
      sp = math.max(0L, sp + (x * 65536L - mu16 - k16))
      sn = math.max(0L, sn + (mu16 - k16 - x * 65536L))
      (sp, sn, if (sp > thr * mu16 || sn > thr * mu16) 1 else 0)
    }
  }

  private def run(xs: Seq[Long]) =
    Cusum.twoSided(
        xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
          .toDF("g", "bucket", "x"),
        Seq("g"), "bucket", "x")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getInt(5))).toSeq

  test("closed form == sequential recursion on a planted level shift") {
    val xs = Seq.fill(20)(10L) ++ Seq.fill(10)(25L) ++ Seq.fill(10)(10L)
    val got = run(xs)
    assert(got == reference(xs, 4, 4))
    // the shift raises an alarm; the calm prefix does not
    assert(got.take(20).forall(_._3 == 0))
    assert(got.slice(20, 30).exists(_._3 == 1))
  }

  test("downward shifts trip the negative side") {
    val xs = Seq.fill(20)(20L) ++ Seq.fill(12)(2L)
    val got = run(xs)
    assert(got == reference(xs, 4, 4))
    assert(got.drop(20).exists(t => t._3 == 1 && t._2 > t._1))
  }

  test("flat series never alarms and both sides stay near zero") {
    val xs = Seq.fill(30)(7L)
    val got = run(xs)
    assert(got == reference(xs, 4, 4))
    assert(got.forall(_._3 == 0))
  }

  test("detector resets after excursions (max-with-zero floor)") {
    val xs = Seq.fill(10)(10L) ++ Seq.fill(5)(30L) ++ Seq.fill(20)(10L)
    val got = run(xs)
    assert(got == reference(xs, 4, 4))
    // after the spike passes, s_pos decays back to the flat-series level
    assert(got.last._1 <= got(14)._1)
  }

  test("keys are independent and partitioning does not matter") {
    val rows = (for (k <- 1 to 20; b <- 0 until 40)
      yield (s"k$k", b.toLong, ((b * k * 7) % 13).toLong)).toSeq
    val df = rows.toDF("g", "bucket", "x")
    val a = Cusum.twoSided(df, Seq("g"), "bucket", "x")
      .orderBy("g", "bucket").collect().toSeq
    val b = Cusum.twoSided(df.repartition(11), Seq("g"), "bucket", "x")
      .orderBy("g", "bucket").collect().toSeq
    assert(a == b && a.size == 800)
  }

  test("clampedRunningSum: closed form equals the textbook recursion") {
    import spark.implicits._
    val deltas = Seq(5L, -10L, 3L, -5L, 4L, -3L, 1L, -2L, 10L, -30L, 7L)
    val rows = deltas.zipWithIndex.map { case (d, i) => ("k", i.toLong, d) }
    val got = Cusum.clampedRunningSum(rows.toDF("k", "ord", "delta"),
        Seq("k"), "ord", "delta")
      .orderBy("ord").collect()
      .map(r => (r.getLong(3), r.getLong(4))).toSeq
    // the recursion, scalar: S = max(0, S + d); lost accumulates clamps
    val ref = deltas.scanLeft((0L, 0L)) { case ((s, l), d) =>
      val raw = s + d
      if (raw < 0) (0L, l - raw) else (raw, l)
    }.tail
    assert(got == ref)
  }

  test("clampedRunningSum: all-positive deltas is a plain cumsum, lost 0") {
    import spark.implicits._
    val rows = (0L until 20L).map(i => ("k", i, i + 1))
    val got = Cusum.clampedRunningSum(rows.toDF("k", "ord", "delta"),
        Seq("k"), "ord", "delta")
      .orderBy("ord").collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(got.map(_._1) == (1L to 20L).scanLeft(0L)(_ + _).tail)
    assert(got.forall(_._2 == 0L))
  }

  test("clampedRunningSum: keys independent, partitioning invariant") {
    import spark.implicits._
    val rows = (0L until 90L).map(i =>
      (s"g${i % 3}", i, (if (i % 4 == 0) -7L else 3L)))
    val a = Cusum.clampedRunningSum(rows.toDF("k", "ord", "delta"),
        Seq("k"), "ord", "delta").orderBy("k", "ord")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    val b = Cusum.clampedRunningSum(
        rows.toDF("k", "ord", "delta").repartition(8),
        Seq("k"), "ord", "delta").orderBy("k", "ord")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    assert(a == b)
  }
}
