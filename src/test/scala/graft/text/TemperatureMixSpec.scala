package graft.text

import graft.SparkSpec
import graft.functions.FixedLogKernel
import org.apache.spark.sql.DataFrame

/** [[Scrub.temperatureMix]] and its [[FixedLogKernel.pow2NegFix]]
  * kernel; q129 carries the double-16-step-CTE DuckDB oracle.
  */
class TemperatureMixSpec extends SparkSpec {

  test("pow2NegFix: exact at integer exponents, tight elsewhere, clamps") {
    assert(FixedLogKernel.pow2NegFix(0L) === (1L << 31))
    (1 to 20).foreach { k =>
      assert(FixedLogKernel.pow2NegFix(k.toLong << 16) === (1L << 31) >> k)
    }
    assert(FixedLogKernel.pow2NegFix(-5L) === (1L << 31)) // negative clamps
    assert(FixedLogKernel.pow2NegFix(63L << 16) === 0L) // deep underflow
    val rnd = new scala.util.Random(5)
    (0 until 500).foreach { _ =>
      val y = rnd.nextInt(30 << 16).toLong
      val got = FixedLogKernel.pow2NegFix(y).toDouble
      val want = math.pow(2, -y / 65536.0) * (1L << 31).toDouble
      assert(math.abs(got - want) <= math.max(1.0, want * 1e-6),
        s"y=$y got=$got want=$want")
    }
  }

  test("pow2NegFix inverts log2fix within fixed-point error") {
    val rnd = new scala.util.Random(9)
    (0 until 200).foreach { _ =>
      val p = 1L + rnd.nextLong((1L << 30) - 1)
      val round = FixedLogKernel.pow2NegFix(-FixedLogKernel.log2fix(p, 30, 16))
      // round trip lands at scale 2³¹ vs p's 2³⁰
      val rel = math.abs(round / 2.0 - p) / p
      assert(rel < 1e-3, s"p=$p round=$round")
    }
  }

  private def stats(rows: (String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("lang", "tokens")
  }

  private def mix(st: DataFrame, aN: Long, aD: Long, budget: Long) =
    Scrub.temperatureMix(st, "lang", "tokens", aN, aD, budget)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("allocations sum to the budget exactly, any α") {
    val st = stats("a" -> 7L, "b" -> 7919L, "c" -> 123456L, "d" -> 1L)
    for ((n, d) <- Seq((3L, 10L), (1L, 2L), (1L, 1L), (7L, 10L));
         b <- Seq(0L, 1L, 999L, 1000000L)) {
      val out = mix(st, n, d, b)
      assert(out.map(_._4).sum === b, s"alpha=$n/$d budget=$b")
    }
  }

  test("α = 1 recovers proportional allocation; α < 1 flattens toward uniform") {
    val st = stats("lo" -> 1000L, "hi" -> 27000L)
    val prop = mix(st, 1L, 1L, 28000L).map(r => r._1 -> r._4).toMap
    // proportional: within fixed-point round-trip error of the raw shares
    assert(math.abs(prop("hi") - 27000L) <= 30, s"got $prop")
    val flat = mix(st, 3L, 10L, 28000L).map(r => r._1 -> r._4).toMap
    // 27:1 tokens at α=0.3 → sampling ratio 27^0.3 ≈ 2.7:1
    val ratio = flat("hi").toDouble / flat("lo")
    assert(ratio > 2.0 && ratio < 3.5, s"ratio $ratio")
    // and still monotone: more tokens never allocates less
    assert(flat("hi") > flat("lo"))
  }

  test("row-order and partitioning invariant") {
    val st = Seq("a" -> 31L, "b" -> 1444L, "c" -> 86L, "d" -> 9999L)
    val base = mix(stats(st: _*), 3L, 10L, 5000L)
    assert(mix(stats(st.reverse: _*).repartition(5), 3L, 10L, 5000L) === base)
  }
}
