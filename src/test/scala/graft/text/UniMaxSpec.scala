package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Laws for the closed-form integer UniMax waterfilling
  * ([[Scrub.uniMaxAlloc]]); q121 carries the DuckDB oracle.
  */
class UniMaxSpec extends SparkSpec {

  private def stats(rows: (String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("key", "tokens")
  }

  private def allocs(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  /** The sequential reference: ascending-capacity scan, each step gives
    * min(capacity, fair share of what's left over the strata left) —
    * with the remainder of each integer division carried forward, which
    * is exactly what the closed form's trailing remainder hand-out
    * produces.
    */
  private def sequential(caps: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val sorted = caps.sortBy { case (k, c) => (c, k) }
    var remaining = budget
    var left = sorted.size
    val out = scala.collection.mutable.Map[String, Long]()
    // capped prefix
    var idx = 0
    while (idx < sorted.size &&
        sorted(idx)._2 <= remaining / left) {
      out(sorted(idx)._1) = sorted(idx)._2
      remaining -= sorted(idx)._2
      left -= 1
      idx += 1
    }
    // equal split with first-r remainder
    val share = if (left > 0) remaining / left else 0L
    val rem = if (left > 0) remaining % left else 0L
    for ((i, j) <- (idx until sorted.size).zipWithIndex)
      out(sorted(i)._1) = share + (if (j < rem) 1L else 0L)
    out.toMap
  }

  test("closed form equals the sequential waterfilling reference") {
    val cases = Seq(
      Seq("a" -> 10L, "b" -> 100L, "c" -> 100L, "d" -> 3L) -> 120L,
      Seq("a" -> 1L, "b" -> 10L, "c" -> 10L) -> 12L,
      Seq("x" -> 5L, "y" -> 6L, "z" -> 100L) -> 12L,
      Seq("x" -> 3L, "y" -> 3L, "z" -> 100L) -> 12L,
      Seq("only" -> 7L) -> 100L,
      Seq("p" -> 0L, "q" -> 9L, "r" -> 9L) -> 7L)
    for ((caps, budget) <- cases) {
      val got = allocs(Scrub.uniMaxAlloc(stats(caps: _*), "key", "tokens",
        budget, maxEpochs = 1L)).map { case (k, (_, _, a)) => k -> a }
      assert(got === sequential(caps, budget), s"caps=$caps budget=$budget")
    }
  }

  test("budget is met exactly when capacity allows, else everything caps") {
    val s1 = Scrub.uniMaxAlloc(stats("a" -> 50L, "b" -> 70L, "c" -> 10L),
      "key", "tokens", budget = 100L, maxEpochs = 1L)
    assert(allocs(s1).values.map(_._3).sum === 100L)
    val s2 = Scrub.uniMaxAlloc(stats("a" -> 5L, "b" -> 7L),
      "key", "tokens", budget = 100L, maxEpochs = 2L)
    val a2 = allocs(s2)
    assert(a2("a") === ((5L, 10L, 10L)))
    assert(a2("b") === ((7L, 14L, 14L)))
  }

  test("no stratum exceeds its capacity; uncapped strata differ by at most 1") {
    val out = allocs(Scrub.uniMaxAlloc(
      stats("a" -> 3549L, "b" -> 3758L, "c" -> 3958L, "d" -> 4143L,
        "e" -> 11757L),
      "key", "tokens", budget = 18110L, maxEpochs = 1L))
    for ((_, (_, cap, alloc)) <- out) assert(alloc <= cap)
    val uncapped = out.values.collect { case (_, c, a) if a < c => a }
    assert(uncapped.max - uncapped.min <= 1)
    assert(out.values.map(_._3).sum === 18110L)
    // the smallest language is the capped one
    assert(out("a")._3 === out("a")._2)
  }

  test("epoch cap scales capacity; epochs_milli reports the replay rate") {
    val out = Scrub.uniMaxAlloc(stats("a" -> 10L, "b" -> 1000L),
        "key", "tokens", budget = 500L, maxEpochs = 3L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    // a caps at 30 = 3 epochs = 3000 milli; b takes the rest once-ish
    assert(out("a") === ((30L, 3000L)))
    assert(out("b")._1 === 470L)
    assert(out("b")._2 === 470L * 1000L / 1000L)
  }

  test("input row order does not matter") {
    val rows = Seq("a" -> 10L, "b" -> 100L, "c" -> 55L, "d" -> 3L)
    val fwd = allocs(Scrub.uniMaxAlloc(stats(rows: _*), "key", "tokens", 120L, 1L))
    val rev = allocs(Scrub.uniMaxAlloc(stats(rows.reverse: _*), "key", "tokens", 120L, 1L))
    assert(fwd === rev)
  }
}
