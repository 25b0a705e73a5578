package graft.ops

import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def outliers(xs: Seq[Long], key: String = "g") =
    RobustStats.medianMadOutliers(
        xs.map(x => (key, x)).toDF("g", "x"), Seq("g"), "x")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head // (n, med, mad, n_outliers)

  test("lower median is the rank-((n+1) div 2) order statistic") {
    val odd = RobustStats.lowerMedian(
      Seq(("g", 5L), ("g", 1L), ("g", 9L)).toDF("g", "x"), Seq("g"), "x", "m")
      .collect().head.getLong(1)
    assert(odd == 5L)
    val even = RobustStats.lowerMedian(
      Seq(("g", 4L), ("g", 1L), ("g", 9L), ("g", 6L)).toDF("g", "x"),
      Seq("g"), "x", "m").collect().head.getLong(1)
    assert(even == 4L) // lower of {4, 6}, never an interpolated 5
  }

  test("median and MAD ignore planted extremes; the fence catches them") {
    val clean = (1L to 101L).map(_ * 10)
    val (n0, med0, mad0, f0) = outliers(clean)
    assert((n0, f0) == (101L, 0L)) // a uniform ramp flags nothing
    val corrupt = clean ++ Seq(1000000L, -999999L)
    val (_, med1, mad1, f1) = outliers(corrupt)
    assert(med1 == med0) // two extremes cannot move the median...
    assert(math.abs(mad1 - mad0) <= 10) // ...or meaningfully move the MAD
    assert(f1 == 2L) // and both are flagged
  }

  test("hand-computed modified z at the 3.5 fence") {
    // med = 50, MAD = 10: flag iff 6745·|x−50| > 35000·10 ⟺ |x−50| > 51.8
    val xs = Seq(30L, 40L, 50L, 60L, 70L, 150L)
    val (_, med, mad, f) = outliers(xs)
    assert(med == 50L && mad == 10L)
    assert(f == 1L) // 150 (dev 100) flags; 70 (dev 20) does not
  }

  test("zero MAD (majority-identical data) flags every deviating row") {
    val (_, med, mad, f) = outliers(Seq(5L, 5L, 5L, 5L, 6L, 7L))
    assert(med == 5L && mad == 0L && f == 2L)
  }

  test("groups are independent and partitioning does not matter") {
    val rows = (for (g <- 1 to 8; i <- 1 to 200)
      yield (s"g$g", ((i * g * 13) % 997).toLong)).toSeq
    val df = rows.toDF("g", "x")
    val a = RobustStats.medianMadOutliers(df, Seq("g"), "x")
      .orderBy("g").collect().toSeq
    val b = RobustStats.medianMadOutliers(df.repartition(11), Seq("g"), "x")
      .orderBy("g").collect().toSeq
    assert(a == b && a.size == 8)
  }
}
