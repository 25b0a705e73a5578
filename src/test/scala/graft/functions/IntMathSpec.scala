package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IntMath.isqrt exactness across the magnitudes that break the naive
  * floor(sqrt(double)) seed: below 2⁵³ the seed alone is within 1;
  * above it the double conversion drifts by ~√n·2⁻⁵³ and only the
  * Newton step brings it back. Cases sit ON the boundaries — perfect
  * squares, square±1 — where an off-by-one is a wrong answer, at
  * magnitudes up to 10³⁶.
  */
class IntMathSpec extends SparkSpec {

  test("isqrt exact at boundary values from 0 to 10^36") {
    val s = spark
    import s.implicits._
    val roots = Seq(
      0L, 1L, 2L, 3L, 10L, 94906265L /* ~2^26.5 */, 3037000499L /* ~2^31.5 */,
      (1L << 31) - 1, 1000000007L, 999999999999999989L /* ~10^18 */)
    // for each root r: n in {r^2 - 1, r^2, r^2 + 1} → isqrt = r-1, r, r
    val cases = roots.filter(_ > 0).flatMap { r =>
      val sq = BigDecimal(BigInt(r) * BigInt(r))
      Seq((sq - 1, r - 1), (sq, r), (sq + 1, r))
    } ++ Seq((BigDecimal(0), 0L), (BigDecimal(2), 1L), (BigDecimal(3), 1L)) ++
      // beyond long: (10^18+9)^2 ≈ 10^36 exercises the decimal path
      Seq({
        val r = BigInt("1000000000000000009")
        (BigDecimal(r * r), 1000000000000000009L)
      }, {
        val r = BigInt("1000000000000000009")
        (BigDecimal(r * r - 1), 1000000000000000008L)
      })
    val df = cases.map { case (n, want) =>
      (n.bigDecimal.setScale(0).toPlainString, want)
    }.toDF("n", "want")
      .withColumn("n", col("n").cast("decimal(38,0)"))
    val bad = df.withColumn("got", IntMath.isqrt(col("n")).cast("long"))
      .filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.map(r =>
      s"isqrt(${r.get(0)}) = ${r.getLong(2)}, want ${r.getLong(1)}")
      .mkString("; "))
  }

  test("r^2 - 1 above 2^53: the case the naive double seed gets wrong") {
    // n = r^2 - 1 for an 18-digit r: n's double representation rounds to
    // the SAME double as r^2 (they differ in bit 2^-60 of the mantissa),
    // so floor(sqrt(double(n))) reads r while the true floor is r - 1 —
    // exactly the drift the Newton step + adjust must repair.
    val r = BigInt("999999999999999989")
    val n = BigDecimal(r * r - 1)
    val naive = BigDecimal(math.floor(math.sqrt(n.toDouble))).toBigInt
    assert(naive > r - 1, s"precondition: the naive seed drifts ($naive)")
    val s = spark
    import s.implicits._
    val got = Seq(n.bigDecimal.setScale(0).toPlainString).toDF("n")
      .select(IntMath.isqrt(col("n").cast("decimal(38,0)")).cast("long"))
      .collect()(0).getLong(0)
    assert(got == (r - 1).toLong, s"isqrt(r^2-1) must be r-1, got $got")
  }
}
