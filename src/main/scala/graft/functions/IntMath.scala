package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer math over columns where double rounding must not leak
  * into a hash-gated artifact.
  */
object IntMath {
  import org.apache.spark.sql.{GraftBridge => EU}
  import org.apache.spark.sql.catalyst.expressions.IntegralDivide

  /** `a div b` as a Column op (truncating integral division, long
    * result — the same operator `expr("a div b")` resolves to, usable
    * on anonymous columns). Decimal division is NOT a substitute:
    * its result scale rounds HALF_UP, so floor(a / b) can read one too
    * high (2.9999999 → 3.000000 → 3).
    */
  def idiv(a: Column, b: Column): Column =
    EU.column(IntegralDivide(EU.expression(a), EU.expression(b)))

  /** Exact integer square root ⌊√n⌋ of a non-negative integral column
    * (long or DECIMAL(38,0)) — exact for every n whose root fits a
    * long, i.e. n ≤ ~8.5·10³⁷ (all of practical DECIMAL(38,0)).
    *
    * floor(sqrt(double)) alone is exact only while n < 2⁵³ (lossless
    * conversion + correctly-rounded IEEE sqrt ⇒ seed off by ≤ 1).
    * Above 2⁵³ the conversion loses bits: the seed's absolute error
    * grows to ~√n·2⁻⁵³ (≈ 10³ for a 63-bit root). One integer Newton
    * step x′ = (x + n div x) div 2 squares it away — e′ ≈ e²/(2√n) < 1
    * for every n in range — after which a two-sided adjust settles the
    * exact floor. All intermediates stay on the integer grid; the
    * Newton sum and the squares run in DECIMAL(38,0) (root ≤ 9.2·10¹⁸
    * ⇒ sum ≤ 1.9·10¹⁹ and square ≤ 8.5·10³⁷, both < 10³⁸ — no long
    * overflow, no decimal overflow). DuckDB mirrors the chain
    * operator-for-operator (its `//` truncates toward zero like
    * Spark's `div`).
    */
  def isqrt(n: Column): Column = {
    val nd = n.cast("decimal(38,0)")
    val c0 = floor(sqrt(nd.cast("double"))).cast("long")
    val c1 = when(c0 > 0,
      idiv(c0.cast("decimal(38,0)")
        + idiv(nd, c0.cast("decimal(38,0)")).cast("decimal(38,0)"),
        lit(2L)))
      .otherwise(lit(0L))
    val stepUp = when(
      (c1.cast("decimal(38,0)") + 1) * (c1.cast("decimal(38,0)") + 1) <= nd,
      c1 + 1).otherwise(c1)
    when(stepUp.cast("decimal(38,0)") * stepUp.cast("decimal(38,0)") > nd,
      stepUp - 1).otherwise(stepUp)
  }
}
