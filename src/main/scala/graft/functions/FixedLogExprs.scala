package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer −log₂ for fixed-point probabilities — the piece that
  * lets perplexity-style LM scoring stay float-free end to end. A
  * transcendental log would reintroduce the cross-engine last-ulp drift
  * the fixed-point Kneser–Ney model ([[graft.text.KneserNey]]) designed
  * out; this is the classical square-and-shift binary logarithm instead:
  * every step is an integer multiply, compare, and shift, so any engine
  * (DuckDB mirrors it with a 16-step recursive CTE) reproduces the
  * identical bit pattern.
  */
object FixedLogKernel {

  /** floor(log₂(p / 2^scaleBits) · 2^fracBits) for 0 < p ≤ 2^scaleBits —
    * a non-positive integer (0 when p == scale, i.e. probability 1).
    * Non-positive inputs clamp to p = 1 (the maximum-surprise floor,
    * −scaleBits · 2^fracBits), so a fixed-point prob that floored to 0
    * scores finite, never throws.
    *
    * Overflow bound: normalization keeps the mantissa m < 2^(scaleBits+1),
    * so the squaring step needs 2·(scaleBits+1) ≤ 63 — scaleBits ≤ 30.
    */
  def log2fix(p0: Long, scaleBits: Int, fracBits: Int): Long = {
    val one = 1L << scaleBits
    val two = one << 1
    var m = if (p0 <= 0) 1L else if (p0 > one) one else p0
    var k = 0L
    while (m < one) { m <<= 1; k += 1 }
    var acc = 0L
    var i = 0
    while (i < fracBits) {
      m = (m * m) >> scaleBits
      if (m >= two) { m >>= 1; acc = (acc << 1) | 1L }
      else acc = acc << 1
      i += 1
    }
    -(k << fracBits) + acc
  }
}

/** `log2fix(p)`: codegen'd exact fixed-point binary log (see
  * [[FixedLogKernel.log2fix]]).
  */
case class Log2Fix(child: Expression, scaleBits: Int, fracBits: Int)
    extends UnaryExpression {
  require(scaleBits >= 1 && scaleBits <= 30, "scaleBits must be in [1, 30]")
  require(fracBits >= 0 && fracBits <= 32, "fracBits must be in [0, 32]")

  override def dataType: DataType = LongType
  override def prettyName: String = "log2fix"

  override def nullSafeEval(input: Any): Any =
    FixedLogKernel.log2fix(input.asInstanceOf[Long], scaleBits, fracBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixedLogKernel.log2fix($c, $scaleBits, $fracBits);")

  override protected def withNewChildInternal(newChild: Expression): Log2Fix =
    copy(child = newChild)
}

object FixedLogExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  def log2fix(p: Column, scaleBits: Int, fracBits: Int): Column =
    EU.column(Log2Fix(EU.expression(p), scaleBits, fracBits))
}
