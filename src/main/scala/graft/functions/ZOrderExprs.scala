package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the space-filling-curve key for
  * multi-dimensional data skipping. Sorting a table by the interleaved
  * key keeps BOTH dimensions locally bounded inside every file, so
  * parquet min/max row-group stats prune scans filtered on EITHER
  * column; a plain sort only localizes its leading column.
  */
object ZOrderKernels {

  /** Spread the low 32 bits of x to the even bit positions (0,2,4,…,62). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 32 bits of a (even positions) and b (odd). */
  def morton2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `morton2(a, b)`: 64-bit Morton code of two long columns (low 32 bits
  * each; a on even bit positions). Five shift-mask rounds per operand —
  * branch-free, codegen'd, stays inside whole-stage codegen.
  */
case class Morton2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKernels.morton2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderExprs {
  import org.apache.spark.sql.{GraftBridge => EU}

  def morton2(a: Column, b: Column): Column =
    EU.column(Morton2(EU.expression(a), EU.expression(b)))
}
